"""Multiprocess concurrent-writer torture test (r13, round-12 verdict
directive #6): the hard-link CAS + txn commute rules are pinned
in-process elsewhere; here 3 SEPARATE OS PROCESSES (own JVMs, no shared
Python state) race distinct-txn appends against ONE table, and one of
them replays its first txn after the race.  The log must come out
gap-free, every commit's staged files complete and row-accounted, every
txn exactly once, and the replay must ADOPT the landed commit."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

from data_pipeline_zeal_spark.sources import versioned as V

SF_SMALL = "/root/testdata/sf0.001"

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_concurrent_writer_worker.py")
N_WORKERS = 3
N_COMMITS = 4


@pytest.fixture()
def table():
    t = tempfile.mkdtemp(prefix="torture_")
    yield t
    shutil.rmtree(t, ignore_errors=True)


def test_multiprocess_writers_race_one_table(spark, table):
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, table, str(w), str(N_COMMITS)]
            + (["replay"] if w == 0 else []),
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for w in range(N_WORKERS)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, out.decode()[-2000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))

    total = N_WORKERS * N_COMMITS
    # 1. gap-free log: versions are exactly 1..total (the replay adopted,
    #    so it added NO extra entry)
    versions = V._list_versions(table)
    assert versions == list(range(1, total + 1))

    # 2. every commit's files are complete: the staged dir exists and its
    #    parquet rows match the entry's recorded n_rows
    for v in versions:
        e = V._read_entry(table, v)
        assert e["action"] == "append" and e["n_rows"] == 8
        for d in e["dirs"]:
            full = os.path.join(table, d)
            files = [f for f in os.listdir(full) if f.endswith(".parquet")]
            assert files, f"commit v{v} staged no parquet in {d}"
        import duckdb

        n = duckdb.sql(
            f"select count(*) from '{os.path.join(table, e['dirs'][0])}"
            f"/*.parquet'"
        ).fetchone()[0]
        assert n == e["n_rows"]

    # 3. every txn exactly once, and each worker saw strictly increasing
    #    versions (its own commit order)
    txns = [V._read_entry(table, v).get("txn") for v in versions]
    assert len(set(txns)) == total and None not in txns
    for o in outs:
        assert o["versions"] == sorted(o["versions"])

    # 4. the same-txn replay ADOPTED worker 0's first commit
    w0 = next(o for o in outs if o["worker"] == 0)
    assert w0["adopted"] == w0["versions"][0]

    # 5. the merged snapshot holds every row exactly once
    snap = V.read_version(spark, table)
    assert snap.count() == total * 8
    per = {(r.worker, r.commit_i): r.n for r in
           snap.groupBy("worker", "commit_i").count()
           .withColumnRenamed("count", "n").collect()}
    assert per == {(w, i): 8 for w in range(N_WORKERS)
                   for i in range(N_COMMITS)}


MAINT_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "_concurrent_maintenance_worker.py")


@pytest.fixture()
def bm25_table():
    t = tempfile.mkdtemp(prefix="maintrace_")
    yield t
    for s in ("", "_df", "_stats", "_manifest"):
        shutil.rmtree(t + s, ignore_errors=True)


def test_multiprocess_maintenance_races_writers_and_prober(
    spark, bm25_table
):
    """r14 (round-13 verdict #7): retention's cross-component floors
    have never raced a live writer.  One maintainer process fires
    `maintain_index(vacuum_keep_history=...)` ticks (production-default
    6 h retention window) against TWO appender processes streaming
    segments into a BM25 index while a prober process hammers
    `search_bm25_index` + manifest-triple reads.  Laws: no torn probe
    is ever observable, ticks defer fresh expired history instead of
    deleting it under a live writer, every component's log comes out
    gap-free, and after the dust settles one retention pass advances
    floors monotonically with the probe still equal to a from-scratch
    rebuild."""
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators import maintenance, retrieval

    docs = load_table(spark, SF_SMALL, "documents")
    base = docs.filter(F.col("doc_id") < 200)
    retrieval.build_bm25_index(base, bm25_table, n_buckets=4, txn="mx-b0")

    specs = [("appender", 1, 3), ("appender", 2, 3),
             ("maintainer", 0, 3), ("prober", 0, 6)]
    procs = [
        subprocess.Popen(
            [sys.executable, MAINT_WORKER, bm25_table, role, str(wid),
             str(n)],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for role, wid, n in specs
    ]
    outs = {}
    for (role, wid, _), p in zip(specs, procs):
        out, _ = p.communicate(timeout=300)
        assert p.returncode == 0, (role, wid, out.decode()[-2000:])
        outs[(role, wid)] = json.loads(
            out.decode().strip().splitlines()[-1]
        )

    # every probe succeeded — no torn state observable via the manifest
    assert outs[("prober", 0)]["probes"] == 6
    # every appended slice landed (conflicts retried, never lost)
    assert len(outs[("appender", 1)]["committed"]) == 3
    assert len(outs[("appender", 2)]["committed"]) == 3
    # ticks ran; fresh expired history was DEFERRED, not vacuumed out
    # from under the racing writers (the 6 h window at work)
    ticks = outs[("maintainer", 0)]["ticks"]
    assert ticks and all(not t["vacuum_fired"] for t in ticks)
    assert all(t["debt"] == 0 for t in ticks)

    # logs gap-free on every component
    for comp in maintenance.index_components(bm25_table):
        vs = V._list_versions(comp)
        assert vs == list(range(1, vs[-1] + 1)), comp

    # settle phase: retention now allowed to reclaim (everything is
    # quiesced, so 0.0 is safe here); floors advance monotonically
    floors: dict[str, int] = {}
    for i in range(3):
        rec = maintenance.maintain_index(
            spark, bm25_table, vacuum_keep_history=2, max_expired_dirs=0,
            retention_seconds=0.0, txn=f"mx-settle-{i}",
        )
        if "vacuum" in rec:
            for comp, c in rec["vacuum"]["components"].items():
                assert c["floor"] >= floors.get(comp, 0), comp
                floors[comp] = c["floor"]
    assert any(f > 0 for f in floors.values())

    # final parity: the raced-and-vacuumed index probes exactly like a
    # from-scratch rebuild over everything that landed
    live = docs.filter(
        (F.col("doc_id") < 200)
        | ((F.col("doc_id") >= 290) & (F.col("doc_id") < 470))
    )
    q = retrieval.corpus_queries(live).filter(F.col("query_id") <= 124)
    got = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, q, k=5
        ).collect()
    }
    ref = tempfile.mkdtemp(prefix="maintrace_ref_")
    try:
        retrieval.build_bm25_index(live, ref, n_buckets=4)
        want = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in retrieval.search_bm25_index(spark, ref, q, k=5)
            .collect()
        }
    finally:
        for s in ("", "_df", "_stats", "_manifest"):
            shutil.rmtree(ref + s, ignore_errors=True)
    assert got == want and got
