"""Unified index maintenance (r12, round-11 verdict directive #4): one
``maintain_index`` entry point classifies any persisted structure from
its companion logs and fires the RIGHT (and only the right) repair,
gated by metadata-only debt triggers."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import ann_index, maintenance, retrieval
from data_pipeline_zeal_spark.sources import versioned as V

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture()
def table():
    t = tempfile.mkdtemp(prefix="maint_")
    yield t
    for suffix in ("", "_centroids", "_codebooks", "_df", "_stats",
                   "_manifest"):
        shutil.rmtree(t + suffix, ignore_errors=True)


def _emb(spark):
    return load_table(spark, SF_SMALL, "embeddings")


def _docs(spark):
    return load_table(spark, SF_SMALL, "documents").select("doc_id", "text")


def test_plain_table_routes_to_maintain_table(spark, table):
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    for lo in range(0, 100, 20):  # 5 live files -> fragmentation debt
        V.commit_write(
            df.filter((F.col("id") >= lo) & (F.col("id") < lo + 20))
            .coalesce(1),
            table,
            mode="append" if lo else "overwrite",
        )
    rec = maintenance.maintain_index(
        spark, table, max_live_files=3, num_files=1
    )
    assert rec["kind"] == "plain" and rec["action"] == "compact"
    assert rec["compacted"] and rec["fragmented"]
    # healthy after the compact: next tick is a no-op
    rec2 = maintenance.maintain_index(spark, table, max_live_files=3)
    assert rec2["action"] == "none" and not rec2["compacted"]


def test_bm25_segment_debt_fires_optimize_only(spark, table):
    docs = _docs(spark)
    retrieval.build_bm25_index(docs.filter(F.col("doc_id") % 2 == 0), table)
    sink = retrieval.bm25_index_sink(table)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    for i in range(3):  # 3 segments appended -> 4 total
        sink(rest.filter(F.col("doc_id") % 3 == i), i)
    assert maintenance.classify_index(table) == "bm25"
    # under the threshold: nothing fires
    before = len(V.history(table))
    rec = maintenance.maintain_index(spark, table, max_segments=4)
    assert rec == {
        "action": "none", "kind": "bm25", "segments": 4,
        "max_segments": 4, "dv_debt": False,
    }
    assert len(V.history(table)) == before
    # over the threshold: optimize (and ONLY optimize) fires
    rec = maintenance.maintain_index(spark, table, max_segments=3)
    assert rec["action"] == "optimize" and rec["segments"] == 4
    # folded back to one stats segment; probes unchanged is pinned in
    # test_bm25_index.py — here we pin the trigger reset
    rec2 = maintenance.maintain_index(spark, table, max_segments=3)
    assert rec2["action"] == "none" and rec2["segments"] == 1


def test_ivf_append_debt_gates_drift_canary(spark, table):
    emb = _emb(spark)
    ann_index.build_ivf_index(emb, table, n_cells=8)
    assert maintenance.classify_index(table) == "ivf"
    # no appends: the canary must NOT run (metadata-only no-op)
    rec = maintenance.maintain_index(spark, table)
    assert rec == {
        "action": "none", "kind": "ivf", "appends_since_rebuild": 0
    }
    # undrifted appends: canary runs, no rebuild
    sink = ann_index.ivf_index_sink(table)
    sink(emb.limit(50).select("vec_id", "embedding"), 0)
    rec = maintenance.maintain_index(spark, table)
    assert rec["action"] == "none" and rec["appends_since_rebuild"] == 1
    assert rec["worst_cell_cosine"] >= 0.9 and not rec["rebuilt"]
    # drifted appends: rebuild fires and resets the append debt
    drifted = emb.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: -x + F.lit(7.0)
        ).alias("embedding"),
    )
    sink(drifted, 1)
    rec = maintenance.maintain_index(spark, table, min_cosine=0.98)
    assert rec["action"] == "rebuild" and rec["rebuilt"]
    rec2 = maintenance.maintain_index(spark, table, min_cosine=0.98)
    assert rec2["action"] == "none" and rec2["appends_since_rebuild"] == 0


def test_ivfadc_requires_source_for_rebuild(spark, table):
    emb = _emb(spark)
    ann_index.build_ivfadc_index(emb, table, n_cells=8, m=8, n_codes=16)
    assert maintenance.classify_index(table) == "ivfadc"
    rec = maintenance.maintain_index(spark, table)
    assert rec["action"] == "none" and rec["appends_since_rebuild"] == 0

    drifted = emb.select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: -x + F.lit(7.0)
        ).alias("embedding"),
    )
    ann_index.ivfadc_index_sink(table)(drifted, 0)
    # drift crossed, but codes cannot rebuild themselves: the decision
    # escalates instead of silently doing nothing
    rec = maintenance.maintain_index(spark, table, min_cosine=0.98)
    assert rec["action"] == "rebuild_required" and not rec["rebuilt"]
    # with the source handed over, the rebuild fires with the same layout
    both = emb.select("vec_id", "embedding").unionByName(drifted)
    rec = maintenance.maintain_index(
        spark, table, min_cosine=0.98, source=both
    )
    assert rec["action"] == "rebuild" and rec["rebuilt"]
    assert (rec["n_cells"], rec["m"], rec["n_codes"]) == (8, 8, 16)
    rec2 = maintenance.maintain_index(spark, table, min_cosine=0.98)
    assert rec2["action"] == "none" and rec2["appends_since_rebuild"] == 0


def test_matview_freshness_debt_fires_refresh_only(spark, table):
    """A materialized view is the fifth maintained structure: its debt
    is base-log lag (metadata-only — two latest_version reads), its
    repair is refresh_matview, and a fresh view is a strict no-op."""
    from data_pipeline_zeal_spark.sources import matview as MV

    base = table  # plain base table
    view = tempfile.mkdtemp(prefix="maint_mv_")
    shutil.rmtree(view, ignore_errors=True)
    try:
        df = spark.range(1000).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 7).cast("string").alias("event_type"),
            (F.col("id") % 100).cast("double").alias("value"),
        )
        V.commit_write(df.coalesce(1), base, mode="overwrite")
        MV.create_matview(
            spark, base, view, ["event_type"],
            [("n", "count", None)], keys=["event_id"],
        )
        assert maintenance.classify_index(view) == "matview"
        assert maintenance.classify_index(base) == "plain"
        # fresh: nothing fires
        rec = maintenance.maintain_index(spark, view)
        assert rec == {"action": "none", "kind": "matview",
                       "base_lag_commits": 0}
        # base advances -> one tick refreshes and clears the debt
        V.commit_write(
            spark.range(1000, 1400).select(
                F.col("id").alias("event_id"),
                (F.col("id") % 7).cast("string").alias("event_type"),
                (F.col("id") % 100).cast("double").alias("value"),
            ).coalesce(1),
            base, mode="append",
        )
        rec = maintenance.maintain_index(spark, view)
        assert rec["action"] == "refresh" and rec["base_lag_commits"] == 1
        assert rec["path"] == "append-delta"
        got = {
            r.event_type: r.n
            for r in MV.read_matview(spark, view).collect()
        }
        assert sum(got.values()) == 1400
        rec2 = maintenance.maintain_index(spark, view)
        assert rec2["action"] == "none" and rec2["base_lag_commits"] == 0
    finally:
        shutil.rmtree(view, ignore_errors=True)


def test_bm25_tombstone_debt_fires_optimize(spark, table):
    """delete_bm25_docs leaves DV tombstones on the postings — the
    unified tick folds them even when the segment count is fine."""
    docs = _docs(spark)
    retrieval.build_bm25_index(docs, table, n_buckets=8)
    doomed = [r.doc_id for r in docs.select("doc_id").limit(40).collect()]
    retrieval.delete_bm25_docs(spark, table, doomed, txn="d1")
    rec = maintenance.maintain_index(spark, table, max_segments=10)
    assert rec["action"] == "optimize" and rec["dv_debt"]
    rec2 = maintenance.maintain_index(spark, table, max_segments=10)
    assert rec2["action"] == "none" and not rec2["dv_debt"]


def test_ivf_delete_only_workload_arms_drift_canary(spark, table):
    """Round-12 advice: deletes shift live cell means exactly like
    appends do, so an index that received ONLY delete_dv commits since
    its build must still run the drift canary (appends==0 must not
    short-circuit the gate)."""
    emb = _emb(spark)
    ann_index.build_ivf_index(emb, table, n_cells=8)
    ids = [r.vec_id for r in emb.select("vec_id").limit(40).collect()]
    V.delete_where_dv(spark, table, [("vec_id", "in", sorted(ids))],
                      txn="d1")
    rec = maintenance.maintain_index(spark, table)
    # the canary RAN: its data-scan outputs are present in the decision
    assert rec["appends_since_rebuild"] == 1
    assert "worst_cell_cosine" in rec


def test_retention_under_the_tick_vacuums_components_coherently(
    spark, table
):
    """r13 directive #4: the tick measures expired-history debt from log
    metadata and, past the threshold, vacuums the structure's main +
    companion + quarantine tables coherently — floors advance on every
    component, versions the live manifest pins survive, time travel
    within the retained range still works, and reads below the floor
    fail loudly."""
    docs = _docs(spark)
    retrieval.build_bm25_index(docs, table, n_buckets=4, txn="b1")
    # history debt: two rebuilds supersede the originals' dirs entirely
    retrieval.build_bm25_index(docs.limit(400), table, n_buckets=4,
                               txn="b2")
    retrieval.build_bm25_index(docs, table, n_buckets=4, txn="b3")
    # a quarantine table rides along under the same floor contract
    V.commit_write(
        docs.limit(5), table + "_quarantine", mode="overwrite", txn="q1"
    )
    V.commit_write(
        docs.limit(3), table + "_quarantine", mode="overwrite", txn="q2"
    )

    rec = maintenance.maintain_index(
        spark, table, vacuum_keep_history=1, max_expired_dirs=0,
        retention_seconds=0.0,
    )
    assert rec["vacuum_debt_dirs"] > 0 and "vacuum" in rec
    comps = rec["vacuum"]["components"]
    assert set(comps) == {
        table, table + "_df", table + "_stats", table + "_manifest",
        table + "_quarantine",
    }
    # every component expired history (floor advanced) and the doomed
    # rebuilds' superseded dirs were actually reclaimed on the big three
    assert all(c["floor"] > 0 for c in comps.values())
    assert sum(c["removed"] for c in comps.values()) > 0

    # the live manifest's pinned triple SURVIVED the vacuum: the probe
    # still serves the current snapshot
    q = retrieval.corpus_queries(docs).filter(F.col("query_id") <= 62)
    hits = retrieval.search_bm25_index(spark, table, q, k=5).collect()
    assert hits
    # time travel within the retained range works on every component
    for comp, c in comps.items():
        assert V.read_version(spark, comp, c["floor"]).count() >= 0
    # reads below the floor fail loudly, not silently partially
    with pytest.raises(V.VersionExpiredError):
        V.read_version(spark, table, comps[table]["floor"] - 1).count()

    # a second tick right after: debt is settled, no re-vacuum fires
    rec2 = maintenance.maintain_index(
        spark, table, vacuum_keep_history=1, max_expired_dirs=0,
        retention_seconds=0.0,
    )
    assert rec2["vacuum_debt_dirs"] == 0 and "vacuum" not in rec2


def test_retention_keeps_ann_model_pointers_readable(spark, table):
    """The IVF companion floor must never pass the smallest quantizer
    version a retained main snapshot resolves through — even when that
    pointer lives on a commit BELOW the main floor (a retained
    delete_dv inherits it)."""
    emb = _emb(spark)
    all_ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    doomed, qids = all_ids[:10], all_ids[-3:]  # probes survive deletion
    ann_index.build_ivf_index(emb, table, n_cells=4, txn="b1")  # cv=1
    V.delete_where_dv(spark, table, [("vec_id", "in", doomed)], txn="d1")
    ann_index.build_ivf_index(emb, table, n_cells=4, txn="b2")  # cv=2
    V.delete_where_dv(spark, table, [("vec_id", "in", doomed[:4])],
                      txn="d2")

    rec = maintenance.vacuum_index(spark, table, keep_history=1,
                                   retention_seconds=0.0)
    comps = rec["components"]
    main_floor = comps[table]["floor"]
    # every retained main version still resolves its quantizer and
    # serves a probe
    for v in range(main_floor, V.latest_version(table) + 1):
        got = ann_index.search_ivf_index(
            spark, table, qids, k=3, nprobe=2, version=v
        ).collect()
        assert got


def test_retention_debt_probe_survives_widened_keep_history(spark, table):
    """Raising keep_history after a vacuum must not crash the debt
    probe: the candidate floor falls below the PERSISTED floor, and a
    naive replay would read expired versions (live_dirs raises on them
    by contract).  The probe clamps up — expired history can never
    un-expire."""
    df = spark.range(50).selectExpr("id", "id * 2 as v")
    for i in range(3):
        V.commit_write(df.coalesce(1), table, mode="overwrite", txn=f"o{i}")
    maintenance.vacuum_index(spark, table, keep_history=1,
                             retention_seconds=0.0)
    assert V._retention_floor(table) == 2
    # widened window: candidate floor 0 < persisted floor 2
    rec = maintenance.maintain_index(
        spark, table, vacuum_keep_history=5, max_expired_dirs=0
    )
    assert rec["vacuum_debt_dirs"] == 0 and "vacuum" not in rec


def test_retention_randomized_trajectory_invariants(spark, table):
    """Soak law for retention under the tick: a seeded random sequence
    of overwrites / appends / DV deletes / retention ticks, asserting
    at EVERY step that (a) the live snapshot is readable and equals the
    logically expected row multiset, (b) the floor is monotone, (c)
    every retained version reads without error, and (d) the version
    just below the floor raises loudly once a floor exists."""
    import random

    rng = random.Random(0xC0FFEE13)

    def mk(lo, hi):
        return spark.range(lo, hi).selectExpr(
            "id", "id % 7 as g", "(id * 31) % 1000 as v"
        ).coalesce(1)

    # logical model: the expected live rows as an id-interval list
    V.commit_write(mk(0, 300), table, mode="overwrite", txn="init")
    live = {(0, 300)}
    deleted: set[int] = set()
    floor_seen = 0
    for step in range(10):
        op = rng.choice(["overwrite", "append", "delete", "tick", "tick"])
        if op == "overwrite":
            lo = rng.randrange(0, 5000)
            V.commit_write(mk(lo, lo + 300), table, mode="overwrite",
                           txn=f"o{step}")
            live, deleted = {(lo, lo + 300)}, set()
        elif op == "append":
            lo = 10_000 + step * 1000
            V.commit_write(mk(lo, lo + 200), table, mode="append",
                           txn=f"a{step}")
            live.add((lo, lo + 200))
        elif op == "delete":
            los = sorted(l for l, _ in live)
            lo = rng.choice(los)
            V.delete_where_dv(
                spark, table,
                [("id", ">=", lo), ("id", "<", lo + 50)],
                txn=f"d{step}",
            )
            deleted |= {i for i in range(lo, lo + 50)
                        if any(a <= i < b for a, b in live)}
        else:
            rec = maintenance.maintain_index(
                spark, table, vacuum_keep_history=2, max_expired_dirs=0,
                retention_seconds=0.0,
            )
            if "vacuum" in rec:
                f = rec["vacuum"]["components"][table]["floor"]
                assert f >= floor_seen  # monotone
                floor_seen = f
        # (a) live snapshot always readable and logically right
        got = sorted(r.id for r in
                     V.read_version(spark, table).select("id").collect())
        want = sorted(i for a, b in live for i in range(a, b)
                      if i not in deleted)
        assert got == want, (step, op)
        # (c) every retained version reads; (d) below-floor raises
        floor = V._retention_floor(table)
        assert floor == floor_seen
        for v in V._list_versions(table):
            if v >= floor:
                V.read_version(spark, table, v).count()
        if floor > 1:
            with pytest.raises(V.VersionExpiredError):
                V.read_version(spark, table, floor - 1).count()
    assert floor_seen > 0  # the trajectory actually vacuumed


def test_cow_dml_counts_as_data_change_not_rebuild(spark, table):
    """Round-13 advice: COW delete_where/update_where publish overwrite
    commits, but they are row-level DML — the drift counter must COUNT
    them, not reset; compaction is layout-only — it must do neither;
    only a true rebuild overwrite zeroes the counter."""
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    V.commit_write(df.coalesce(1), table, mode="overwrite", txn="init")
    V.commit_write(df.limit(10).coalesce(1), table, mode="append", txn="a1")
    V.commit_write(df.limit(10).coalesce(1), table, mode="append", txn="a2")
    assert maintenance._appends_since_rebuild(table) == 2
    V.delete_where(spark, table, [("id", "<", 5)], txn="d1")
    assert maintenance._appends_since_rebuild(table) == 3
    V.update_where(spark, table, [("id", ">=", 90)], {"v": "0"}, txn="u1")
    assert maintenance._appends_since_rebuild(table) == 4
    V.merge_upsert(
        spark, table,
        spark.range(5).selectExpr("id", "id as v"),
        keys=["id"], order_col="v", txn="m1",
    )
    assert maintenance._appends_since_rebuild(table) == 5
    V.compact(spark, table, txn="c1", num_files=1)
    assert maintenance._appends_since_rebuild(table) == 5  # layout-only
    V.commit_write(df.coalesce(1), table, mode="overwrite", txn="rebuild")
    assert maintenance._appends_since_rebuild(table) == 0


def test_cow_delete_arms_ivf_drift_canary(spark, table):
    """The ANN-flavored half of the same advice: a COW delete on an IVF
    index must leave the drift canary ARMED (the tick runs the data-scan
    check), never disarm it by masquerading as a rebuild."""
    emb = _emb(spark)
    ann_index.build_ivf_index(emb, table, n_cells=8)
    ids = sorted(r.vec_id for r in emb.select("vec_id").limit(30).collect())
    V.delete_where(spark, table, [("vec_id", "in", ids)], txn="cd1")
    rec = maintenance.maintain_index(spark, table)
    assert rec["appends_since_rebuild"] == 1
    assert "worst_cell_cosine" in rec  # the canary actually ran


def test_retention_debt_probe_honors_retention_seconds(spark, table):
    """Round-13 verdict #3: the tick's debt probe must apply the SAME
    age cutoff the fired vacuum enforces.  Fresh expired history under
    the CLI-default 6 h retention is DEFERRED debt (reported, no vacuum
    fired — the old behavior re-fired a vacuum that could not settle on
    every tick); once the dirs age past the window, one tick settles."""
    import os
    import time

    df = spark.range(60).selectExpr("id", "id * 3 as v")
    for i in range(3):
        V.commit_write(df.coalesce(1), table, mode="overwrite", txn=f"o{i}")
    # defaults: retention_seconds=6h — fresh superseded dirs are deferred
    rec = maintenance.maintain_index(
        spark, table, vacuum_keep_history=1, max_expired_dirs=0
    )
    assert "vacuum" not in rec
    assert rec["vacuum_debt_dirs"] == 0
    assert rec["vacuum_debt_deferred"] >= 1
    # age every data dir past the window (what 6 h of wall clock does)
    old = time.time() - 7 * 3600
    data_root = os.path.join(table, V._DATA_DIR)
    for name in os.listdir(data_root):
        os.utime(os.path.join(data_root, name), (old, old))
    rec2 = maintenance.maintain_index(
        spark, table, vacuum_keep_history=1, max_expired_dirs=0
    )
    assert rec2["vacuum_debt_dirs"] >= 1 and "vacuum" in rec2
    assert sum(
        c["removed"] for c in rec2["vacuum"]["components"].values()
    ) >= 1
    rec3 = maintenance.maintain_index(
        spark, table, vacuum_keep_history=1, max_expired_dirs=0
    )
    assert rec3["vacuum_debt_dirs"] == 0
    assert rec3["vacuum_debt_deferred"] == 0
    assert "vacuum" not in rec3


def test_bm25_pin_floor_spans_retained_manifest_versions(
    spark, table, monkeypatch
):
    """Round-13 advice: when the manifest log LAGS the components (a
    deletion crashed between its component commits and the manifest
    publish), a retained OLDER manifest version pins component versions
    below the naive keep_history floor.  The floor must take the min
    pinned triple across ALL retained manifest versions — clamping to
    the live triple alone expires versions manifest v1 still pins, and
    time travel through it raises VersionExpiredError."""
    docs = _docs(spark)
    retrieval.build_bm25_index(docs, table, n_buckets=4, txn="b1")
    doomed = sorted(
        r.doc_id for r in docs.select("doc_id").limit(20).collect()
    )
    # crash the first delete AFTER its df/stats/postings commits but
    # BEFORE the manifest publish: the manifest now lags by one round
    def _boom(*a, **k):
        raise RuntimeError("crash before manifest publish")

    monkeypatch.setattr(retrieval, "_commit_manifest", _boom)
    with pytest.raises(RuntimeError):
        retrieval.delete_bm25_docs(spark, table, doomed[:10], txn="d1")
    monkeypatch.undo()
    # a later delete lands normally: manifest v2 pins the NEW triple,
    # manifest v1 still pins the ORIGINAL (1, 1, 1)
    retrieval.delete_bm25_docs(spark, table, doomed[10:], txn="d2")
    rec = maintenance.vacuum_index(
        spark, table, keep_history=1, retention_seconds=0.0
    )
    man = table + "_manifest"
    mfloor = rec["components"][man]["floor"] or V._retention_floor(man)
    comp_of = {
        "postings_version": table,
        "df_version": table + "_df",
        "stats_version": table + "_stats",
    }
    checked = 0
    for mv in V._list_versions(man):
        if mv < max(mfloor, V._retention_floor(man)):
            continue
        row = V.read_version(spark, man, mv).collect()[0]
        for key, comp in comp_of.items():
            # every retained manifest's pinned component version is
            # still readable — no dangling pin, no VersionExpiredError
            V.read_version(spark, comp, int(row[key])).count()
            checked += 1
    assert checked >= 6  # two retained manifests x three components
    # the live probe still serves
    q = retrieval.corpus_queries(docs).filter(F.col("query_id") <= 62)
    assert retrieval.search_bm25_index(spark, table, q, k=5).collect()
