"""Persisted BM25 inverted index (r10): build-once/probe-many over the
versioned table — exact parity with the in-plan bm25_search kernel,
bucket-file pruning at probe time, snapshot-reproducible ranking."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import retrieval
from data_pipeline_zeal_spark.sources import versioned as V

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture()
def bm25_table():
    t = tempfile.mkdtemp(prefix="bm25_idx_")
    yield t
    for s in ("", "_df", "_stats", "_manifest"):
        shutil.rmtree(t + s, ignore_errors=True)


def test_index_search_matches_inplan_bm25_exactly(spark, bm25_table):
    """Same tf/dl/df/stats arithmetic, same idf/denominator expression,
    same rounding and tie-breaks: the persisted probe must reproduce
    bm25_search row-for-row — this is what lets the registered query
    share bm25's INDEPENDENT DuckDB SQL oracle (not a pin)."""
    docs = load_table(spark, SF_SMALL, "documents")
    retrieval.build_bm25_index(docs, bm25_table, n_buckets=16)
    q = retrieval.corpus_queries(docs)
    got = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, q, k=10
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in retrieval.bm25_search(docs, q, k=10).collect()
    }
    assert got == want and got


def test_probe_prunes_posting_files(spark, bm25_table):
    """The structural claim: bucket-clustered postings + per-file stats
    mean a bounded query vocabulary opens only its buckets' files —
    and pruning never changes results (I/O optimization, not
    semantics)."""
    docs = load_table(spark, SF_SMALL, "documents")
    retrieval.build_bm25_index(docs, bm25_table, n_buckets=16)
    _, n_all, _ = V.pruned_paths(bm25_table, [])
    kept, n_kept, n_skipped = V.pruned_paths(
        bm25_table, [("bucket", "in", [0, 1, 2])]
    )
    assert n_skipped > 0 and n_kept < n_all
    rows = V.read_where(spark, bm25_table, [("bucket", "in", [0, 1, 2])])
    assert {
        r.bucket for r in rows.select("bucket").distinct().collect()
    } <= {0, 1, 2}
    # a one-query probe scans a strict subset of the posting files: the
    # single query's vocabulary cannot cover every bucket at 16 buckets
    one = retrieval.corpus_queries(docs).filter(F.col("query_id") == 0)
    bks = sorted(
        r.b
        for r in one.select(
            F.pmod(F.xxhash64("token"), F.lit(16)).cast("int").alias("b")
        ).distinct().collect()
    )
    _, n_probe, n_skip = V.pruned_paths(bm25_table, [("bucket", "in", bks)])
    assert n_probe < n_all or n_skip > 0


def test_index_rebuild_time_travel(spark, bm25_table):
    """Rebuilds are overwrite commits across all three tables: a probe
    pinned to version 1 reproduces the original ranking after the
    corpus (and therefore df/stats) changed under a rebuild."""
    docs = load_table(spark, SF_SMALL, "documents")
    q = retrieval.corpus_queries(docs).filter(F.col("query_id") <= 62)
    retrieval.build_bm25_index(docs, bm25_table, n_buckets=8, txn="b1")
    v1 = retrieval.search_bm25_index(spark, bm25_table, q, k=5).collect()
    # rebuild over HALF the corpus: scores/df/avgdl all change
    retrieval.build_bm25_index(
        docs.filter(F.col("doc_id") % 2 == 0), bm25_table,
        n_buckets=8, txn="b2",
    )
    pinned = retrieval.search_bm25_index(
        spark, bm25_table, q, k=5, version=1
    ).collect()
    assert [tuple(r) for r in pinned] == [tuple(r) for r in v1]
    live = retrieval.search_bm25_index(spark, bm25_table, q, k=5).collect()
    assert {r.doc_id for r in live} <= {
        r.doc_id for r in docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id").collect()
    }
    # txn idempotency: replaying build b2 adopts all three commits
    hist = [len(V.history(bm25_table + s)) for s in ("", "_df", "_stats", "_manifest")]
    retrieval.build_bm25_index(
        docs.filter(F.col("doc_id") % 2 == 0), bm25_table,
        n_buckets=8, txn="b2",
    )
    assert [
        len(V.history(bm25_table + s)) for s in ("", "_df", "_stats", "_manifest")
    ] == hist


def test_empty_query_set(spark, bm25_table):
    docs = load_table(spark, SF_SMALL, "documents")
    retrieval.build_bm25_index(docs, bm25_table, n_buckets=8)
    empty = retrieval.corpus_queries(docs).filter(F.lit(False))
    out = retrieval.search_bm25_index(spark, bm25_table, empty, k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "doc_id", "score", "rank"]


def test_streaming_segment_maintenance_exact(spark, bm25_table, tmp_path):
    """r11 segment staging: documents stream into the index through
    foreachBatch — per-segment postings/df/stats append, probes merge
    the segments, and the merged ranking is EXACTLY a from-scratch
    rebuild's (df adds; avgdl folds from integer-valued sums)."""
    import os

    docs = load_table(spark, SF_SMALL, "documents")
    seed = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    retrieval.build_bm25_index(seed, bm25_table, n_buckets=8, txn="seed")

    src = str(tmp_path / "incoming")
    rest.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.parquet(src + "/b1")
    rest.filter(F.col("doc_id") % 4 == 3).coalesce(1).write.parquet(src + "/b2")
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    os.utime(files[0], (1_700_000_000, 1_700_000_000))
    os.utime(files[1], (1_700_000_100, 1_700_000_100))
    stream = (
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(retrieval.bm25_index_sink(bm25_table))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    queries = retrieval.corpus_queries(docs).filter(F.col("query_id") <= 93)
    got = retrieval.search_bm25_index(spark, bm25_table, queries, k=10)

    fresh_table = bm25_table + "_fresh"
    try:
        retrieval.build_bm25_index(docs, fresh_table, n_buckets=8)
        want = retrieval.search_bm25_index(spark, fresh_table, queries, k=10)
        assert [tuple(r) for r in got.collect()] == [
            tuple(r) for r in want.collect()
        ] and got.count() > 0
    finally:
        import shutil

        for s in ("", "_df", "_stats", "_manifest"):
            shutil.rmtree(fresh_table + s, ignore_errors=True)

    # the pruning pin survives appends: appended segment files carry
    # their own tight bucket bounds
    _, n_all, _ = V.pruned_paths(bm25_table, [])
    _, n_kept, n_skipped = V.pruned_paths(bm25_table, [("bucket", "in", [0])])
    assert n_skipped > 0 and n_kept < n_all

    # replay adopts all three segment commits — no growth
    hist = [len(V.history(bm25_table + s)) for s in ("", "_df", "_stats", "_manifest")]
    retrieval.bm25_index_sink(bm25_table)(spark.read.parquet(files[0]), 0)
    assert [
        len(V.history(bm25_table + s)) for s in ("", "_df", "_stats", "_manifest")
    ] == hist

    # OPTIMIZE folds the segments: scores unchanged, df/stats one row per
    # key again, postings pruning restored to build-time granularity
    before = [tuple(r) for r in got.collect()]
    retrieval.optimize_bm25_index(spark, bm25_table, txn="opt-1")
    after = retrieval.search_bm25_index(spark, bm25_table, queries, k=10)
    assert [tuple(r) for r in after.collect()] == before
    assert (
        V.read_version(spark, bm25_table + "_stats").count() == 1
        and V.read_version(spark, bm25_table + "_df")
        .groupBy("token").count().filter("count > 1").count() == 0
    )


def test_manifest_commit_point_atomicity(spark, bm25_table):
    """r11 commit point: the manifest (written LAST) makes the
    three-table index snapshot-atomic for readers — a torn write
    (postings + df landed, stats + manifest not) leaves probes on the
    previous commit point, and completing the replay publishes the new
    one; `version` time-travels all three tables coherently through one
    manifest number."""
    docs = load_table(spark, SF_SMALL, "documents")
    seed = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    retrieval.build_bm25_index(seed, bm25_table, n_buckets=8, txn="seed")
    queries = retrieval.corpus_queries(docs).filter(F.col("query_id") <= 93)
    at_build = [
        tuple(r)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, queries, k=5
        ).collect()
    ]

    # simulate a crash mid-sink: replay the sink's first two commits only
    # (postings + df), no stats segment, no manifest
    from pyspark.sql import Window as W

    tf = (
        rest.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("dl", F.sum("tf").over(W.partitionBy("doc_id")).cast("double"))
        .withColumn("bucket", F.pmod(F.xxhash64("token"), F.lit(8)).cast("int"))
    )
    V.commit_write(tf, bm25_table, mode="append", txn="bm25-append-0")
    V.commit_write(
        tf.groupBy("bucket", "token").agg(F.count(F.lit(1)).alias("df")),
        bm25_table + "_df", mode="append", txn="bm25-append-df-0",
    )
    # a probe in the torn window sees the OLD complete snapshot exactly
    torn = [
        tuple(r)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, queries, k=5
        ).collect()
    ]
    assert torn == at_build

    # the replayed micro-batch adopts the landed pieces, lands the rest,
    # republishes the manifest — and the probe flips to the merged answer
    retrieval.bm25_index_sink(bm25_table)(rest, 0)
    assert len(V.history(bm25_table)) == 2  # postings adopted, not doubled
    merged = [
        tuple(r)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, queries, k=5
        ).collect()
    ]
    assert merged != at_build
    # one manifest number snapshots all three tables coherently
    pinned = [
        tuple(r)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, queries, k=5, version=1
        ).collect()
    ]
    assert pinned == at_build


def test_delete_docs_matches_rebuild_on_survivors(spark, bm25_table):
    """r12 — EXACT document deletion, not Lucene's stale-df tombstones:
    after delete_bm25_docs, every probe score must match a from-scratch
    build over the surviving corpus row for row (the negative df /
    stats segments are integer-exact corrections, and the DV anti-join
    removes the deleted docs' postings), and deleted docs must never
    appear as hits."""
    docs = load_table(spark, SF_SMALL, "documents")
    retrieval.build_bm25_index(docs, bm25_table, n_buckets=8, txn="b1")
    doomed = [r.doc_id for r in docs.select("doc_id").collect()
              if r.doc_id % 3 == 0]
    rep = retrieval.delete_bm25_docs(spark, bm25_table, doomed, txn="d1")
    assert rep["docs_deleted"] == len(doomed) > 0
    assert rep["postings_deleted"] > 0

    survivors = docs.filter(~F.col("doc_id").isin(doomed))
    q = retrieval.corpus_queries(survivors).filter(F.col("query_id") <= 90)
    got = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, q, k=10
        ).collect()
    }
    ref = tempfile.mkdtemp(prefix="bm25_ref_")
    try:
        retrieval.build_bm25_index(survivors, ref, n_buckets=8)
        want = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in retrieval.search_bm25_index(spark, ref, q, k=10)
            .collect()
        }
    finally:
        for s in ("", "_df", "_stats", "_manifest"):
            shutil.rmtree(ref + s, ignore_errors=True)
    assert got == want and got
    assert not {d for d, _ in got.values()} & set(doomed)

    # txn replay adopts every piece — no double correction
    n_hist = len(V.history(bm25_table + "_stats"))
    retrieval.delete_bm25_docs(spark, bm25_table, doomed, txn="d1")
    assert len(V.history(bm25_table + "_stats")) == n_hist
    # optimize folds tombstones + negative segments; scores unchanged
    retrieval.optimize_bm25_index(spark, bm25_table, txn="o1")
    after = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, q, k=10
        ).collect()
    }
    assert after == want
    assert not V.live_dv_dirs(bm25_table)
    # the folded stats are one positive segment again
    srows = V.read_version(spark, bm25_table + "_stats").collect()
    assert len(srows) == 1 and srows[0].n_docs > 0

    # deleting ids that do not exist is a clean no-op
    rep0 = retrieval.delete_bm25_docs(spark, bm25_table, [10**9], txn="d2")
    assert rep0 == {"docs_deleted": 0, "postings_deleted": 0}


def test_delete_docs_pre_delete_snapshot_stays_consistent(spark, bm25_table):
    """The manifest-last discipline under deletion: a probe pinned to
    the pre-delete manifest version reproduces the pre-delete ranking
    exactly (tombstones are invisible below the delete commit, df/stats
    resolve through the old triple)."""
    docs = load_table(spark, SF_SMALL, "documents")
    retrieval.build_bm25_index(docs, bm25_table, n_buckets=8, txn="b1")
    mv = V.latest_version(bm25_table + "_manifest")
    q = retrieval.corpus_queries(docs).filter(F.col("query_id") <= 62)
    before = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, q, k=5, version=mv
        ).collect()
    }
    doomed = [r.doc_id for r in docs.select("doc_id").collect()
              if r.doc_id % 2 == 0]
    retrieval.delete_bm25_docs(spark, bm25_table, doomed, txn="d1")
    pinned = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, q, k=5, version=mv
        ).collect()
    }
    assert pinned == before and pinned


def test_delete_crash_replay_republishes_manifest(spark, bm25_table,
                                                  monkeypatch):
    """Round-12 advice (the one crash window in the delete's
    exactly-once claim): if the process dies after the DV commit lands
    but before the manifest publish, a replay of the SAME txn re-reads
    the table with the DVs already applied, finds n_del == 0 — and must
    STILL republish the manifest, or probes keep serving the pre-delete
    snapshot until some unrelated publish."""
    docs = load_table(spark, SF_SMALL, "documents")
    retrieval.build_bm25_index(docs, bm25_table, n_buckets=8, txn="b1")
    mv0 = V.latest_version(bm25_table + "_manifest")
    doomed = [r.doc_id for r in docs.select("doc_id").collect()
              if r.doc_id % 4 == 0]

    orig = retrieval._commit_manifest

    def dying(spark_, table_, txn=None):
        raise RuntimeError("simulated crash before manifest publish")

    monkeypatch.setattr(retrieval, "_commit_manifest", dying)
    with pytest.raises(RuntimeError):
        retrieval.delete_bm25_docs(spark, bm25_table, doomed, txn="dc1")
    monkeypatch.setattr(retrieval, "_commit_manifest", orig)

    # the crash left the DV landed but the manifest pre-delete
    assert V.live_dv_dirs(bm25_table)
    assert V.latest_version(bm25_table + "_manifest") == mv0

    # replay: n_del == 0 (DVs applied), yet the manifest is republished
    rep = retrieval.delete_bm25_docs(spark, bm25_table, doomed, txn="dc1")
    assert rep["docs_deleted"] == 0
    assert V.latest_version(bm25_table + "_manifest") > mv0
    # and the served snapshot now excludes every deleted doc
    q = retrieval.corpus_queries(docs).filter(F.col("query_id") <= 62)
    hits = retrieval.search_bm25_index(spark, bm25_table, q, k=10).collect()
    assert hits and not {r.doc_id for r in hits} & set(doomed)

    # a txn-less no-op delete stays publish-free (no replay claim)
    mv1 = V.latest_version(bm25_table + "_manifest")
    rep0 = retrieval.delete_bm25_docs(spark, bm25_table, [10**9])
    assert rep0["docs_deleted"] == 0
    assert V.latest_version(bm25_table + "_manifest") == mv1


def test_session_build_cache_and_clone_isolation(spark, bm25_table):
    """r13 directive #3: the session-scoped build cache returns the SAME
    base for the same corpus (no second build), a DIFFERENT base for a
    different slice, and hard-link forks isolate mutations — deleting on
    a fork leaves the shared base's probes bit-identical."""
    docs = load_table(spark, SF_SMALL, "documents")
    try:
        base = retrieval.bm25_index_for(docs, n_buckets=8)
        assert retrieval.bm25_index_for(docs, n_buckets=8) == base
        # a different corpus slice gets its own base
        half = retrieval.bm25_index_for(
            docs.filter(F.col("doc_id") % 2 == 0), n_buckets=8
        )
        assert half != base
        # and a different bucket layout too
        assert retrieval.bm25_index_for(docs, n_buckets=4) not in (base,
                                                                   half)

        q = retrieval.corpus_queries(docs).filter(F.col("query_id") <= 62)
        before = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in retrieval.search_bm25_index(spark, base, q, k=5)
            .collect()
        }
        fork = retrieval.clone_bm25_index(spark, base, bm25_table)
        doomed = [r.doc_id for r in docs.select("doc_id").collect()
                  if r.doc_id % 3 == 0]
        retrieval.delete_bm25_docs(spark, fork, doomed, txn="d1")
        hits = retrieval.search_bm25_index(spark, fork, q, k=5).collect()
        assert hits and not {r.doc_id for r in hits} & set(doomed)
        # the shared base is untouched by the fork's DV + negative
        # segments + manifest publish
        after = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in retrieval.search_bm25_index(spark, base, q, k=5)
            .collect()
        }
        assert after == before
        # a mutated (multi-commit) table is not a valid clone source
        with pytest.raises(ValueError):
            retrieval.clone_bm25_index(spark, fork)
    finally:
        # drop this test's cache entries so later tests rebuild cleanly
        for key, path in list(retrieval._BM25_BUILD_CACHE.items()):
            for s in ("", "_df", "_stats", "_manifest"):
                shutil.rmtree(path + s, ignore_errors=True)
            del retrieval._BM25_BUILD_CACHE[key]


def test_delete_docs_where_predicate_equals_id_list(spark, bm25_table):
    """r13: the predicate delete surface (the 100 TB form — no driver-
    side id list) must produce EXACTLY the id-list delete's index state:
    same probe scores, same df/stats corrections, both equal to the
    from-scratch rebuild on the survivors."""
    docs = load_table(spark, SF_SMALL, "documents")
    retrieval.build_bm25_index(docs, bm25_table, n_buckets=8, txn="b1")
    cut = 60
    rep = retrieval.delete_bm25_docs_where(
        spark, bm25_table, [("doc_id", "<", cut)], txn="dw1"
    )
    assert rep["docs_deleted"] > 0 and rep["postings_deleted"] > 0

    survivors = docs.filter(F.col("doc_id") >= cut)
    q = retrieval.corpus_queries(survivors).filter(F.col("query_id") <= 93)
    got = {
        (r.query_id, r.rank): (r.doc_id, r.score)
        for r in retrieval.search_bm25_index(
            spark, bm25_table, q, k=10
        ).collect()
    }
    # twin 1: the id-list wrapper on a fresh build
    ids = [r.doc_id for r in docs.filter(F.col("doc_id") < cut)
           .select("doc_id").collect()]
    ref1 = tempfile.mkdtemp(prefix="bm25_idl_")
    ref2 = tempfile.mkdtemp(prefix="bm25_reb_")
    try:
        retrieval.build_bm25_index(docs, ref1, n_buckets=8)
        retrieval.delete_bm25_docs(spark, ref1, ids, txn="d1")
        want1 = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in retrieval.search_bm25_index(spark, ref1, q, k=10)
            .collect()
        }
        # twin 2: from-scratch rebuild on the survivors
        retrieval.build_bm25_index(survivors, ref2, n_buckets=8)
        want2 = {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in retrieval.search_bm25_index(spark, ref2, q, k=10)
            .collect()
        }
    finally:
        for base in (ref1, ref2):
            for s in ("", "_df", "_stats", "_manifest"):
                shutil.rmtree(base + s, ignore_errors=True)
    assert got == want1 == want2 and got
    # txn replay of the predicate form adopts (no double correction)
    n_hist = len(V.history(bm25_table + "_stats"))
    retrieval.delete_bm25_docs_where(
        spark, bm25_table, [("doc_id", "<", cut)], txn="dw1"
    )
    assert len(V.history(bm25_table + "_stats")) == n_hist


def test_bm25_lifecycle_randomized_soak(spark, bm25_table):
    """Soak law for the full index lifecycle (r14 — round-13 verdict
    #4): a seeded random interleaving of sink segment appends,
    predicate deletes, optimize folds, and retention ticks — the
    pairwise interactions are each pinned above; this pins the
    INTERLEAVINGS.  After EVERY step: (a) a probe over the index equals
    a from-scratch rebuild over the logical survivors row for row, and
    (b) the live manifest's pinned (postings, df, stats) triple stays
    readable."""
    import random

    from data_pipeline_zeal_spark.operators import maintenance

    rng = random.Random(0xB2551401)
    docs = load_table(spark, SF_SMALL, "documents").filter(
        F.col("doc_id") < 220
    )
    base = docs.filter(F.col("doc_id") < 100)
    retrieval.build_bm25_index(base, bm25_table, n_buckets=4, txn="b0")
    live = set(range(0, 100))
    pool = [(100, 160), (160, 220)]  # append slices
    batch_id = 0

    def probe_rows(table, survivors):
        q = retrieval.corpus_queries(survivors).filter(
            F.col("query_id") <= 124
        )
        return {
            (r.query_id, r.rank): (r.doc_id, r.score)
            for r in retrieval.search_bm25_index(
                spark, table, q, k=5
            ).collect()
        }

    # one of each lifecycle verb, seeded-shuffled interleaving; the
    # per-step rebuild oracle dominates the budget, so the trajectory is
    # kept to 4 steps (pairwise pins above cover the longer tails)
    ops = ["append", "delete", "optimize", "tick"]
    rng.shuffle(ops)
    for step, op in enumerate(ops):
        if op == "append" and pool:
            lo, hi = pool.pop(0)
            retrieval.bm25_index_sink(bm25_table)(
                docs.filter(
                    (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
                ),
                batch_id,
            )
            batch_id += 1
            live |= set(range(lo, hi))
        elif op == "delete":
            lo = rng.choice(sorted(live)[: max(1, len(live) - 40)])
            retrieval.delete_bm25_docs_where(
                spark, bm25_table,
                [("doc_id", ">=", lo), ("doc_id", "<", lo + 35)],
                txn=f"soak-d{step}",
            )
            live -= set(range(lo, lo + 35))
        elif op == "optimize":
            retrieval.optimize_bm25_index(
                spark, bm25_table, txn=f"soak-o{step}"
            )
        else:
            maintenance.maintain_index(
                spark, bm25_table, vacuum_keep_history=2,
                max_expired_dirs=0, retention_seconds=0.0,
                txn=f"soak-t{step}",
            )
        survivors = docs.filter(F.col("doc_id").isin(sorted(live)))
        got = probe_rows(bm25_table, survivors)
        ref = tempfile.mkdtemp(prefix="bm25_soakref_")
        try:
            retrieval.build_bm25_index(survivors, ref, n_buckets=4)
            want = probe_rows(ref, survivors)
        finally:
            for s in ("", "_df", "_stats", "_manifest"):
                shutil.rmtree(ref + s, ignore_errors=True)
        assert got == want and got, (step, op)
        # the manifest triple is always readable (atomic commit point)
        man = bm25_table + "_manifest"
        row = V.read_version(spark, man).collect()[0]
        for comp, pin in (
            (bm25_table, row.postings_version),
            (bm25_table + "_df", row.df_version),
            (bm25_table + "_stats", row.stats_version),
        ):
            V.read_version(spark, comp, int(pin)).count()
    assert len(live) < 220  # the trajectory actually deleted
