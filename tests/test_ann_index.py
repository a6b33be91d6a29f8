"""Persisted IVF index (r10): build-once/probe-many over the versioned
table — exact parity with the in-plan ivf_topk kernel, file-granular
stats pruning at probe time, and snapshot-reproducible search via time
travel."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import ann_index, similarity
from data_pipeline_zeal_spark.sources import versioned as V

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture()
def index_table():
    t = tempfile.mkdtemp(prefix="ivf_idx_")
    yield t
    shutil.rmtree(t, ignore_errors=True)
    shutil.rmtree(t + "_centroids", ignore_errors=True)


def test_index_search_matches_inplan_ivf_exactly(spark, index_table):
    """Same trainer sample/init/iters, same probe ranking and
    tie-breaks, same exact re-rank — the persisted path must reproduce
    ivf_topk row-for-row (this is what lets the registered query share
    its pinned oracle, and it inherits ivf_topk's recall gate)."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = [r.vec_id for r in emb.limit(200).collect() if r.vec_id % 31 == 0]
    ann_index.build_ivf_index(emb, index_table, n_cells=8)
    got = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in ann_index.search_ivf_index(
            spark, index_table, qids, k=10, nprobe=5
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in similarity.ivf_topk(
            emb, qids, k=10, n_cells=8, nprobe=5
        ).collect()
    }
    assert got == want and got


def test_probe_prunes_files(spark, index_table):
    """The structural claim: cell-clustered files + per-file stats mean
    a small probe set SKIPS parquet files outright — the index is an
    I/O reduction, not just a scoring reduction."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    ann_index.build_ivf_index(emb, index_table, n_cells=8)
    all_kept, n_all, _ = V.pruned_paths(index_table, [])
    kept, n_kept, n_skipped = V.pruned_paths(
        index_table, [("cell", "in", [0, 1])]
    )
    assert n_skipped > 0, "2-of-8-cell probe must skip files"
    assert n_kept < n_all
    # pruning is an I/O optimization, never a semantic change
    rows = V.read_where(spark, index_table, [("cell", "in", [0, 1])])
    assert {r.cell for r in rows.select("cell").distinct().collect()} == {0, 1}


def test_streaming_index_maintenance(spark, index_table, tmp_path):
    """New vectors stream into the index through foreachBatch: cells
    come from the index's own centroids, each micro-batch is one atomic
    append, replay adopts the existing commit, and a streamed vector is
    immediately probe-visible."""
    import os

    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.operators.similarity import (
        cell_assign_expr,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    cents = ann_index.build_ivf_index(seed, index_table, n_cells=4)

    # two micro-batch files of the held-out vectors
    src = str(tmp_path / "incoming")
    rest = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    half = rest.filter(F.col("vec_id") % 4 == 1)
    other = rest.filter(F.col("vec_id") % 4 == 3)
    half.coalesce(1).write.parquet(src + "/b1")
    other.coalesce(1).write.parquet(src + "/b2")
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
        stream.writeStream.foreachBatch(ann_index.ivf_index_sink(index_table))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    live = V.read_version(spark, index_table)
    assert live.count() == emb.count()  # every vector landed exactly once
    # appended cells match the build-time quantizer's assignment rule
    from data_pipeline_zeal_spark.functions.vector import as_double

    expect = rest.select(
        "vec_id",
        cell_assign_expr(as_double(F.col("embedding")), cents).alias("cell"),
    )
    got = live.join(rest.select("vec_id"), "vec_id", "left_semi").select(
        "vec_id", "cell"
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in expect.collect()
    }
    # a streamed vector is probe-visible: search FROM a streamed query id
    sq = [r.vec_id for r in rest.limit(1).collect()]
    hits = ann_index.search_ivf_index(spark, index_table, sq, k=5, nprobe=4)
    assert hits.count() == 5
    # replay adopts: re-running micro-batch 0's commit adds nothing
    n_hist = len(V.history(index_table))
    ann_index.ivf_index_sink(index_table)(
        spark.read.parquet(files[0]), 0
    )
    assert len(V.history(index_table)) == n_hist
    assert V.read_version(spark, index_table).count() == emb.count()


def test_optimize_recompacts_appended_index(spark, index_table, tmp_path):
    """Composition with OPTIMIZE: streamed appends fragment the index
    (each micro-batch commits its own small files); `versioned.compact`
    with cell clustering rewrites the snapshot into few cell-tight files
    — probe pruning is restored to build-time granularity, results are
    unchanged, and pre-compaction versions stay readable."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    ann_index.build_ivf_index(seed, index_table, n_cells=4)
    sink = ann_index.ivf_index_sink(index_table)
    rest = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    for i, m in enumerate((1, 3)):  # two appends fragment the table
        sink(rest.filter(F.col("vec_id") % 4 == m), i)

    qids = [r.vec_id for r in emb.limit(80).collect() if r.vec_id % 31 == 0]
    before = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=2
    ).collect()
    _, kept_before, _ = V.pruned_paths(index_table, [("cell", "in", [0])])

    V.compact(
        spark, index_table, cluster_by=["cell"], num_files=4, txn="opt-1"
    )
    _, kept_after, skipped_after = V.pruned_paths(
        index_table, [("cell", "in", [0])]
    )
    assert kept_after <= kept_before  # fragmentation reclaimed
    assert skipped_after > 0
    after = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=2
    ).collect()
    assert [tuple(r) for r in after] == [tuple(r) for r in before]
    # pre-compaction snapshot still readable (time travel over appends)
    assert V.read_version(spark, index_table, 3).count() == emb.count()


def test_index_rebuild_time_travel(spark, index_table):
    """Rebuilds are ordinary overwrite commits: a probe pinned to
    version 1 reproduces the original search after a rebuild changed
    the live index — index-snapshot reproducibility."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = [r.vec_id for r in emb.limit(100).collect() if r.vec_id % 31 == 0]
    ann_index.build_ivf_index(emb, index_table, n_cells=8, txn="build-1")
    v1 = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=5
    ).collect()
    # rebuild with a different layout (fewer, coarser cells)
    ann_index.build_ivf_index(emb, index_table, n_cells=4, txn="build-2")
    pinned = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=5, version=1
    ).collect()
    assert [tuple(r) for r in pinned] == [tuple(r) for r in v1]
    # the live index serves the new layout (4 cells)
    live_cells = {
        r.cell
        for r in V.read_version(spark, index_table)
        .select("cell")
        .distinct()
        .collect()
    }
    assert live_cells <= set(range(4))
    # txn idempotency: replaying build-2 adopts, no new version
    hist_before = len(V.history(index_table))
    ann_index.build_ivf_index(emb, index_table, n_cells=4, txn="build-2")
    assert len(V.history(index_table)) == hist_before


def test_time_travel_after_streamed_append(spark, index_table, tmp_path):
    """r10 advice (medium): streaming appends advance only the MAIN log,
    so passing the main version verbatim to the centroids companion
    raised ValueError on any post-append time-travel probe.  The commit
    meta pointer (``centroid_version``) resolves the quantizer each main
    snapshot was actually assigned under."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    ann_index.build_ivf_index(seed, index_table, n_cells=4, txn="b1")
    sink = ann_index.ivf_index_sink(index_table)
    rest = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    sink(rest, 0)  # main log now at v2; centroids companion still at v1

    qids = [r.vec_id for r in emb.limit(60).collect() if r.vec_id % 31 == 0]
    # the r10 repro: a probe pinned at the post-append version must work
    pinned = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=3, version=2
    ).collect()
    live = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=3
    ).collect()
    assert [tuple(r) for r in pinned] == [tuple(r) for r in live] and live
    # a rebuild changes the quantizer; a probe pinned BEFORE the rebuild
    # still resolves the OLD centroids through the meta pointer
    ann_index.build_ivf_index(emb, index_table, n_cells=8, txn="b2")
    assert ann_index._centroid_version_at(index_table, 2) == 1
    assert ann_index._centroid_version_at(index_table, None) == 2
    re_pinned = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=3, version=2
    ).collect()
    assert [tuple(r) for r in re_pinned] == [tuple(r) for r in pinned]


def test_drift_triggered_rebuild(spark, index_table):
    """r10 directive #6: inject drifted appends (a constant offset — an
    upstream embedding-model shift), assert the drift check fires, the
    hook rebuilds, and the rebuilt index restores the recall gate >= 0.8
    against the exact kernel on the drifted corpus."""
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.operators import similarity

    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    ann_index.build_ivf_index(seed, index_table, n_cells=4, txn="b1")
    # undrifted index: the hook must NOT rebuild
    res0 = ann_index.ivf_rebuild_if_drifted(
        spark, index_table, min_cosine=0.9
    )
    assert not res0["rebuilt"] and res0["worst_cell_cosine"] >= 0.9

    # drifted appends: shift every component by +3 (cosine geometry of
    # the cells rotates hard toward the all-ones direction)
    maxid = emb.agg(F.max("vec_id")).first()[0]
    drifted = emb.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") + maxid + 1).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x + 3.0
        ).alias("embedding"),
    )
    ann_index.ivf_index_sink(index_table)(drifted, 0)

    res1 = ann_index.ivf_rebuild_if_drifted(
        spark, index_table, min_cosine=0.9, txn="drift-rebuild-1"
    )
    assert res1["rebuilt"] and res1["worst_cell_cosine"] < 0.9
    # post-rebuild: drift cleared and recall restored on the NEW corpus
    res2 = ann_index.ivf_rebuild_if_drifted(spark, index_table, min_cosine=0.9)
    assert not res2["rebuilt"], res2

    live = V.read_version(spark, index_table).select("vec_id", "embedding")
    qids = [r.vec_id for r in live.orderBy("vec_id").limit(10).collect()]
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(live, qids, k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ann_index.search_ivf_index(
            spark, index_table, qids, k=10, nprobe=3
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"post-rebuild recall {recall:.2f} < 0.8"


def test_reproducible_flag_pins_exact_cell_ranking(spark, index_table,
                                                   monkeypatch):
    """Round-12 advice: the automatic exact->numpy ranking crossover
    makes cell shortlists depend on probe batch size (BLAS last-ulp
    near-ties), so snapshot-reproducible callers need a public knob.
    ``reproducible=True`` must force the exact fold regardless of batch
    size — and return the same rows as the default on the fixture
    (where both paths agree)."""
    from data_pipeline_zeal_spark.operators import ann_index as ai

    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = [r.vec_id for r in emb.limit(64).collect() if r.vec_id % 7 == 0]
    ann_index.build_ivf_index(emb, index_table, n_cells=8)

    seen: list = []
    orig = ai._rank_cells

    def spy(qvecs, cents, cnorms, nprobe, force=None):
        seen.append(force)
        return orig(qvecs, cents, cnorms, nprobe, force)

    monkeypatch.setattr(ai, "_rank_cells", spy)
    base = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=4
    ).collect()
    repro = ann_index.search_ivf_index(
        spark, index_table, qids, k=5, nprobe=4, reproducible=True
    ).collect()
    assert seen == [None, "exact"]
    key = lambda rows: sorted(  # noqa: E731
        (r.query_id, r.rank, r.vec_id, r.cosine) for r in rows
    )
    assert key(base) == key(repro) and base


def test_segment_probe_matches_direct_sink_twin_and_recall(
    spark, index_table
):
    """Semantic gates for the registered sim_ivf_segment_search row
    (r14 — round-13 verdict #6): (a) BATCHING INDEPENDENCE — the probe
    over an index whose held-out quarter streamed in as two micro-
    batches equals, row for row, the probe over a twin whose quarter
    landed as one direct sink call (the quantizer is frozen at build
    time, so assignment and therefore probing cannot depend on how the
    appends were batched); (b) the merged index clears the same
    recall@10 floor as the in-plan IVF kernel."""
    from pyspark.sql import functions as F

    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 4 != 1)
    rest = emb.filter(F.col("vec_id") % 4 == 1).select(
        "vec_id", "embedding"
    )
    qids = list(range(10))

    ann_index.build_ivf_index(seed, index_table, n_cells=8)
    sink = ann_index.ivf_index_sink(index_table, "seg-two")
    sink(rest.filter(F.col("vec_id") % 8 == 1), 0)
    sink(rest.filter(F.col("vec_id") % 8 == 5), 1)
    got = [
        tuple(r)
        for r in ann_index.search_ivf_index(
            spark, index_table, qids, k=10, nprobe=5, reproducible=True
        ).collect()
    ]

    twin = tempfile.mkdtemp(prefix="ivf_twin_")
    try:
        ann_index.build_ivf_index(seed, twin, n_cells=8)
        ann_index.ivf_index_sink(twin, "seg-one")(rest, 0)
        want = [
            tuple(r)
            for r in ann_index.search_ivf_index(
                spark, twin, qids, k=10, nprobe=5, reproducible=True
            ).collect()
        ]
    finally:
        shutil.rmtree(twin, ignore_errors=True)
        shutil.rmtree(twin + "_centroids", ignore_errors=True)

    assert got == want and got
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    approx = {(r[0], r[1]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"segment-flow IVF recall {recall:.2f} < 0.8"
