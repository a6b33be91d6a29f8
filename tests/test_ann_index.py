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
