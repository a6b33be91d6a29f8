"""Persisted IVFADC index (r11): the compressed-codes sibling of the r10
IVF index — m code ints per vector instead of dim doubles, decode inside
the pruned probe slice, exact rerank from the full-precision source, and
row-for-row parity with the in-plan ivf_pq_topk kernel (which is what
lets the registered query share its pinned oracle and recall gate)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.functions.vector import as_double
from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import ann_index, similarity
from data_pipeline_zeal_spark.sources import versioned as V

SF_SMALL = "/root/testdata/sf0.001"
LAYOUT = dict(n_cells=8, m=8, n_codes=32)
PROBE = dict(k=10, nprobe=6, rerank=200)


@pytest.fixture()
def index_table():
    t = tempfile.mkdtemp(prefix="ivfadc_idx_")
    yield t
    for suffix in ("", "_centroids", "_codebooks"):
        shutil.rmtree(t + suffix, ignore_errors=True)


def _qids(emb):
    return [r.vec_id for r in emb.limit(200).collect() if r.vec_id % 31 == 0]


def test_decoder_is_exact_inverse_of_encoder(spark, index_table):
    """decode(codes) must be BIT-identical to the encoder's transient
    reconstruction (same float64 matrices, pure indexing + add) — the
    arithmetic foundation of the persisted/in-plan parity."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = similarity.train_kmeans_centroids(emb, n_cells=8)
    books = similarity.train_pq_codebooks_residual(emb, cents, 8, 32)
    src = emb.select("vec_id", as_double(F.col("embedding")).alias("v"))
    rv = {
        r.vec_id: tuple(r.rv)
        for r in src.mapInPandas(
            similarity.ivfadc_encoder(cents, books, emit="rv"),
            "vec_id long, cell int, rv array<double>",
        ).collect()
    }
    codes = src.mapInPandas(
        similarity.ivfadc_encoder(cents, books, emit="codes"),
        "vec_id long, cell int, codes array<int>",
    )
    decoded = {
        r.vec_id: tuple(r.rv)
        for r in codes.mapInPandas(
            similarity.ivfadc_decoder(cents, books),
            "vec_id long, cell int, rv array<double>",
        ).collect()
    }
    assert decoded == rv and len(decoded) == emb.count()


def test_index_search_matches_inplan_ivf_pq_exactly(spark, index_table):
    """Same trainers, same encode arithmetic, same cell ranking
    tie-breaks, same ADC scoring and exact rerank — the persisted path
    reproduces ivf_pq_topk row-for-row, so the registered query shares
    its pinned oracle and inherits its recall gate."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    qids = _qids(emb)
    ann_index.build_ivfadc_index(emb, index_table, **LAYOUT)
    got = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in ann_index.search_ivfadc_index(
            spark, index_table, emb, qids, **PROBE
        ).collect()
    }
    want = {
        (r.query_id, r.rank): (r.vec_id, r.cosine)
        for r in similarity.ivf_pq_topk(emb, qids, **PROBE, **LAYOUT).collect()
    }
    assert got == want and got


def test_probe_prunes_code_files(spark, index_table):
    """Cell-clustered code files + per-file stats: a small probe set
    skips parquet files outright, same structural claim as the IVF
    index but over the compressed payload."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    ann_index.build_ivfadc_index(emb, index_table, **LAYOUT)
    _, n_all, _ = V.pruned_paths(index_table, [])
    _, n_kept, n_skipped = V.pruned_paths(index_table, [("cell", "in", [0, 1])])
    assert n_skipped > 0 and n_kept < n_all


def test_codes_index_is_smaller_than_vector_index(spark, index_table):
    """The memory-wall claim, measured: the IVFADC main table stores m
    int32 codes per vector, the IVF main table stores dim doubles — on
    the same corpus the code files must be materially smaller, and the
    stats helper must report >1x compression vs raw fp32."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    ann_index.build_ivfadc_index(emb, index_table, **LAYOUT)
    assert "embedding" not in V.read_version(spark, index_table).columns

    ivf_t = tempfile.mkdtemp(prefix="ivf_ref_")
    try:
        ann_index.build_ivf_index(emb, ivf_t, n_cells=8)
        import os

        def dir_bytes(d):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(d)
                for f in fs
                if f.endswith(".parquet")
            )

        assert dir_bytes(index_table) < dir_bytes(ivf_t) / 2
    finally:
        shutil.rmtree(ivf_t, ignore_errors=True)
        shutil.rmtree(ivf_t + "_centroids", ignore_errors=True)

    stats = ann_index.ivfadc_index_stats(spark, index_table)
    assert stats["n_vectors"] == emb.count() and stats["dim"] == 64
    assert stats["compression_x"] > 1.0


def test_streaming_sink_appends_frozen_model_codes(spark, index_table):
    """Micro-batch appends encode with the index's OWN frozen models:
    appended codes equal a direct encode under those models, the commit
    is txn-idempotent on replay, and appended vectors are immediately
    probe-visible."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    built = ann_index.build_ivfadc_index(seed, index_table, **LAYOUT)
    rest = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    sink = ann_index.ivfadc_index_sink(index_table)
    sink(rest, 0)

    live = V.read_version(spark, index_table)
    assert live.count() == emb.count()
    expect = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in rest.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        ).mapInPandas(
            similarity.ivfadc_encoder(
                built["centroids"], built["codebooks"], emit="codes"
            ),
            "vec_id long, cell int, codes array<int>",
        ).collect()
    }
    got = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in live.join(rest.select("vec_id"), "vec_id", "left_semi")
        .collect()
    }
    assert got == expect

    # replay adopts the existing commit — no new version, no duplicates
    n_hist = len(V.history(index_table))
    sink(rest, 0)
    assert len(V.history(index_table)) == n_hist
    assert V.read_version(spark, index_table).count() == emb.count()

    # a streamed vector is probe-visible
    sq = [r.vec_id for r in rest.limit(1).collect()]
    hits = ann_index.search_ivfadc_index(
        spark, index_table, emb, sq, k=5, nprobe=4
    )
    assert hits.count() == 5


def test_time_travel_resolves_models_after_append_and_rebuild(
    spark, index_table
):
    """The round-10 pointer discipline, applied to BOTH models: appends
    advance only the main log, so a post-append time-travel probe must
    resolve centroids AND codebooks through the commit-meta pointers;
    after a rebuild retrains both models, a probe pinned below the
    rebuild still reproduces the old search exactly."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    ann_index.build_ivfadc_index(seed, index_table, **LAYOUT, txn="b1")
    rest = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    ann_index.ivfadc_index_sink(index_table)(rest, 0)  # main v2, models v1

    qids = _qids(emb)
    pinned = ann_index.search_ivfadc_index(
        spark, index_table, emb, qids, k=5, nprobe=3, version=2
    ).collect()
    live = ann_index.search_ivfadc_index(
        spark, index_table, emb, qids, k=5, nprobe=3
    ).collect()
    assert [tuple(r) for r in pinned] == [tuple(r) for r in live] and live

    # rebuild retrains both models (coarser layout)
    ann_index.build_ivfadc_index(
        emb, index_table, n_cells=4, m=8, n_codes=16, txn="b2"
    )
    assert ann_index._centroid_version_at(index_table, 2) == 1
    assert (
        ann_index._meta_pointer_at(
            index_table, 2, "codebook_version", index_table + "_codebooks"
        )
        == 1
    )
    re_pinned = ann_index.search_ivfadc_index(
        spark, index_table, emb, qids, k=5, nprobe=3, version=2
    ).collect()
    assert [tuple(r) for r in re_pinned] == [tuple(r) for r in pinned]
    # the live index serves the new layout: codes are m=8 ints < 16
    row = V.read_version(spark, index_table).limit(1).collect()[0]
    assert len(row.codes) == 8 and max(row.codes) < 16


def test_query_row_fetch_is_bloom_pruned(spark, index_table):
    """The probe's query-row fetch reads by vec_id — an unsorted key on
    the cell-clustered layout, so zone maps keep every file; the
    per-file Bloom bitmaps (r11) pinpoint the file actually holding the
    query vector, and the search result is unchanged."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    ann_index.build_ivfadc_index(emb, index_table, **LAYOUT)
    # a MID-RANGE id: inside every cell-clustered file's vec_id span (an
    # extreme id would let zone maps prune trivially, proving nothing)
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    qid = ids[len(ids) // 2]
    _, n_all, _ = V.pruned_paths(index_table, [])
    _, zone_kept, _ = V.pruned_paths(
        index_table, [("vec_id", "between", (qid, qid))]  # bloom-blind
    )
    _, bloom_kept, skipped = V.pruned_paths(
        index_table, [("vec_id", "in", [qid])]
    )
    assert zone_kept == n_all  # zone maps prune NOTHING here
    assert bloom_kept <= 2 and skipped >= n_all - 2
    # parity with the in-plan kernel is untouched by the pruning tier
    got = ann_index.search_ivfadc_index(
        spark, index_table, emb, [qid], k=5, nprobe=6, rerank=200
    )
    want = similarity.ivf_pq_topk(emb, [qid], k=5, **LAYOUT)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]


def test_sink_stamps_the_models_it_encoded_with(spark, index_table):
    """The r11 advisor's crash-window hazard: a rebuild that dies between
    the model commits and the main commit leaves NEW model versions in
    the companion logs that the last main commit's pointers do NOT
    reference.  The sink stamps the companion tables' latest versions,
    so it must also ENCODE with those exact versions — stamping new but
    encoding old would make every later decode at that snapshot silently
    wrong."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 2 == 0)
    ann_index.build_ivfadc_index(seed, index_table, **LAYOUT, txn="b1")

    # simulate the crashed rebuild: retrain on the FULL corpus with a
    # different layout and commit ONLY the model tables (no main commit)
    new_cents = similarity.train_kmeans_centroids(emb, n_cells=4, iters=5)
    new_books = similarity.train_pq_codebooks_residual(
        emb, new_cents, 8, 16, 5
    )
    cv = V.commit_write(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(new_cents)],
            "cell int, centroid array<double>",
        ).coalesce(1),
        index_table + "_centroids",
        mode="overwrite",
    )
    bv = V.commit_write(
        spark.createDataFrame(
            [(j, i, c) for j, b in enumerate(new_books) for i, c in enumerate(b)],
            "sub int, code int, vec array<double>",
        ).coalesce(1),
        index_table + "_codebooks",
        mode="overwrite",
    )

    rest = emb.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    ann_index.ivfadc_index_sink(index_table)(rest, 0)

    # the appended commit stamped the NEW model versions...
    head = V._read_entry(index_table, V.latest_version(index_table))
    assert head["meta"] == {"centroid_version": cv, "codebook_version": bv}
    # ...and the codes were encoded under those SAME models: they equal
    # a direct encode with the new pair (cells < 4, codes < 16), not the
    # stale pointer-resolved b1 models
    expect = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in rest.select(
            "vec_id", as_double(F.col("embedding")).alias("v")
        ).mapInPandas(
            similarity.ivfadc_encoder(new_cents, new_books, emit="codes"),
            "vec_id long, cell int, codes array<int>",
        ).collect()
    }
    got = {
        r.vec_id: (r.cell, tuple(r.codes))
        for r in V.read_version(spark, index_table)
        .join(rest.select("vec_id"), "vec_id", "left_semi")
        .collect()
    }
    assert got == expect and max(c for c, _ in got.values()) < 4


def test_rank_cells_numpy_parity(spark, index_table):
    """r11 verdict directive #2: above the documented crossover the
    driver-side cell ranking switches from the exact _dot_lr fold to a
    numpy matmul.  Both paths must produce IDENTICAL nprobe shortlists
    on the fixture geometry — including the tie-break to the lower cell
    id — and the auto dispatch must pick each side of the crossover."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    cents = similarity.train_kmeans_centroids(emb, n_cells=8)
    import math

    cnorms = [math.sqrt(ann_index._dot_lr(c, c)) for c in cents]
    qvecs = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(40).collect()
    ]
    exact = ann_index._rank_cells(qvecs, cents, cnorms, 6, "exact")
    vec = ann_index._rank_cells(qvecs, cents, cnorms, 6, "numpy")
    assert exact == vec and len(exact) == 40

    # EXACT ties (duplicate centroids): both paths break to the lower id
    dup = [cents[0], cents[0], cents[1], cents[0]]
    dnorms = [math.sqrt(ann_index._dot_lr(c, c)) for c in dup]
    e = ann_index._rank_cells(qvecs[:5], dup, dnorms, 3, "exact")
    v = ann_index._rank_cells(qvecs[:5], dup, dnorms, 3, "numpy")
    assert e == v
    for row in e:
        # the three duplicate centroids (cells 0,1,3) tie exactly, so
        # whichever of them appear keep ascending id order
        dups_in_row = [c for c in row if c in (0, 1, 3)]
        assert dups_in_row == sorted(dups_in_row) and 0 in row

    # auto dispatch: fixture-size models stay on the exact fold; past
    # the crossover the matmul takes over (observable via timing would
    # be flaky — instead pin the documented constant and the dispatch
    # arithmetic)
    assert len(qvecs) * len(cents) <= ann_index._RANK_VECTORIZE_CROSSOVER
    big = 1 + ann_index._RANK_VECTORIZE_CROSSOVER // len(qvecs)
    assert len(qvecs) * big > ann_index._RANK_VECTORIZE_CROSSOVER

    # a zero query vector ranks all cells cosine 0.0 -> cells in id order
    z = ann_index._rank_cells([[0.0] * 64], cents, cnorms, 4, "numpy")
    assert z == [[0, 1, 2, 3]]
    assert z == ann_index._rank_cells([[0.0] * 64], cents, cnorms, 4, "exact")


def test_segment_probe_matches_direct_sink_twin_and_recall(
    spark, index_table
):
    """Semantic gates for the registered sim_ivfadc_segment_search row
    (r14 — completing round-13 verdict #6's pair): (a) BATCHING
    INDEPENDENCE — probing an index whose held-out quarter streamed in
    as two sink batches equals, row for row, probing a twin whose
    quarter landed as one direct sink call (both models are frozen at
    build time and every append stamps their version pointers, so
    encode and probe cannot depend on batching); (b) the merged index
    clears the in-plan IVF+PQ recall floor."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = emb.filter(F.col("vec_id") % 4 != 1)
    rest = emb.filter(F.col("vec_id") % 4 == 1).select(
        "vec_id", "embedding"
    )
    qids = list(range(10))

    ann_index.build_ivfadc_index(seed, index_table, **LAYOUT)
    sink = ann_index.ivfadc_index_sink(index_table, "adc-two")
    sink(rest.filter(F.col("vec_id") % 8 == 1), 0)
    sink(rest.filter(F.col("vec_id") % 8 == 5), 1)
    got = [
        tuple(r)
        for r in ann_index.search_ivfadc_index(
            spark, index_table, emb, qids, reproducible=True, **PROBE
        ).collect()
    ]

    twin = tempfile.mkdtemp(prefix="ivfadc_twin_")
    try:
        ann_index.build_ivfadc_index(seed, twin, **LAYOUT)
        ann_index.ivfadc_index_sink(twin, "adc-one")(rest, 0)
        want = [
            tuple(r)
            for r in ann_index.search_ivfadc_index(
                spark, twin, emb, qids, reproducible=True, **PROBE
            ).collect()
        ]
    finally:
        for suffix in ("", "_centroids", "_codebooks"):
            shutil.rmtree(twin + suffix, ignore_errors=True)

    assert got == want and got
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    approx = {(r[0], r[1]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"segment-flow IVFADC recall {recall:.2f} < 0.8"
