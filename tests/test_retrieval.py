"""Closed-form pins for the sparse-retrieval stack (BM25, graded metrics,
containment decontamination) on hand-computable fixtures, plus plan-shape
checks (the posting join must stay equi-join/broadcast only).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_pipeline_zeal_spark import plans
from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import corpus, retrieval

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_closed_form(spark):
    """Three-doc corpus, one single-term query: score must equal the
    hand-evaluated Lucene-idf BM25 formula."""
    docs = _docs(
        spark,
        [
            (1, "apple banana apple"),       # tf(apple)=2, len 3
            (2, "apple cherry"),             # tf(apple)=1, len 2
            (3, "banana cherry date fig"),   # no apple, len 4
        ],
    )
    queries = spark.createDataFrame([(99, "apple")], "query_id long, token string")
    got = {
        r.doc_id: (r.score, r.rank)
        for r in retrieval.bm25_search(
            docs, queries, k=10, exclude_self=False
        ).collect()
    }
    n, df = 3.0, 2.0
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    avgdl = 3.0
    def bm25(tf, dl):
        return round(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6)
    assert got == {
        1: (bm25(2, 3), 1),
        2: (bm25(1, 2), 2),
    }
    assert got[1][0] > got[2][0]  # higher tf wins at comparable length


def test_bm25_excludes_self_and_respects_k(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    run = retrieval.bm25_search(docs, retrieval.corpus_queries(docs), k=5)
    rows = run.collect()
    assert all(r.doc_id != r.query_id for r in rows)
    assert all(1 <= r.rank <= 5 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())


def test_retrieval_metrics_closed_form(spark):
    """Hand-built run/qrels: query 1 has rel-2 at rank 1 and rel-1 at
    rank 3 of 4 relevant total; query 2 retrieves nothing relevant."""
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 10, 1)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1), (1, 13, 1), (1, 14, 1), (2, 99, 1)],
        "query_id long, doc_id long, rel int",
    )
    got = {r.query_id: r for r in retrieval.retrieval_metrics(run, qrels, k=10).collect()}
    q1 = got[1]
    assert q1.n_rel == 4
    assert q1.mrr == 1.0
    assert q1.precision_at_k == 0.2  # 2 hits / k=10
    assert q1.recall_at_k == 0.5    # 2 of 4
    dcg = 2 / math.log2(2) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4) + 1 / math.log2(5)
    assert abs(q1.ndcg_at_k - round(dcg / idcg, 6)) < 1e-9
    q2 = got[2]
    assert (q2.mrr, q2.precision_at_k, q2.recall_at_k, q2.ndcg_at_k) == (
        0.0,
        0.0,
        0.0,
        0.0,
    )


def test_containment_catches_embedded_benchmark(spark):
    """A benchmark doc embedded verbatim inside a much larger training doc
    must score containment 1.0 even though Jaccard is tiny — the exact
    case motivating containment over Jaccard."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    filler = " ".join(f"w{i}" for i in range(200))
    docs = _docs(
        spark,
        [
            (7, bench_text),                       # 7 % 7 == 0 -> benchmark
            (1, filler + " " + bench_text),        # embeds it
            (2, filler),                           # unrelated
        ],
    )
    rows = corpus.ngram_containment(
        docs, n=8, benchmark_mod=7, threshold=0.5
    ).collect()
    assert [(r.doc_id, r.bench_id, r.containment) for r in rows] == [(1, 7, 1.0)]


def test_bm25_plan_is_hash_joins_only(spark):
    # retrieval_pipeline persists the shared run; a cached subtree from
    # an earlier test renders its child plan inside InMemoryRelation and
    # skews operator counts — plan-shape checks run on a clean cache
    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMALL, "documents")
    df = retrieval.bm25_search(docs, retrieval.corpus_queries(docs), k=10)
    simple = plans.explain_mode(df, "simple")
    assert "CartesianProduct" not in simple
    # the only nested-loop is the 1-row stats scalar broadcast
    assert simple.count("BroadcastNestedLoopJoin") <= 1


def test_qrels_join_is_equi(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    df = retrieval.lang_source_qrels(docs)
    simple = plans.explain_mode(df, "simple")
    assert "BroadcastNestedLoopJoin" not in simple
    assert "CartesianProduct" not in simple


def test_hard_negatives_closed_form(spark):
    """Relevant docs are excluded; the rest re-rank densely by run rank."""
    run = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 12, 1)], "query_id long, doc_id long, rel int"
    )
    rows = retrieval.hard_negatives(run, qrels, k=10, per_query=5).collect()
    assert [(r.doc_id, r.rank, r.neg_rank) for r in rows] == [
        (11, 2, 1),
        (13, 4, 2),
    ]


def test_bcubed_identity_and_split(spark):
    """Identical clusterings score 1.0 everywhere; splitting one true
    cluster of 4 into two predicted pairs keeps precision 1 and drops
    per-element recall to 0.5 for those elements."""
    from data_pipeline_zeal_spark.operators import dedup

    truth = spark.createDataFrame(
        [(i, 0) for i in range(4)] + [(9, 9)], "doc_id long, cluster_id long"
    )
    [ident] = dedup.bcubed(truth, truth).collect()
    assert (
        ident.bcubed_precision,
        ident.bcubed_recall,
        ident.bcubed_f1,
    ) == (1.0, 1.0, 1.0)

    pred = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 2), (9, 9)], "doc_id long, cluster_id long"
    )
    [split] = dedup.bcubed(pred, truth).collect()
    assert split.n_elements == 5
    assert split.bcubed_precision == 1.0
    # four elements at recall 2/4, the singleton at 1 -> (4*0.5 + 1)/5
    assert split.bcubed_recall == 0.6
    assert split.bcubed_f1 == round(2 * 1.0 * 0.6 / 1.6, 6)


def test_pipeline_cache_release(spark):
    """Round-7 advice: the caller-owned persisted BM25 run must be
    releasable after materialization, and release must be idempotent."""
    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators import retrieval

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = retrieval.retrieval_pipeline(docs, k=5, per_query=3)
    rows = out.collect()
    assert rows  # materialized while the run cache is alive
    run = out._zeal_persisted_run
    assert run is not None and run.is_cached
    assert retrieval.release_pipeline_cache(out) is True
    assert not run.is_cached
    assert retrieval.release_pipeline_cache(out) is False  # idempotent


def test_hybrid_rrf_matches_python_recomputation(spark):
    """Fuse the two standalone runs in plain Python and demand exact
    agreement: membership, both per-run ranks, the 6-dp fused score, and
    the fused ordering (score desc, doc_id asc)."""
    from data_pipeline_zeal_spark.operators import similarity

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    bm = retrieval.bm25_search(docs, retrieval.corpus_queries(docs), k=10)
    bm_rank = {(r.query_id, r.doc_id): r.rank for r in bm.collect()}
    qids = [r.vec_id for r in emb.filter("vec_id % 31 = 0").collect()]
    vec = similarity.cosine_topk(emb, qids, k=10)
    vec_rank = {(r.query_id, r.vec_id): r.rank for r in vec.collect()}

    want = {}
    for (q, d), r in bm_rank.items():
        want.setdefault((q, d), [0, 0])[0] = r
    for (q, d), r in vec_rank.items():
        want.setdefault((q, d), [0, 0])[1] = r
    scored = {
        k: round(
            (1.0 / (60 + v[0]) if v[0] else 0.0)
            + (1.0 / (60 + v[1]) if v[1] else 0.0),
            6,
        )
        for k, v in want.items()
    }
    by_q: dict = {}
    for (q, d), s in scored.items():
        by_q.setdefault(q, []).append((-s, d))
    expect = {}
    for q, lst in by_q.items():
        for i, (negs, d) in enumerate(sorted(lst)[:10], 1):
            expect[(q, d)] = (want[(q, d)][0], want[(q, d)][1], -negs, i)

    got = {
        (r.query_id, r.doc_id): (r.bm25_rank, r.vec_rank, r.rrf_score, r.rank)
        for r in retrieval.hybrid_rrf_topk(docs, emb, k=10).collect()
    }
    assert got == expect


def test_hybrid_rrf_both_runs_beat_single_run_at_same_rank(spark):
    """RRF law: a candidate retrieved at rank r by BOTH runs must outscore
    one retrieved at rank r by only one run."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = retrieval.hybrid_rrf_topk(docs, emb, k=10).collect()
    both = [r for r in rows if r.bm25_rank and r.vec_rank]
    single = [r for r in rows if bool(r.bm25_rank) != bool(r.vec_rank)]
    assert both and single  # the fixture exercises both shapes
    for b in both:
        base = min(b.bm25_rank, b.vec_rank)
        for s in single:
            if max(s.bm25_rank, s.vec_rank) >= base:
                assert b.rrf_score > s.rrf_score
