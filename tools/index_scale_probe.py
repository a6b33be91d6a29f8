"""Measured scaling probe for the persisted indexes (r10): how the
number of parquet FILES a probe must open grows with probe width, and
what a probe costs end-to-end vs the in-plan kernels that rescan the
corpus per batch.

Builds both indexes over the fixture at $SPARK_GRAFT_SF_DIR (default
sf0.1), then:

* IVF: for nprobe in {1, 2, 4, 8} — files kept/skipped by the cell
  predicate, and the wall-clock of a 10-query probe vs `ivf_topk`
  (which re-trains + re-assigns per call).
* BM25: for probe vocabularies of one query / five queries / the full
  corpus-derived query set — files kept/skipped by the bucket
  predicate, and probe wall-clock vs `bm25_search`.

Prints one JSON line per measurement; paste the summary into SCALE.md
when the numbers change.  Metadata pruning counts are exact
(log-replay only); timings are single-run (see SCALE.md bench-variance
note — run twice and keep the second if precision matters).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators import ann_index, retrieval
    from data_pipeline_zeal_spark.session import get_spark
    from data_pipeline_zeal_spark.sources import versioned as V

    spark = get_spark(app_name="index-scale-probe")
    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")
    emb.count(), docs.count()  # warm fixture scans

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    ivf_t = tempfile.mkdtemp(prefix="probe_ivf_")
    bm_t = tempfile.mkdtemp(prefix="probe_bm25_")
    try:
        t0 = time.perf_counter()
        ann_index.build_ivf_index(emb, ivf_t, n_cells=8)
        print(json.dumps({"op": "ivf_build", "sec": round(time.perf_counter() - t0, 2)}))
        qids = [r.vec_id for r in emb.limit(400).collect() if r.vec_id % 31 == 0][:10]
        for nprobe in (1, 2, 4, 8):
            # worst-case file count: union of every query's probe cells
            out = ann_index.search_ivf_index(spark, ivf_t, qids, k=10, nprobe=nprobe)
            t0 = time.perf_counter()
            force(out)
            sec = round(time.perf_counter() - t0, 2)
            _, kept, skipped = V.pruned_paths(
                ivf_t, [("cell", "in", list(range(nprobe)))]
            )
            print(json.dumps({
                "op": "ivf_probe", "nprobe": nprobe, "sec": sec,
                "files_kept_cellsubset": kept, "files_skipped": skipped,
            }))
        t0 = time.perf_counter()
        force(similarity_ivf(emb, qids))
        print(json.dumps({"op": "ivf_topk_inplan", "sec": round(time.perf_counter() - t0, 2)}))

        t0 = time.perf_counter()
        retrieval.build_bm25_index(docs, bm_t, n_buckets=16)
        print(json.dumps({"op": "bm25_build", "sec": round(time.perf_counter() - t0, 2)}))
        full_q = retrieval.corpus_queries(docs)
        one_q = full_q.filter(F.col("query_id") == 0)
        five_q = full_q.filter(F.col("query_id") % 155 == 0)
        for label, q in (("one", one_q), ("five", five_q), ("all", full_q)):
            bks = sorted(
                r.b for r in q.select(
                    F.pmod(F.xxhash64("token"), F.lit(16)).cast("int").alias("b")
                ).distinct().collect()
            )
            _, kept, skipped = V.pruned_paths(bm_t, [("bucket", "in", bks)])
            out = retrieval.search_bm25_index(spark, bm_t, q, k=10)
            t0 = time.perf_counter()
            force(out)
            print(json.dumps({
                "op": "bm25_probe", "queries": label, "n_buckets_hit": len(bks),
                "sec": round(time.perf_counter() - t0, 2),
                "files_kept": kept, "files_skipped": skipped,
            }))
        t0 = time.perf_counter()
        force(retrieval.bm25_search(docs, full_q, k=10))
        print(json.dumps({"op": "bm25_inplan", "sec": round(time.perf_counter() - t0, 2)}))
    finally:
        for p in (ivf_t, ivf_t + "_centroids", bm_t, bm_t + "_df", bm_t + "_stats"):
            shutil.rmtree(p, ignore_errors=True)
        spark.stop()


def similarity_ivf(emb, qids):
    from data_pipeline_zeal_spark.operators import similarity

    return similarity.ivf_topk(emb, qids, k=10, n_cells=8, nprobe=5)




def quality() -> None:
    """Measured QUALITY curves at a 10x fixture (r13, round-12 verdict
    directive #5): recall@10 vs nprobe for the persisted IVF and IVFADC
    probes against the exact brute-force answer, and posting-file
    pruning ratio vs query-vocabulary size for the BM25 probe.  The
    pytest recall gates pin a floor at the registered layout; these
    curves show the SHAPE of the knob an operator tunes at 100 TB.

    The 10x corpus is deterministic: ten copies of the fixture
    embeddings, each perturbed by a copy-indexed sinusoid (changes
    cosine geometry, no RNG — reproducible run to run), vec_ids offset
    per copy; documents duplicated with offset doc_ids for the BM25
    file-count measurement (pruning ratio depends on layout, not text
    novelty)."""
    import math

    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators import ann_index, retrieval, similarity
    from data_pipeline_zeal_spark.session import get_spark
    from data_pipeline_zeal_spark.sources import versioned as V

    spark = get_spark(app_name="index-quality-probe")
    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")

    def perturbed(c: int):
        # helper fixes the loop variable per copy (closure late binding)
        return emb.select(
            (F.col("vec_id") + 100_000 * c).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: x + 0.15 * F.sin(F.col("vec_id") * (c + 1)),
            ).alias("embedding"),
        )

    copies = [perturbed(c) for c in range(10)]
    emb10 = copies[0]
    for c in copies[1:]:
        emb10 = emb10.unionByName(c)
    emb10 = emb10.localCheckpoint()  # freeze: trainers must see one corpus
    n10 = emb10.count()
    n_cells = 64
    qids = [r.vec_id for r in emb10.limit(4000).collect()
            if r.vec_id % 97 == 0][:20]
    exact: dict[int, set] = {q: set() for q in qids}
    for r in similarity.cosine_topk(emb10, qids, k=10).collect():
        exact[r.query_id].add(r.vec_id)
    print(json.dumps({"op": "quality_fixture", "n_vectors": n10,
                      "n_cells": n_cells, "n_queries": len(qids)}))

    ivf_t = tempfile.mkdtemp(prefix="qual_ivf_")
    adc_t = tempfile.mkdtemp(prefix="qual_adc_")
    bm_t = tempfile.mkdtemp(prefix="qual_bm25_")
    try:
        t0 = time.perf_counter()
        ann_index.build_ivf_index(emb10, ivf_t, n_cells=n_cells)
        print(json.dumps({"op": "ivf_build_10x",
                          "sec": round(time.perf_counter() - t0, 2)}))
        for nprobe in (1, 2, 4, 8, 16, 32, 64):
            t0 = time.perf_counter()
            got = ann_index.search_ivf_index(
                spark, ivf_t, qids, k=10, nprobe=nprobe
            ).collect()
            sec = round(time.perf_counter() - t0, 2)
            hit = sum(
                1 for r in got if r.vec_id in exact[r.query_id]
            )
            print(json.dumps({
                "op": "ivf_recall", "nprobe": nprobe,
                "recall_at_10": round(hit / (10 * len(qids)), 3),
                "probed_fraction": round(nprobe / n_cells, 3),
                "sec": sec,
            }))

        t0 = time.perf_counter()
        ann_index.build_ivfadc_index(
            emb10, adc_t, n_cells=n_cells, m=8, n_codes=32
        )
        print(json.dumps({"op": "ivfadc_build_10x",
                          "sec": round(time.perf_counter() - t0, 2)}))
        for nprobe in (1, 2, 4, 8, 16, 32, 64):
            t0 = time.perf_counter()
            got = ann_index.search_ivfadc_index(
                spark, adc_t, emb10, qids, k=10, nprobe=nprobe, rerank=200
            ).collect()
            sec = round(time.perf_counter() - t0, 2)
            hit = sum(1 for r in got if r.vec_id in exact[r.query_id])
            print(json.dumps({
                "op": "ivfadc_recall", "nprobe": nprobe,
                "recall_at_10": round(hit / (10 * len(qids)), 3),
                "sec": sec,
            }))
        # the recall CEILING knob: the ADC shortlist misses true
        # neighbors the exact rerank never sees — deepening rerank at
        # full probe width measures how much of the plateau it recovers
        for rerank in (20, 50, 100, 200, 400, 800):
            t0 = time.perf_counter()
            got = ann_index.search_ivfadc_index(
                spark, adc_t, emb10, qids, k=10, nprobe=64, rerank=rerank
            ).collect()
            sec = round(time.perf_counter() - t0, 2)
            hit = sum(1 for r in got if r.vec_id in exact[r.query_id])
            print(json.dumps({
                "op": "ivfadc_rerank_curve", "rerank": rerank,
                "recall_at_10": round(hit / (10 * len(qids)), 3),
                "sec": sec,
            }))

        docs10 = docs.select(
            (F.col("doc_id")).alias("doc_id"), "text"
        )
        for c in range(1, 10):
            docs10 = docs10.unionByName(
                docs.select(
                    (F.col("doc_id") + 1_000_000 * c).alias("doc_id"),
                    "text",
                )
            )
        n_buckets = 64
        t0 = time.perf_counter()
        retrieval.build_bm25_index(docs10, bm_t, n_buckets=n_buckets)
        print(json.dumps({"op": "bm25_build_10x", "n_buckets": n_buckets,
                          "sec": round(time.perf_counter() - t0, 2)}))
        # vocabulary axis: a PREFIX of the corpus vocabulary (sorted for
        # determinism) — one fixture query already carries ~30 distinct
        # tokens, so sweeping query COUNT barely moves the vocab; the
        # knob that moves file pruning is distinct probe tokens
        full_q = retrieval.corpus_queries(docs)
        vocab_all = sorted(
            r.token for r in full_q.select("token").distinct().collect()
        )
        for n_tok in (1, 2, 4, 8, 16, 32, 64, len(vocab_all)):
            toks = vocab_all[:n_tok]
            q = spark.createDataFrame(
                [(0, t) for t in toks], "query_id long, token string"
            )
            bks = sorted(
                r.b for r in q.select(
                    F.pmod(F.xxhash64("token"), F.lit(n_buckets))
                    .cast("int").alias("b")
                ).distinct().collect()
            )
            _, kept, skipped = V.pruned_paths(
                bm_t, [("bucket", "in", bks)]
            )
            print(json.dumps({
                "op": "bm25_prune_curve", "vocab_tokens": len(toks),
                "buckets_hit": len(bks),
                "files_kept": kept, "files_skipped": skipped,
                "kept_ratio": round(kept / max(1, kept + skipped), 3),
            }))
    finally:
        for p in (ivf_t, ivf_t + "_centroids", adc_t, adc_t + "_centroids",
                  adc_t + "_codebooks", bm_t, bm_t + "_df", bm_t + "_stats",
                  bm_t + "_manifest"):
            shutil.rmtree(p, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "quality":
        quality()
    else:
        main()
