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


if __name__ == "__main__":
    main()
