"""Capture .explain('formatted') for the round-14-touched queries.

Usage: python tools/capture_plans_r14.py <repo_root> <suffix> [out_dir]

Runs against the registry in <repo_root> (so a pre-optimization worktree
captures the 'before' plans) and writes plans/r14/<name>_<suffix>.txt.
Registered queries whose functions return an eagerly-materialized local
frame (the persisted-index probes) would show only LocalTableScan, so for
those the INTERNAL probe frame is rebuilt through the operator API and
explained instead — the plan the timed work actually runs.
"""

from __future__ import annotations

import io
import os
import shutil
import sys
import tempfile
from contextlib import redirect_stdout

REPO = sys.argv[1]
SUFFIX = sys.argv[2]
OUT = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/plans/r14"
SF = "/root/testdata/sf0.001"

sys.path.insert(0, REPO)

PLAIN = [
    "text_bm25_topk",
    "retrieval_pipeline",
    "retrieval_quality",
    "retrieval_hard_negatives",
    "retrieval_hybrid_rrf",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_filtered_topk",
    "sim_knn_label",
    "sim_matryoshka_topk",
    "sim_pq_topk",
    "sim_ivf_pq_topk",
    "sim_ivf_topk",
    "train_kmeans_distributed",
    "train_pq_distributed",
    "train_classifier_distributed",
    "corpus_decontaminate_fuzzy",
    "text_bpe_train_merges",
    "text_quality_classifier",
]


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def write(name: str, text: str) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(text)
    print("wrote", name)


def main() -> None:
    import __spark_entry__ as em
    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.session import get_spark

    spark = get_spark(app_name=f"plans-r14-{SUFFIX}", shuffle_partitions=8)
    Q = em.queries()
    for name in PLAIN:
        spark.catalog.clearCache()
        try:
            write(name, explain_str(Q[name](spark, SF)))
        except Exception as e:  # noqa: BLE001
            write(name, f"CAPTURE FAILED: {e}")

    # internal probe frames of the persisted indexes
    from data_pipeline_zeal_spark.operators import ann_index, retrieval

    emb = load_table(spark, SF, "embeddings")
    docs = load_table(spark, SF, "documents")
    qids = [r.vec_id for r in emb.limit(5).collect()]

    t = tempfile.mkdtemp(prefix="plan_ivf_")
    try:
        ann_index.build_ivf_index(emb, t, n_cells=8)
        out = ann_index.search_ivf_index(spark, t, qids, k=10, nprobe=5)
        write("search_ivf_index_probe", explain_str(out))
    finally:
        for sfx in ("", "_centroids"):
            shutil.rmtree(t + sfx, ignore_errors=True)

    t = tempfile.mkdtemp(prefix="plan_adc_")
    try:
        ann_index.build_ivfadc_index(emb, t, n_cells=8, m=8, n_codes=32)
        out = ann_index.search_ivfadc_index(
            spark, t, emb, qids, k=10, nprobe=6, rerank=200
        )
        write("search_ivfadc_index_probe", explain_str(out))
    finally:
        for sfx in ("", "_centroids", "_codebooks"):
            shutil.rmtree(t + sfx, ignore_errors=True)

    t = tempfile.mkdtemp(prefix="plan_bm25_")
    try:
        retrieval.build_bm25_index(docs, t, n_buckets=16)
        out = retrieval.search_bm25_index(
            spark, t, retrieval.corpus_queries(docs), k=10
        )
        write("search_bm25_index_probe", explain_str(out))
    finally:
        for sfx in ("", "_df", "_stats", "_manifest"):
            shutil.rmtree(t + sfx, ignore_errors=True)

    # the local-relation pathology itself: an 8-row model frame
    try:
        from data_pipeline_zeal_spark.io import local_frame

        frame = local_frame(
            spark,
            [(i, [0.1] * 8) for i in range(8)],
            "cell int, centroid array<double>",
        )
    except ImportError:
        frame = spark.createDataFrame(
            [(i, [0.1] * 8) for i in range(8)],
            "cell int, centroid array<double>",
        )
    write("model_local_relation", explain_str(frame.coalesce(1)))
    spark.stop()


if __name__ == "__main__":
    main()
