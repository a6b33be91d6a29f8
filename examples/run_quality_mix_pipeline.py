"""Quality-scoring → source-fair filtering → epoch-planning demo — the
round-5 curation surface composed as a data-mixing run would chain it:

  1. readability + compression-ratio signals per document,
  2. corpus-LM quality calibrated WITHIN each source
     (``text.source_fair_quality`` — a global threshold deletes whole
     domains; the per-source percentile keeps each source's best X%),
  3. filter: keep the top 70% of every source, drop the
     compression-ratio tails (templated junk below, noise above),
  4. temperature epoch plan over the survivors: per-source token budget
     and repetition factors for a fixed training-token target,
  5. embedding two-stage retrieval spot-check (``matryoshka_topk``) so
     the mixed corpus ships with a working similarity probe.

Run:  python examples/run_quality_mix_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_zeal_spark.io import load_table  # noqa: E402
from data_pipeline_zeal_spark.operators import corpus, similarity, text  # noqa: E402
from data_pipeline_zeal_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="quality-mix-demo")
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. per-document quality signals (all map-only or one-shuffle)
    readable = text.readability(docs).select("doc_id", "fk_grade")
    compress = text.compression_ratio(docs).select(
        "doc_id", "compression_ratio"
    )

    # 2. source-fair LM quality: percentile WITHIN each source
    fair = text.source_fair_quality(docs)

    # 3. the filter: best 70% per source, compression tails cut
    keep = (
        fair.join(compress, "doc_id")
        .filter(
            (F.col("source_pct") <= 0.70)
            & F.col("compression_ratio").between(0.05, 0.95)
        )
        .select("doc_id", "source")
    )
    survivors = docs.join(keep.select("doc_id"), "doc_id")
    n_kept = survivors.count()
    print(f"quality mix: {n_raw} raw -> {n_kept} kept "
          f"({100 * n_kept / n_raw:.1f}%)")

    # readability profile of what survived (audit output)
    profile = (
        survivors.join(readable, "doc_id")
        .groupBy("source")
        .agg(F.round(F.avg("fk_grade"), 2).alias("avg_fk_grade"),
             F.count(F.lit(1)).alias("docs"))
        .orderBy("source")
    )
    profile.show(5, truncate=False)

    # 4. epoch plan for a 2M-token run over the survivors
    plan = corpus.epoch_plan(survivors, target_tokens=2_000_000)
    for r in plan.collect()[:8]:
        print(f"  {r[0]}: available={r.available_tokens} "
              f"share={r.token_share} epochs={r.epochs}")

    # 5. similarity probe over the embedding table (two-stage, exact-checked)
    emb = load_table(spark, sf_dir, "embeddings")
    topk = similarity.matryoshka_topk(emb, query_ids=[0, 1, 2], k=5)
    print("matryoshka probe (3 queries x top-5):", topk.count(), "rows")

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
