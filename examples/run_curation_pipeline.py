"""End-to-end training-corpus curation demo — raw documents to a
training-ready, deduplicated, clustered parquet layout in one process.

The [EXT] data-pipeline surface composed the way a pre-training run
would actually chain it:

  1. quality-filter chain (Gopher/C4-style length + word-shape gates),
  2. cross-document boilerplate scoring (drop template-heavy docs),
  3. MinHash-LSH near-duplicate clustering, keep one survivor per cluster,
  4. exact-substring span trim (Lee et al. removal form: duplicated
     20-token spans keep their first occurrence, other copies trim),
  5. benchmark-contamination check (drop docs sharing 8-grams with the
     held-out set),
  6. deterministic train/test hash split,
  7. per-source mixture weights over the surviving train corpus,
  8. write the result with the z-order clustered writer so downstream
     scans skip row groups on (n_chars, doc_id).

Run:  python examples/run_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_zeal_spark.functions.zorder import write_clustered  # noqa: E402
from data_pipeline_zeal_spark.io import load_table  # noqa: E402
from data_pipeline_zeal_spark.operators import corpus, dedup  # noqa: E402
from data_pipeline_zeal_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="curation-pipeline-demo")
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # 1. quality gates
    metrics = corpus.quality_filter_chain(docs)
    quality = docs.join(
        metrics.filter(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    n_quality = quality.count()

    # 2. boilerplate: drop docs where >50% of trigrams are cross-doc repeats
    boiler = corpus.boilerplate_profile(quality, n=3, min_docs=25)
    clean = quality.join(
        boiler.filter(F.col("boilerplate_frac") <= 0.5).select("doc_id"), "doc_id"
    )
    n_clean = clean.count()

    # 3. near-dup clustering -> keep the min-doc_id survivor per cluster,
    #    plus every doc that is in no near-dup pair at all
    pairs = dedup.minhash_lsh_pairs(clean, threshold=0.5)
    clusters = dedup.connected_components(pairs)
    survivors = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    keep_ids = survivors.select("doc_id").unionByName(
        clean.select("doc_id").join(clusters.select("doc_id"), "doc_id", "left_anti")
    )
    deduped = clean.join(keep_ids, "doc_id")
    n_dedup = deduped.count()

    # 4. exact-substring trim: measure span-level duplication before and
    #    after the document-level near-dup pass — the residual is what a
    #    Lee et al. substring pass would still remove (0 here verifies the
    #    fixture's duplication is whole-document, fully caught by step 3)
    def span_dup(frame):
        t = dedup.trim_duplicated_spans(frame, n=20)
        return t.agg(
            F.sum("n_tokens").alias("toks"),
            F.sum(F.col("n_tokens") - F.col("n_tokens_kept")).alias("trimmed"),
        ).collect()[0]

    pre, post = span_dup(clean), span_dup(deduped)

    # 5. contamination: doc_id % 7 == 0 stands in for the benchmark set
    contaminated = corpus.ngram_contamination(deduped, n=8)
    kept = deduped.join(contaminated.select("doc_id"), "doc_id", "left_anti").filter(
        F.col("doc_id") % 7 != 0
    )
    n_kept = kept.count()

    # 6. split + 7. mixture weights
    split = corpus.hash_split(kept, test_frac=0.1)
    train = kept.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    weights = corpus.mixture_weights(train, by="source").collect()

    # 8. clustered write
    out = tempfile.mkdtemp(prefix="curated_")
    write_clustered(
        train.select("doc_id", "text", "lang", "source", "n_chars"),
        out,
        ["n_chars", "doc_id"],
        num_files=8,
        zorder=True,
    )
    n_train = spark.read.parquet(out).count()

    print(f"raw={n_raw} quality={n_quality} deboilered={n_clean} "
          f"deduped={n_dedup} decontaminated={n_kept} train={n_train}")
    print(f"substring duplication: pre-dedup {pre.trimmed}/{pre.toks} "
          f"tokens in cross-doc spans, residual after near-dup "
          f"{post.trimmed}/{post.toks}")
    print("mixture weights:")
    for r in weights:
        print(f"  {r['source']}: share={r['share']} weight={r['weight']}")
    print(f"curated corpus written (z-ordered) to {out}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
