"""Measure the substring-dedup prefilter law across fixture scales.

The `dedup_substring_spans` scale claim: the hash prefilter bounds the
expensive exact-text confirm join to the DUPLICATED instance trickle, so
the wide-text exchange grows with the duplication volume, not the corpus.
This probe makes the claim a measured table (the IVFADC cell-growth-law
recipe): per scale factor, total window instances, distinct window
hashes, duplicated hashes, the suspect instances that survive the
prefilter (= the confirm join's probe side), and the confirmed
non-canonical removals.

Run:  python tools/substring_scale_probe.py   (paste the table into SCALE.md)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_zeal_spark.functions.textfn import tokens  # noqa: E402
from data_pipeline_zeal_spark.io import load_table, with_min_parallelism  # noqa: E402
from data_pipeline_zeal_spark.operators import dedup  # noqa: E402
from data_pipeline_zeal_spark.session import get_spark  # noqa: E402

N = 20


def main() -> None:
    spark = get_spark(app_name="substring-scale-probe")
    print("| sf | windows | distinct | dup hashes | suspects (confirm probe) "
          "| suspect frac | removals | op sec |")
    print("|---|---|---|---|---|---|---|---|")
    for sf in ("0.001", "0.01", "0.1"):
        docs = load_table(spark, f"/root/testdata/sf{sf}", "documents")
        base = with_min_parallelism(docs).select(
            "doc_id", tokens("text").alias("tok")
        )
        win = F.when(
            F.size("tok") >= N,
            F.transform(
                F.sequence(F.lit(1), F.size("tok") - (N - 1)),
                lambda i: F.xxhash64(
                    F.concat_ws(" ", F.slice(F.col("tok"), i, N))
                ),
            ),
        ).otherwise(F.array().cast("array<long>"))
        spans = base.select("doc_id", F.explode(win).alias("wh"))
        counts = spans.groupBy("wh").agg(F.count(F.lit(1)).alias("n"))
        row = counts.agg(
            F.sum("n").alias("windows"),
            F.count(F.lit(1)).alias("distinct"),
            F.sum((F.col("n") >= 2).cast("int")).alias("dup_hashes"),
            F.sum(F.when(F.col("n") >= 2, F.col("n"))).alias("suspects"),
        ).collect()[0]
        t0 = time.perf_counter()
        removals = (
            dedup.trim_duplicated_spans(docs, n=N)
            .agg(F.sum("n_spans_trimmed").alias("r"))
            .collect()[0]
            .r
        )
        sec = time.perf_counter() - t0
        frac = (row.suspects or 0) / row.windows
        print(
            f"| {sf} | {row.windows} | {row.distinct} | {row.dup_hashes} | "
            f"{row.suspects or 0} | {frac:.4f} | {removals} | {sec:.2f} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
