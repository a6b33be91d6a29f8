"""Bucketed-table layout for co-located (shuffle-free) joins.

At 100 TB the orders↔lineitem join's shuffle dominates; pre-bucketing both
tables on the join key writes each bucket hash-partitioned on disk so the
join plans as a zipped per-bucket SortMergeJoin with NO Exchange on either
side.  This is the standard Spark answer to repeated big-fact joins (the
same idea as the reference's Kafka key-partitioning by user_id, applied to
storage).

Usage::

    write_bucketed(orders_df, "orders_b", "o_orderkey", 64)
    write_bucketed(lineitem_df, "lineitem_b", "l_orderkey", 64)
    joined = bucketed_join(spark, "orders_b", "lineitem_b",
                           "o_orderkey", "l_orderkey")
    # plans.summarize(joined).shuffles == 0

Bucket count guidance: target ~128 MB per bucket per table at the largest
SF; both sides MUST use the same count for co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist a DataFrame as a bucketed (and bucket-sorted) catalog table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys.  With
    bucketing aligned, Catalyst satisfies the join's distribution
    requirement from the table layout — zero exchanges."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)
