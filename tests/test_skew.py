"""Salted two-phase aggregation equals the direct groupBy (skewed input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.functions.skew import salted_aggregate


def test_salted_aggregate_matches_direct(spark):
    # heavily skewed: 90% of rows share one key
    df = spark.range(20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), F.col("id") % 7)
        ).alias("key"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    got = {
        tuple(r)
        for r in salted_aggregate(
            df,
            keys=["key"],
            aggs={"n": "count(*)", "s": "sum(v)", "mx": "max(v)"},
            salt=8,
        ).collect()
    }
    want = {
        tuple(r)
        for r in df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salted_aggregate_rejects_nonmergeable(spark):
    import pytest

    df = spark.range(10).select(F.lit("k").alias("key"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        salted_aggregate(df, ["key"], {"a": "avg(v)"})
