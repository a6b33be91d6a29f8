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


def test_salted_count_col_skips_nulls(spark):
    """count(col) must keep SQL null-skipping semantics through the salted
    partial phase (round-1 advisory: it silently became count(*))."""
    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("key"),
        F.when(F.col("id") % 5 != 0, F.col("id").cast("double")).alias("v"),
    )
    got = {
        tuple(r)
        for r in salted_aggregate(
            df, ["key"], {"n_rows": "count(*)", "n_v": "count(v)"}, salt=4
        ).collect()
    }
    want = {
        tuple(r)
        for r in df.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.count("v").alias("n_v"))
        .collect()
    }
    assert got == want
    # and the two counts genuinely differ (nulls present)
    assert any(r[1] != r[2] for r in got)


def test_salted_aggregate_rejects_nonmergeable(spark):
    import pytest

    df = spark.range(10).select(F.lit("k").alias("key"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        salted_aggregate(df, ["key"], {"a": "avg(v)"})
