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


def test_key_skew_profile_closed_form(spark):
    """Hand-built frame: type 'u' has 4 keys x 2 rows (uniform -> evenness
    1.0, top1_share 0.25); type 's' has one key with 7 rows and one with 1
    (top1_share 7/8, evenness = the Shannon closed form); type 'o' has a
    single key (evenness pinned to 0.0 by the guard)."""
    import math

    from data_pipeline_zeal_spark.operators.events_ext import (
        key_skew_profile,
    )

    rows = (
        [("u", k) for k in (1, 2, 3, 4) for _ in range(2)]
        + [("s", 10)] * 7
        + [("s", 11)]
        + [("o", 20)] * 3
    )
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    got = {
        r["event_type"]: r
        for r in key_skew_profile(df, key="user_id").collect()
    }

    u = got["u"]
    assert (u["n_keys"], u["n_rows"], u["max_count"]) == (4, 8, 2)
    assert u["top1_share"] == 0.25
    assert u["evenness"] == 1.0
    assert u["p50_count"] == 2.0 and u["p99_count"] == 2.0

    s = got["s"]
    assert (s["n_keys"], s["n_rows"], s["max_count"]) == (2, 8, 7)
    assert s["top1_share"] == round(7 / 8, 4)
    h = -(7 / 8 * math.log2(7 / 8) + 1 / 8 * math.log2(1 / 8))
    assert s["evenness"] == round(h / math.log2(2), 4)

    o = got["o"]
    assert (o["n_keys"], o["max_count"]) == (1, 3)
    assert o["evenness"] == 0.0 and o["top1_share"] == 1.0
