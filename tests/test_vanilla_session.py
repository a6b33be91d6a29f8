"""Regression guard for the round-1 driver failure.

The verify harness builds a *vanilla* ``SparkSession`` (not our tuned
``get_spark``), so every conf correctness depends on must be (re)applied at
runtime inside ``io.load_table`` itself.  Round 1 shipped the nanos-parquet
conf only in the session factory and all 16 events-backed queries died with
``PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS))``.

We can't build a second JVM-fresh session inside pytest, so we simulate the
vanilla condition by actively *unsetting / flipping* the confs on the live
session and asserting ``load_table`` still reads events correctly.
"""

from __future__ import annotations

from pyspark.sql import types as T

from data_pipeline_zeal_spark.io import load_table

SF_SMALL = "/root/testdata/sf0.001"


def test_load_table_self_heals_read_confs(spark):
    before_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # Simulate the driver's vanilla session: conf absent/false + non-UTC
        # tz + NTZ inference on (Spark 4 default — the round-3 regression:
        # micros-precision naive parquet loaded as TIMESTAMP_NTZ, which
        # rejects epoch arithmetic everywhere).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")

        df = load_table(spark, SF_SMALL, "events")
        # must be the tz-aware type, NOT TimestampNTZType (they are
        # distinct classes; NTZ would fail every cast-to-epoch expression)
        assert type(df.schema["ts"].dataType) is T.TimestampType
        assert df.count() > 0
        # and epoch arithmetic must actually work on the loaded column
        assert df.selectExpr("cast(ts as double) d").first().d > 0
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert (
            spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
            == "false"
        )
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", before_tz)


def test_load_table_all_fixture_tables_readable(spark):
    for name in ("events", "orders", "lineitem", "documents", "embeddings"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        df = load_table(spark, SF_SMALL, name)
        assert df.count() > 0, name
