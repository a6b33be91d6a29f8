"""Bucketed co-located join: the orders↔lineitem join plans with zero
exchanges when both sides are bucketed on the join key."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_zeal_spark import plans
from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.sources.bucketing import bucketed_join, write_bucketed

from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", 8)
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8)
    # at fixture scale the planner would broadcast (and rightly so); force
    # the SMJ path to demonstrate the at-scale co-located plan
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey"
        ).select("o_orderkey", "l_linenumber", "o_totalprice", "l_extendedprice")

        # correctness: same row count as the plain join
        plain = orders.join(
            lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
        )
        assert joined.count() == plain.count()

        # the whole point: no exchange on either side
        p = plans.summarize(joined)
        assert p.shuffles == 0
        assert p.sort_merge_joins == 1

        # and aggregation on the bucket key also avoids a shuffle
        agg = (
            spark.table("lineitem_b")
            .groupBy("l_orderkey")
            .agg(F.sum("l_extendedprice").alias("s"))
        )
        assert plans.summarize(agg).shuffles == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
