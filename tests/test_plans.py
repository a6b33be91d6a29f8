"""Structural plan assertions — the performance contract, tested.

These lock in the plan shapes that make the operators scale: predicate
pushdown to parquet, column pruning, broadcast dimension joins, top-k via
TakeOrderedAndProject.
"""

from __future__ import annotations

from data_pipeline_zeal_spark import plans
from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import etl

from tests.conftest import SF_SMALL


def test_q3_pushdown_pruning_broadcast(spark):
    df = etl.shipping_priority(
        load_table(spark, SF_SMALL, "customer"),
        load_table(spark, SF_SMALL, "orders"),
        load_table(spark, SF_SMALL, "lineitem"),
    )
    p = plans.summarize(df)
    pushed = " | ".join(p.pushed_filters)
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed  # filter reached the scan
    assert "l_shipdate" in pushed
    assert p.broadcast_joins >= 1
    assert p.sort_merge_joins == 0  # nothing should fall back at this size
    # column pruning: the lineitem scan must not read unused l_comment-like
    # columns — check one scan reads only the 4 needed lineitem columns
    li = [s for s in p.read_schemas if "l_orderkey" in s]
    assert li and "l_tax" not in li[0] and "l_quantity" not in li[0]
    assert p.has_take_ordered  # top-10 must not be a global sort


def test_q6_scan_only_needed_columns(spark):
    df = etl.revenue_forecast(load_table(spark, SF_SMALL, "lineitem"))
    p = plans.summarize(df)
    assert len(p.read_schemas) == 1
    s = p.read_schemas[0]
    for col in ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]:
        assert col in s
    assert "l_orderkey" not in s  # pruned
    assert p.pushed_filters  # range predicates pushed
    assert p.has_partial_agg  # map-side combine before the exchange


def test_top_orders_single_shuffle(spark):
    df = etl.top_orders_per_customer(load_table(spark, SF_SMALL, "orders"))
    p = plans.summarize(df)
    # one exchange for the window partition; no extra aggregation shuffles
    assert p.shuffles <= 2  # window hash exchange (+ optional AQE read)
