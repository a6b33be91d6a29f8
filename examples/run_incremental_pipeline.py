"""Incremental table-maintenance demo — the lakehouse loop the CDC /
temporal operators implement, chained the way a nightly pipeline would:

  1. build "yesterday's" snapshot of orders and a changed "today" view,
  2. diff them into a minimal insert/update/delete feed (`table_diff`),
  3. ship the feed and rebuild today's snapshot on the consumer side
     (`apply_diff`) — verified equal,
  4. fold the feed into an SCD2 history (`scd2_intervals`) and answer a
     point-in-time question against it (`scd2_point_in_time_join`),
  5. admit only novel documents from an incoming batch against the
     standing corpus (`incremental_dedup`),
  6. maintain the hourly rollup incrementally — only the windows the new
     batch touched are recomputed (`hourly.incremental_update`),
  7. audit the rebuilt table with the DQ checks AND a column-profile
     drift report (`quality.profile_drift`) before publishing.

Run:  python examples/run_incremental_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_zeal_spark.io import load_table  # noqa: E402
from data_pipeline_zeal_spark.operators import cdc, dedup, hourly  # noqa: E402
from data_pipeline_zeal_spark.operators import quality as dq  # noqa: E402
from data_pipeline_zeal_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app_name="incremental-pipeline-demo")

    # 1. two snapshots of the same table
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    yesterday = orders.filter(F.col("o_orderkey") % 5 != 0)
    today = orders.filter(F.col("o_orderkey") % 7 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )

    # 2. minimal change feed
    feed = cdc.table_diff(yesterday, today, keys=["o_orderkey"])
    by_kind = {r.change: r.n for r in feed.groupBy("change").count()
               .withColumnRenamed("count", "n").collect()}
    print(f"change feed: {by_kind}")

    # 3. consumer-side rebuild, verified
    rebuilt = cdc.apply_diff(yesterday, feed, keys=["o_orderkey"])
    assert rebuilt.count() == today.count()
    assert rebuilt.exceptAll(today).count() == 0
    print(f"rebuild verified: {rebuilt.count()} rows match today's snapshot")

    # 4. SCD2 history + a point-in-time probe over events
    events = load_table(spark, SF_DIR, "events")
    hist = cdc.scd2_intervals(
        events.filter(F.col("event_type") == "purchase"),
        keys=["user_id"], order_col="ts", tiebreak="event_id",
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    pit = cdc.scd2_point_in_time_join(
        clicks, hist, keys=["user_id"], fact_ts="ts", dim_values=["value"]
    )
    attached = pit.filter(F.col("value").isNotNull()).count()
    print(f"point-in-time: {attached}/{pit.count()} clicks carry purchase state")

    # 5. incremental dedup admission
    docs = load_table(spark, SF_DIR, "documents")
    batch = docs.filter("doc_id % 2 = 1")
    admitted = dedup.incremental_dedup(batch, docs.filter("doc_id % 2 = 0"))
    print(f"admission: {admitted.count()}/{batch.count()} new docs are novel")

    # 6. incremental rollup maintenance: recompute ONLY touched windows
    cut = F.lit("2024-01-25 00:00:00").cast("timestamp")
    existing = hourly.aggregate_events(events.filter(F.col("ts") < cut))
    merged = hourly.incremental_update(
        existing, events, events.filter(F.col("ts") >= cut)
    )
    full = hourly.aggregate_events(events)
    # round the float sums before comparing: the two results come from
    # different physical plans, so raw doubles may differ in the last ulp
    stable = lambda df: df.withColumn(  # noqa: E731
        "total_value", F.round("total_value", 6)
    ).withColumn("avg_value", F.round("avg_value", 6))
    assert stable(merged).exceptAll(stable(full)).count() == 0
    assert merged.count() == full.count()
    print(f"incremental rollup == full recompute: {merged.count()} windows")

    # 7. publish gate: contracts + drift
    drift = dq.profile_drift(
        yesterday, rebuilt.select(yesterday.columns),
        ["o_orderstatus", "o_totalprice"],
    )
    n_drifted = sum(r.drifted for r in drift.collect())
    print(f"profile drift: {n_drifted} of {drift.count()} columns flagged")

    audit = dq.audit(
        [
            dq.unique_key(rebuilt, ["o_orderkey"]),
            dq.not_null(rebuilt, "o_orderstatus"),
            dq.in_range(rebuilt, "o_totalprice", 0.0, 1e9),
        ]
    )
    audit.show(truncate=False)
    assert all(r.passed for r in audit.collect())
    print("audit green — snapshot publishable")
    spark.stop()


if __name__ == "__main__":
    main()
