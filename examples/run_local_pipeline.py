"""End-to-end local pipeline demo — the reference stack in one process.

Reproduces the reference's full lifecycle (producer → processor → API,
SURVEY.md §3) on Spark, no Kafka/Postgres required:

  1. synthesize user-activity events (the producer),
  2. publish them as wire-format JSONL (the topic),
  3. run the watermarked streaming aggregation with an idempotent keyed
     upsert sink (the processor),
  4. answer the API queries over the aggregate table (the API layer),
  5. report pipeline status (the admin/metrics endpoints).

Run:  python examples/run_local_pipeline.py [num_events]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_zeal_spark.operators import api  # noqa: E402
from data_pipeline_zeal_spark.session import get_spark  # noqa: E402
from data_pipeline_zeal_spark.sources.generator import generate_events  # noqa: E402
from data_pipeline_zeal_spark.streaming.observability import (  # noqa: E402
    MetricsListener,
)
from data_pipeline_zeal_spark.streaming.pipeline import (  # noqa: E402
    ParquetUpsertSink,
    pipeline_status,
    read_event_stream_json,
    start_pipeline,
)


def main(n_events: int = 50_000) -> None:
    spark = get_spark(app_name="local-pipeline-demo")
    listener = MetricsListener()
    spark.streams.addListener(listener)
    wd = tempfile.mkdtemp(prefix="pipeline-demo-")
    print(f"workdir: {wd}")

    # 1-2. producer: synthesize events, publish as wire JSONL
    events = generate_events(spark, n_events, num_users=200)
    events.select(
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("value")
    ).write.mode("overwrite").text(f"{wd}/topic")
    print(f"produced {n_events} events")

    # 3. processor: id-dedup -> streaming aggregation -> idempotent upsert
    sink = ParquetUpsertSink(f"{wd}/hourly_aggregations")
    query = start_pipeline(
        read_event_stream_json(spark, f"{wd}/topic"),
        sink,
        checkpoint_dir=f"{wd}/checkpoint",
        available_now=True,  # drain everything, then stop
        dedup_ids="event_id",  # at-least-once redelivery can't inflate counts
    )
    query.awaitTermination(300)
    print("processor drained:", pipeline_status(query))

    # 3b. custom stateful operator: funnel conversions over the same topic
    from data_pipeline_zeal_spark.streaming.funnel import funnel_detect_stream

    fq = (
        # drain mode: no processing-time timeout, else timeout wakeups keep
        # the availableNow query alive past the data (funnel.py docstring)
        funnel_detect_stream(
            read_event_stream_json(spark, f"{wd}/topic"), stale_timeout_ms=None
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("funnels")
        .option("checkpointLocation", f"{wd}/funnel_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    fq.awaitTermination(300)
    n_funnels = spark.table("funnels").count()
    print(f"funnel conversions (page_view->add_to_cart->purchase): {n_funnels}")

    # 4. the API layer over the aggregate table
    agg = sink.read(spark).withColumnsRenamed(
        {"total_duration_ms": "total_value", "avg_duration_ms": "avg_value"}
    )
    print("\n== GET /api/aggregations?event_type=page_view&limit=5 ==")
    api.get_aggregations(agg, event_type="page_view", limit=5).show(truncate=False)
    print("== GET /api/aggregations/latest ==")
    api.get_latest_aggregations(agg, limit=5).show(truncate=False)
    print("== GET /api/aggregations/stats ==")
    api.get_stats(agg).show(truncate=False)
    print("== GET /api/aggregations/event-types ==")
    api.get_event_types(agg).show(truncate=False)

    # 5. observability snapshot
    print("listener:", listener.snapshot())
    for q in spark.streams.active:  # clean shutdown: no teardown races
        q.stop()
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50_000)
