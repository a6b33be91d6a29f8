"""Structured Streaming pipeline — the reference's processor, Spark-native.

Reference lifecycle (SURVEY.md §3.1): Kafka JSON events → in-memory hourly
window state → grace-period flush → Postgres idempotent upsert → offset
commit.  The Spark mapping, stage by stage:

* Kafka batched poll + bad-record drop (``kafka_consumer.py:71-107``)
  → ``readStream.format("kafka")`` + permissive ``from_json`` + null filter
  (:func:`parse_events`; ``maxOffsetsPerTrigger`` = the poll batch size).
* dict-based hourly window state (``aggregation.py:44-67``)
  → the SAME :func:`~..operators.hourly.aggregate_events` used in batch;
  Spark's state store replaces the dict.
* grace-period window close (``aggregation.py:69-79``, grace 60 s vs
  processing-time ``now``) → ``withWatermark(ts, grace)`` (event-time; the
  reference stamps events with wall-clock at creation, ``events.py:34``, so
  the two coincide in live operation).
* periodic flush (``aggregation_service.py:138-164``, every 60 s)
  → ``trigger(processingTime="60 seconds")``.
* Postgres ``INSERT ... ON CONFLICT DO UPDATE`` (``upsert_aggregation.sql``)
  → ``foreachBatch`` upsert sink.  Update-mode re-emission + key-overwrite
  reproduces the reference's effectively-once contract (at-least-once
  delivery into an idempotent keyed write).

Deliberate deviation (documented): a late event arriving after its window
was flushed causes the reference to REBUILD the window from scratch and
overwrite the DB row with partial counts (``aggregation.py:53-58``) — data
loss.  Here update mode re-emits the *cumulative* corrected row within the
watermark, and drops events later than the watermark.  Strictly better;
noted for parity audits.

Offset commit (``aggregation_service.py:157-158`` write-then-commit) is
subsumed by checkpointing: offsets are persisted only after the batch's
sink write completes.
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.hourly import aggregate_events
from ..schemas import EVENT_WIRE_SCHEMA, HOURLY_AGGREGATION_SCHEMA

#: Logical primary key of the aggregate table
#: (reference ``001_initial_schema.sql:13``: UNIQUE (window_start, event_type)).
UPSERT_KEYS = ["window_start", "event_type"]


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------


def read_event_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "user-activity-events",
    max_offsets_per_trigger: int | None = 100,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka JSON event source (reference S1: batched poll of ≤N messages —
    ``maxOffsetsPerTrigger`` is the Spark analog of the poll batch size)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_events(reader.load().selectExpr("CAST(value AS STRING) AS raw"))


def read_event_stream_json(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based JSONL event source (deterministic test/replay transport:
    same wire format as the Kafka topic, one JSON object per line)."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return parse_events(reader.load(path).select(F.col("value").alias("raw")))


def parse_events(raw: DataFrame) -> DataFrame:
    """Wire JSON → typed events; malformed messages are DROPPED, not failed
    (reference ``kafka_consumer.py:104-107``).  Permissive ``from_json``
    yields null structs for undeserializable rows; the filter on required
    fields removes them."""
    parsed = raw.select(
        F.from_json(F.col("raw"), EVENT_WIRE_SCHEMA).alias("e")
    ).select("e.*")
    return parsed.filter(
        F.col("event_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("timestamp").isNotNull()
    )


def write_events_kafka(
    events: DataFrame,
    bootstrap_servers: str,
    topic: str = "user-activity-events",
    acks: str = "all",
    linger_ms: int = 10,
    compression_type: str = "snappy",
    batch_size: int = 16384,
    **kafka_options: str,
):
    """Kafka sink writer (reference S3/S4: one JSON message per event,
    keyed by user_id, with the bulk-producer tuning knobs the reference
    sets — acks/linger/compression/batch.size,
    ``kafka_publisher.py:41-49``).  Returns the DataStreamWriter — caller
    sets trigger/checkpoint.  Additional producer properties pass through
    ``kafka_options`` (dots as underscores, e.g.
    ``max_request_size="1048576"``)."""
    payload = events.select(
        F.col("user_id").cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in events.columns])).alias("value"),
    )
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("kafka.acks", acks)
        .option("kafka.linger.ms", str(linger_ms))
        .option("kafka.compression.type", compression_type)
        .option("kafka.batch.size", str(batch_size))
    )
    for k, v in kafka_options.items():
        writer = writer.option(f"kafka.{k.replace('_', '.')}", str(v))
    return writer


# ---------------------------------------------------------------------------
# the streaming aggregation
# ---------------------------------------------------------------------------


def streaming_hourly_aggregate(
    events: DataFrame,
    grace_period: str = "60 seconds",
    exact_distinct: bool = True,
    ts_col: str = "timestamp",
    session_col: str | None = "session_id",
    value_col: str = "duration_ms",
    apply_watermark: bool = True,
) -> DataFrame:
    """Watermarked hourly aggregation over a streaming event DataFrame —
    the reference's A1-A7 in one declarative plan, sharing
    :func:`aggregate_events` with the batch path (stream/batch equivalence
    is guaranteed by construction and tested).

    ``exact_distinct=True`` matches reference semantics (Python sets,
    ``aggregation.py:62-63``); at 100 TB switch to False for HyperLogLog
    state (the reference's unbounded-set flaw, fixed).

    ``apply_watermark=False`` when an upstream stage (e.g. the dedup
    operator) already set the watermark — Spark forbids redefining it."""
    if apply_watermark:
        events = events.withWatermark(ts_col, grace_period)
    return aggregate_events(
        events,
        ts_col=ts_col,
        user_col="user_id",
        session_col=session_col,
        value_col=value_col,
        exact_distinct=exact_distinct,
    )


def dedup_event_stream(
    events: DataFrame,
    id_col: str = "event_id",
    ts_col: str = "timestamp",
    within: str = "10 minutes",
) -> DataFrame:
    """Streaming exact-once dedup by event id within a watermark horizon
    (``dropDuplicatesWithinWatermark``): upstream at-least-once redelivery
    (the reference's Kafka consumer redelivers on crash between poll and
    commit, ``kafka_consumer.py:71-107``) stops inflating counts even for
    non-idempotent sinks.  State is bounded by the horizon — at 100 TB/day
    the dedup state holds only ``within`` worth of ids, not the full
    history.

    This sets the stream's watermark; downstream aggregations must pass
    ``apply_watermark=False`` (Spark forbids redefining a watermark — use
    :func:`start_pipeline` with ``dedup_ids=...`` for the composed form)."""
    return events.withWatermark(ts_col, within).dropDuplicatesWithinWatermark(
        [id_col]
    )


def streaming_session_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    grace_period: str = "60 seconds",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Streaming session windows (merging state): per-user sessions that
    close once the watermark passes session_end.  The [EXT] stateful
    operator the reference lacks — same expression as the batch
    ``events_ext.session_window_stats`` (tested equivalent)."""
    from pyspark.sql import functions as F  # local to avoid shadowing

    return (
        events.withWatermark(ts_col, grace_period)
        .groupBy("user_id", F.session_window(F.col(ts_col), gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_error_context(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    error_type: str = "error",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Stream-stream interval self-join: each error event matched with the
    same user's events within ±``gap_minutes`` — the streaming twin of the
    batch ``relational.error_event_context`` range join.

    Both branches carry a watermark and the join condition bounds event
    time on BOTH sides, so Spark can evict join state once the watermark
    passes ``err_ts + gap`` / ``ctx_ts + gap``: state is proportional to
    the events inside one (watermark + gap) horizon, not the stream
    history.  Output is append-mode pairs; downstream aggregation (e.g.
    nearby-event counts) composes as a second stateful stage."""
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    err = (
        events.filter(F.col("event_type") == error_type)
        .select(
            F.col("event_id").alias("err_id"),
            F.col("user_id").alias("err_user"),
            F.col(ts_col).alias("err_ts"),
        )
        .withWatermark("err_ts", watermark)
    )
    ctx = events.select(
        F.col("event_id").alias("ctx_id"),
        F.col("user_id").alias("ctx_user"),
        F.col(ts_col).alias("ctx_ts"),
    ).withWatermark("ctx_ts", watermark)
    return err.join(
        ctx,
        (F.col("err_user") == F.col("ctx_user"))
        & (F.col("ctx_ts") >= F.col("err_ts") - gap)
        & (F.col("ctx_ts") <= F.col("err_ts") + gap)
        & (F.col("ctx_id") != F.col("err_id")),
    ).select(
        "err_id",
        F.col("err_user").alias("user_id"),
        "err_ts",
        "ctx_id",
        "ctx_ts",
    )


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------


class ParquetUpsertSink:
    """Idempotent keyed upsert into a parquet directory — the fixture-mode
    stand-in for the reference's Postgres ``ON CONFLICT DO UPDATE`` (S5).

    Each micro-batch: read current table, anti-join away rows whose key
    appears in the batch, union the batch, write to a fresh snapshot dir,
    swap.  Last-write-wins per (window_start, event_type) — identical to
    ``upsert_aggregation.sql:12-19``.  Replayed batches (at-least-once)
    rewrite the same rows: effectively-once.

    Contract: SINGLE WRITER on a local/posix FS (this is the fixture-mode
    sink; production uses the JDBC upsert, where the DB provides atomicity).
    The two-rename swap has a window where ``path`` is absent; a crash there
    leaves the previous snapshot at ``path.__old_<id>`` and ``__call__``
    rolls it back on the next invocation."""

    def __init__(self, path: str, keys: list[str] | None = None) -> None:
        self.path = path
        self.keys = keys or UPSERT_KEYS

    def _recover(self) -> None:
        """Roll back a crashed swap: live path missing but an __old_ exists."""
        if os.path.isdir(self.path):
            return
        parent, base = os.path.split(self.path.rstrip("/"))
        leftovers = sorted(
            n for n in os.listdir(parent or ".") if n.startswith(f"{base}.__old_")
        )
        if leftovers:
            os.rename(os.path.join(parent, leftovers[-1]), self.path)

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates(self.keys)  # one row per key per batch
        self._recover()
        if os.path.isdir(self.path):
            current = spark.read.parquet(self.path)
            merged = current.join(
                batch.select(*self.keys), on=self.keys, how="left_anti"
            ).unionByName(batch)
        else:
            merged = batch
        tmp = f"{self.path}.__tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.__old_{batch_id}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


_UPSERT_ROW_TEMPLATE = "(%s, %s, %s, %s, %s, %s, %s, %s)"


def _upsert_sql_parts(table: str) -> tuple[str, str, str]:
    """(INSERT prefix, one-row VALUES template, ON CONFLICT suffix) — the
    pieces a multi-row statement is assembled from."""
    prefix = f"""
INSERT INTO {table}
  (window_start, window_end, event_type, event_count,
   unique_user_count, unique_session_count, total_duration_ms, avg_duration_ms)
VALUES """.strip()
    suffix = """
ON CONFLICT (window_start, event_type) DO UPDATE SET
  window_end = EXCLUDED.window_end,
  event_count = EXCLUDED.event_count,
  unique_user_count = EXCLUDED.unique_user_count,
  unique_session_count = EXCLUDED.unique_session_count,
  total_duration_ms = EXCLUDED.total_duration_ms,
  avg_duration_ms = EXCLUDED.avg_duration_ms
""".strip()
    return prefix, _UPSERT_ROW_TEMPLATE, suffix


def postgres_upsert_sql(table: str = "hourly_aggregations") -> str:
    """The production sink SQL (reference ``upsert_aggregation.sql:1-19``),
    single-row form, for use inside a ``foreachBatch`` that holds a
    JDBC/psycopg connection."""
    prefix, row_tpl, suffix = _upsert_sql_parts(table)
    return f"{prefix}{row_tpl}\n{suffix}"


def jdbc_upsert_sink(
    table: str, connection_factory: Callable, page_size: int = 500
) -> Callable[[DataFrame, int], None]:
    """foreachBatch upsert into Postgres through any DB-API connection
    factory (kept dependency-free).  Rows ship as multi-row VALUES
    statements of up to ``page_size`` tuples — the reference's
    ``execute_values`` batching (reference ``postgres_repository.py:83-88``)
    without the psycopg2 dependency; per-row ``executemany`` round-trips
    would dominate latency on wide backfill batches.  The per-key dedup is
    also what makes multi-row ON CONFLICT legal: Postgres rejects a
    statement that updates the same key twice."""
    prefix, row_tpl, suffix = _upsert_sql_parts(table)
    # The persisted record shape; the streaming aggregate additionally
    # carries the duration_ms_count helper column, which the upsert SQL's
    # 8 placeholders do not accept.
    cols = [f.name for f in HOURLY_AGGREGATION_SCHEMA.fields]

    def _sink(batch: DataFrame, batch_id: int) -> None:
        projected = batch.dropDuplicates(UPSERT_KEYS).select(
            *[
                (F.col(c) if c in batch.columns else F.lit(None)).alias(c)
                for c in cols
            ]
        )
        rows = [tuple(r) for r in projected.collect()]
        if not rows:
            return
        conn = connection_factory()
        try:
            with conn.cursor() as cur:
                for i in range(0, len(rows), page_size):
                    chunk = rows[i : i + page_size]
                    stmt = (
                        prefix + ", ".join([row_tpl] * len(chunk)) + "\n" + suffix
                    )
                    cur.execute(stmt, [v for row in chunk for v in row])
            conn.commit()
        except Exception:
            conn.rollback()  # reference: rollback+raise, postgres_repository.py:92-97
            raise
        finally:
            conn.close()

    return _sink


# ---------------------------------------------------------------------------
# pipeline driver
# ---------------------------------------------------------------------------


def start_pipeline(
    events: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    flush_interval: str | None = "60 seconds",
    grace_period: str = "60 seconds",
    exact_distinct: bool = True,
    available_now: bool = False,
    query_name: str = "hourly-aggregation",
    dedup_ids: str | None = None,
) -> StreamingQuery:
    """events → [id dedup →] watermarked hourly agg → foreachBatch upsert.

    ``flush_interval`` = the reference's FLUSH_INTERVAL_SECONDS (A8);
    ``available_now=True`` = drain mode (the reference's shutdown
    ``flush_all`` / manual flush, A9); ``dedup_ids`` names an id column to
    drop at-least-once redeliveries within the grace period (one shared
    watermark serves both stateful operators)."""
    if dedup_ids is not None:
        events = dedup_event_stream(
            events, id_col=dedup_ids, within=grace_period
        )
    agg = streaming_hourly_aggregate(
        events,
        grace_period=grace_period,
        exact_distinct=exact_distinct,
        apply_watermark=dedup_ids is None,
    )
    writer = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .foreachBatch(sink)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif flush_interval is not None:
        writer = writer.trigger(processingTime=flush_interval)
    return writer.start()


def drain(query: StreamingQuery, timeout_seconds: float | None = None) -> None:
    """Process everything available, then stop — the manual-flush /
    shutdown-drain control path (reference ``flush_all``,
    ``aggregation_service.py:166-186``)."""
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout_seconds)


def pipeline_status(query: StreamingQuery) -> dict:
    """Engine-state introspection (reference A11 ``get_memory_stats`` /
    ``pipeline_status`` endpoints) straight from StreamingQueryProgress —
    no metrics-text scraping needed."""
    p = query.lastProgress
    state = (p.get("stateOperators") or [{}])[0] if p else {}
    return {
        "query_name": query.name,
        "is_active": query.isActive,
        "batch_id": p.get("batchId") if p else None,
        "num_input_rows": p.get("numInputRows") if p else None,
        "input_rows_per_second": p.get("inputRowsPerSecond") if p else None,
        "active_windows": state.get("numRowsTotal"),
        "state_rows_updated": state.get("numRowsUpdated"),
        "watermark": (p.get("eventTime") or {}).get("watermark") if p else None,
    }
