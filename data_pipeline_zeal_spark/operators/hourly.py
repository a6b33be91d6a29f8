"""Tumbling hourly windowed aggregation — the heart of the engine.

Re-expresses the reference's in-memory hash aggregation
(``processor/src/domain/aggregation.py:44-79``: dict keyed by
``(window_start, event_type)`` holding count / distinct-user set /
distinct-session set / duration sum) as ONE declarative DataFrame function,
reused verbatim by batch jobs and by the Structured Streaming pipeline
(Spark guarantees unified semantics for both).

Semantics preserved from the reference:

* window assignment = timestamp truncated to the hour; an event exactly on
  the boundary belongs to the window it starts
  (``aggregation.py:46-58``: ``replace(minute=0, second=0, microsecond=0)``
  ≡ ``F.window(ts, "1 hour")`` hour buckets).
* COUNT(*) per (window, event_type)                 (``aggregation.py:61``)
* exact COUNT(DISTINCT user), COUNT(DISTINCT session)
  (``aggregation.py:62-63``; ``exact=False`` switches to HyperLogLog
  ``approx_count_distinct`` — the documented 100 TB-scale variant, since exact
  distinct inside a streaming window keeps per-key state proportional to
  cardinality; the reference has the same flaw with unbounded Python sets).
* SUM(duration) skipping NULLs, count of contributing events
  (``aggregation.py:65-67``) — SQL SUM/COUNT(col) null-skipping matches.
* AVG(duration) → NULL when no non-null durations in the window
  (``aggregation.py:31-36``) — SQL AVG matches exactly.

Scale notes: the groupBy keys are (hour-bucket, event_type) — low cardinality
(24*365 windows/yr x ~10 types), so the final aggregate is tiny regardless of
input size; Spark's partial (map-side) aggregation means the shuffle carries
only per-partition partial states, not events.  Skew across event types is
bounded by type-enum cardinality; AQE skew handling covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_events(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    user_col: str = "user_id",
    session_col: str | None = None,
    value_col: str = "value",
    window_duration: str = "1 hour",
    exact_distinct: bool = True,
    approx_rsd: float = 0.01,
) -> DataFrame:
    """Windowed aggregation over an event DataFrame (batch or streaming).

    Returns columns: window_start, window_end, event_type, event_count,
    unique_user_count, [unique_session_count,] total_<value>, avg_<value>,
    <value>_count — aliased stably so batch results hash-match the oracle.
    """
    if not exact_distinct:
        distinct = lambda c: F.approx_count_distinct(F.col(c), approx_rsd)  # noqa: E731
    elif df.isStreaming:
        # Spark rejects COUNT(DISTINCT) in streaming aggregations;
        # size(collect_set()) is the exact equivalent (both skip nulls) at
        # the cost of per-key set state — precisely the reference's own
        # memory profile (Python sets, aggregation.py:16-17).
        distinct = lambda c: F.size(F.collect_set(F.col(c))).cast("long")  # noqa: E731
    else:
        distinct = lambda c: F.countDistinct(F.col(c))  # noqa: E731

    aggs = [
        F.count(F.lit(1)).alias("event_count"),
        distinct(user_col).alias("unique_user_count"),
    ]
    if session_col is not None:
        aggs.append(distinct(session_col).alias("unique_session_count"))
    aggs += [
        F.sum(value_col).alias(f"total_{value_col}"),
        F.avg(value_col).alias(f"avg_{value_col}"),
        F.count(F.col(value_col)).alias(f"{value_col}_count"),
    ]

    win = F.window(F.col(ts_col), window_duration)
    out = df.groupBy(win.alias("w"), F.col(type_col).alias("event_type")).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        *[c for c in out.columns if c not in ("w", "event_type")],
    )


def finalize_aggregate(agg: DataFrame, value_col: str = "value") -> DataFrame:
    """Project the partial-state aggregate to the persisted record shape
    (reference ``AggregationRecord.from_aggregation``, ``aggregation.py:104-117``):
    drop the helper contributing-count column, keep the scalar record."""
    return agg.drop(f"{value_col}_count")


def incremental_update(
    existing: DataFrame,
    all_events: DataFrame,
    new_events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 hour",
    **agg_kwargs,
) -> DataFrame:
    """Incremental maintenance of the hourly aggregate table: given the
    EXISTING aggregate rows (same schema as :func:`aggregate_events`), the
    full event store, and the newly-arrived batch, produce the updated
    aggregate — the batch-lakehouse twin of the reference's flush-upsert
    path (``upsert_aggregation.sql:12-19``: replayed/late events rebuild
    the window and the upsert REPLACES the row).

    Exact distinct counts cannot be merged from finalized scalars (that is
    WHY sketches exist), so this uses the standard touched-partition
    recompute: the new batch contributes a tiny DISTINCT list of touched
    window starts; only events falling in those windows are re-aggregated;
    every other existing row passes through untouched via an anti join
    against the same list.

    SCALE: the touched-window list is bounded by windows-per-batch (a
    60 s micro-batch touches 1-2 hourly windows) → broadcast on both
    joins; with the event store partitioned by hour/date the semi join
    becomes partition pruning, so the rescan reads ONLY the touched
    hours' files — cost proportional to the batch's time locality, not
    the store size.  The reference pays the same shape (it re-upserts
    whole windows), minus the pruning."""
    ws = F.window(F.col(ts_col), window_duration)["start"]
    touched = (
        new_events.select(ws.alias("window_start")).distinct()
    )
    recomputed = aggregate_events(
        all_events.withColumn("_ws", ws)
        .join(F.broadcast(touched), F.col("_ws") == F.col("window_start"))
        .drop("_ws", "window_start"),
        ts_col=ts_col,
        window_duration=window_duration,
        **agg_kwargs,
    )
    untouched = existing.join(F.broadcast(touched), "window_start", "left_anti")
    return untouched.unionByName(recomputed)
