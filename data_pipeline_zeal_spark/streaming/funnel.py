"""[EXT] Custom stateful streaming operator: per-user funnel detection.

The one operator class Spark's built-in aggregations can't express: ORDERED
sequence matching with evolving per-key state (reached step k, waiting for
step k+1).  Implemented with ``applyInPandasWithState`` — Arrow-batched
per-group Python with a managed state store — per the engine's UDF ladder
(built-ins → Pandas UDF → mapPartitions; SURVEY.md §7.2).

Scale shape: state is O(keys x 3 fields) — bounded, checkpointed by Spark;
groups stream through Arrow in batches, never row-at-a-time Python.  The
batch twin (:func:`funnel_conversions_batch`) expresses the same semantics
as staged min-aggregates for oracle checking and backfill.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("started_at", T.TimestampType()),
        T.StructField("completed_at", T.TimestampType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

#: step index reached so far + epoch-micros of the first step
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("idx", T.IntegerType()),
        T.StructField("started_us", T.LongType()),
    ]
)


def _funnel_fn(steps: tuple[str, ...], stale_timeout_ms: int | None = None):
    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if stale_timeout_ms is not None and state.hasTimedOut:
            # abandoned funnel: drop the key's state entirely — this is
            # what keeps total state bounded by ACTIVE users, not all
            # users ever seen
            state.remove()
            return
        idx, started_us = state.get if state.exists else (0, 0)
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("timestamp")
            for ts, etype in zip(pdf["timestamp"], pdf["event_type"]):
                if etype != steps[idx]:
                    continue
                if idx == 0:
                    started_us = int(ts.value // 1000)  # ns → us
                idx += 1
                if idx == len(steps):
                    started = pd.Timestamp(started_us * 1000)
                    out.append(
                        (key[0], started, ts, (ts - started).total_seconds())
                    )
                    idx, started_us = 0, 0
        state.update((idx, started_us))
        if stale_timeout_ms is not None:
            state.setTimeoutDuration(stale_timeout_ms)
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "started_at", "completed_at", "duration_s"]
            )

    return fn


def funnel_detect_stream(
    events: DataFrame,
    steps: tuple[str, ...] = ("page_view", "add_to_cart", "purchase"),
    stale_timeout_ms: int | None = 3_600_000,
) -> DataFrame:
    """Streaming funnel detection: emits one row per completed ordered
    funnel per user (a user can convert repeatedly; state resets after
    each completion).  Events are sequenced by event time within each
    micro-batch; for strict cross-batch ordering feed it a source with
    per-key monotone delivery (Kafka per-partition order) or drain mode.

    ``stale_timeout_ms`` expires a key's state after that much processing
    time without events (default 1 h), so state stays bounded by ACTIVE
    users — without it, every user ever seen holds a state row forever.
    Pass None for drain mode (``availableNow`` one-shots): a registered
    processing-time timeout keeps the query scheduling timeout-check
    micro-batches after the data is exhausted, so it never terminates."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(tuple(steps), stale_timeout_ms),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            "ProcessingTimeTimeout" if stale_timeout_ms is not None else "NoTimeout"
        ),
    )


class FunnelProcessor(StatefulProcessor):
    """Spark 4 ``transformWithState`` form of the funnel state machine —
    the successor API to ``applyInPandasWithState``: typed named state
    handles instead of one tuple, and state TTL managed by the store
    itself (``ttlDurationMs``) instead of hand-rolled timeout callbacks.

    State bound is identical to :func:`funnel_detect_stream`: one
    (idx, started_us) row per user, auto-evicted ``state_ttl_ms`` after
    its last update, so the store scales with ACTIVE users.  Requires the
    RocksDB state store provider (the store TTL + column-family features
    live there), which is also the provider a 100 TB deployment runs for
    bounded-heap incremental checkpoints."""

    def __init__(
        self, steps: Iterable[str], state_ttl_ms: int | None = 3_600_000
    ) -> None:
        self._steps = tuple(steps)
        self._ttl_ms = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "funnel", FUNNEL_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        got = self._state.get()
        idx, started_us = got if got is not None else (0, 0)
        out: list[tuple] = []
        for pdf in rows:
            pdf = pdf.sort_values("timestamp")
            for ts, etype in zip(pdf["timestamp"], pdf["event_type"]):
                if etype != self._steps[idx]:
                    continue
                if idx == 0:
                    started_us = int(ts.value // 1000)
                idx += 1
                if idx == len(self._steps):
                    started = pd.Timestamp(started_us * 1000)
                    out.append(
                        (key[0], started, ts, (ts - started).total_seconds())
                    )
                    idx, started_us = 0, 0
        self._state.update((idx, started_us))
        if out:
            yield pd.DataFrame(
                out, columns=["user_id", "started_at", "completed_at", "duration_s"]
            )

    def close(self) -> None:
        pass


def funnel_detect_stream_tws(
    events: DataFrame,
    steps: tuple[str, ...] = ("page_view", "add_to_cart", "purchase"),
    state_ttl_ms: int | None = 3_600_000,
) -> DataFrame:
    """:func:`funnel_detect_stream` on the ``transformWithStateInPandas``
    API.  Same emission semantics (one row per completed funnel, repeat
    conversions allowed); state expiry is the store's TTL rather than a
    processing-time timer.  The session must run the RocksDB state store
    provider (``spark.sql.streaming.stateStore.providerClass``), and the
    Python side needs ``protobuf`` (PySpark's TWS state client speaks a
    proto protocol; absent in this sandbox, so CI covers the processor
    logic via a fake handle and skips the end-to-end run)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FunnelProcessor(steps, state_ttl_ms),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime" if state_ttl_ms is not None else "None",
    )


def funnel_conversions_batch(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Batch funnel (first conversion per user): earliest step-1 time, then
    the earliest step-2 at-or-after it, and so on — staged conditional
    min-aggregates, each a tiny (#users) aggregate on the same key so the
    per-user shuffle is reused, never a per-event window sort."""
    cur = None
    for i, step in enumerate(steps):
        filt = F.col(type_col) == step
        if cur is None:
            cur = (
                events.filter(filt)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("t1"))
            )
        else:
            prev = f"t{i}"
            cur = (
                events.filter(filt)
                .join(cur, user_col)
                .filter(F.col(ts_col) >= F.col(prev))
                .groupBy(user_col, *[f"t{j + 1}" for j in range(i)])
                .agg(F.min(ts_col).alias(f"t{i + 1}"))
            )
    last = f"t{len(steps)}"
    return cur.select(
        user_col,
        *[f"t{j + 1}" for j in range(len(steps))],
        F.round(
            F.col(last).cast("double") - F.col("t1").cast("double"), 3
        ).alias("duration_s"),
    ).orderBy(user_col)


def funnel_step_rates(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """The funnel-chart readout over :func:`funnel_conversions_batch`'s
    semantics: per step, how many users reached it (earliest occurrence
    at-or-after their previous step), the conversion rate vs the previous
    step, and vs the funnel entry.

    Each stage frame is the same staged conditional-min aggregate as the
    batch funnel (per-user shuffle reused, no event-level window); the
    readout aggregates every stage to ONE row, so the final rate window
    runs over exactly ``len(steps)`` rows — bounded by construction."""
    from functools import reduce as _reduce

    from pyspark.sql import Window

    counts = []
    cur = None
    for i, step in enumerate(steps):
        filt = F.col(type_col) == step
        if cur is None:
            cur = (
                events.filter(filt)
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("t1"))
            )
        else:
            cur = (
                events.filter(filt)
                .join(cur, user_col)
                .filter(F.col(ts_col) >= F.col(f"t{i}"))
                .groupBy(user_col, *[f"t{j + 1}" for j in range(i)])
                .agg(F.min(ts_col).alias(f"t{i + 1}"))
            )
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step_index"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    summary = _reduce(lambda a, b: a.unionByName(b), counts)
    w = Window.orderBy("step_index")  # len(steps) rows: bounded window
    first = F.first("n_users").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("n_users").over(w)
    # Zero-denominator guard: an upstream step with zero users yields 0.0
    # conversion (x/0 is NULL in Spark but +-inf/NaN in other engines —
    # pin the semantics explicitly rather than inherit either).
    return summary.select(
        "step_index",
        "step",
        "n_users",
        F.round(
            F.when(prev.isNull(), 1.0)
            .when(prev == 0, 0.0)
            .otherwise(F.col("n_users") / prev),
            6,
        ).alias("rate_vs_prev"),
        F.round(
            F.when(first == 0, 0.0).otherwise(F.col("n_users") / first), 6
        ).alias("rate_vs_entry"),
    ).orderBy("step_index")
