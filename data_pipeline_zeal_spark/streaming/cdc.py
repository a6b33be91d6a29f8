"""Streaming twin of the batch CDC kernels (``operators/cdc.py``).

``latest_state_stream`` maintains the latest-wins state per key across
micro-batches and emits, per batch, the keys whose latest row CHANGED —
i.e. it turns an at-least-once event stream into a change-data-capture
feed of current state, the streaming half of the base-snapshot + delta
compaction loop (batch half: ``cdc.merge_latest``).

Scale notes (100 TB bar):
* State per key is ONE fixed-width row (version + tiebreak + payload) —
  bounded by distinct keys, independent of event volume; with the
  RocksDB provider that state spills off-heap and checkpoints
  incrementally.
* Each micro-batch reduces its rows per key BEFORE touching state
  (pandas groupby-max inside the Arrow batch), so state I/O is one
  get/put per distinct key per batch, not per event.
* Emitting only changed keys keeps the output stream proportional to
  actual state churn — the property downstream incremental consumers
  (cache invalidation, upsert sinks) rely on.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: Emitted row: the key plus its new latest observation.
LATEST_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("last_event_id", T.StringType()),
        T.StructField("last_duration_ms", T.LongType()),
    ]
)

#: State: microsecond epoch of the winning version + its tiebreak + value.
LATEST_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def _latest_fn(stale_timeout_ms: int | None):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: Any) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cur = tuple(state.get) if state.exists else None  # (ts_us, event_id, duration)
        best = cur
        for pdf in pdfs:
            if not len(pdf):
                continue
            # reduce the Arrow batch BEFORE state I/O: one candidate per key
            for ts, eid, val in zip(pdf["timestamp"], pdf["event_id"], pdf["duration_ms"]):
                cand = (
                    int(ts.value // 1000),
                    str(eid),
                    int(val) if pd.notna(val) else None,
                )
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        # Refresh the idle clock on EVERY invocation that saw data for this
        # key — a key receiving a steady stream of stale (out-of-order,
        # older-than-current) events is still ACTIVE and must not be
        # evicted just because nothing advanced its state.
        if state.exists and stale_timeout_ms is not None:
            state.setTimeoutDuration(stale_timeout_ms)
        if best is not None and best != cur:
            state.update(best)
            if stale_timeout_ms is not None:
                state.setTimeoutDuration(stale_timeout_ms)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "event_type": [key[1]],
                    "last_ts": [pd.Timestamp(best[0] * 1000)],
                    "last_event_id": [best[1]],
                    "last_duration_ms": [best[2]],
                }
            )

    return fn


def latest_state_stream(
    events: DataFrame,
    stale_timeout_ms: int | None = 3_600_000,
) -> DataFrame:
    """Per-(user, type) latest-wins state over a micro-batched stream;
    emits a row whenever a key's latest observation changes (ordering:
    event time, then event_id — identical to the batch
    ``cdc.latest_snapshot(keys=[user_id, event_type], order_col=ts,
    tiebreak=event_id)``, so drain-mode output == batch output on the
    same data).  ``stale_timeout_ms`` evicts keys idle for that much
    processing time, bounding state by recently-active keys; the idle
    clock resets on every batch that carries ANY event for the key (even
    out-of-order ones that don't advance its state).  Eviction is silent —
    no tombstone row is emitted — so downstream consumers treat a key's
    absence after the timeout as "no update", not "deleted"; re-appearance
    of an evicted key re-emits its (then-) latest observation.  Pass
    ``stale_timeout_ms=None`` for drain mode (``availableNow``): a
    registered processing-time timeout keeps the query scheduling
    timeout-check micro-batches forever after the data is exhausted."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _latest_fn(stale_timeout_ms),
        outputStructType=LATEST_OUTPUT_SCHEMA,
        stateStructType=LATEST_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            "ProcessingTimeTimeout" if stale_timeout_ms is not None else "NoTimeout"
        ),
    )
