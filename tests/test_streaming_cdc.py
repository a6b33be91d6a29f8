"""Streaming CDC latest-state operator: drain-mode output must equal the
batch latest-wins kernel on the same data, and a second batch must emit
only the keys whose state actually changed."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.operators import cdc
from data_pipeline_zeal_spark.streaming.cdc import latest_state_stream
from data_pipeline_zeal_spark.streaming.pipeline import (
    parse_events,
    read_event_stream_json,
)


def _event(i, user, etype, ts, dur):
    return json.dumps(
        {
            "event_id": f"e{i:03d}",
            "user_id": user,
            "event_type": etype,
            "timestamp": ts,
            "session_id": "s0",
            "page_url": None,
            "duration_ms": dur,
            "metadata": None,
        }
    )


_BATCH1 = [
    _event(0, "A", "click", "2024-01-01 10:00:00", 100),
    _event(1, "A", "click", "2024-01-01 10:05:00", 200),  # newer, wins
    _event(2, "A", "view", "2024-01-01 10:01:00", 50),
    _event(3, "B", "click", "2024-01-01 09:00:00", 10),
    # same ts as e000 but higher id — loses to e001 (later ts)
    _event(4, "A", "click", "2024-01-01 10:00:00", 999),
]

_BATCH2 = [
    _event(5, "A", "click", "2024-01-01 11:00:00", 300),  # advances A/click
    _event(6, "B", "click", "2024-01-01 08:00:00", 5),    # OLDER: no change
]


def _drain(spark, src_dir, ckpt, name):
    q = (
        latest_state_stream(
            read_event_stream_json(spark, src_dir), stale_timeout_ms=None
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_latest_state_matches_batch_kernel(spark, tmp_path):
    src = tmp_path / "in"
    os.makedirs(src)
    (src / "b1.jsonl").write_text("\n".join(_BATCH1))
    _drain(spark, str(src), str(tmp_path / "ck"), "latest1")

    got = {
        (r.user_id, r.event_type): (r.last_event_id, r.last_ts, r.last_duration_ms)
        for r in spark.table("latest1").collect()
    }

    batch = cdc.latest_snapshot(
        parse_events(
            spark.createDataFrame([(l,) for l in _BATCH1], "raw string")
        ).withColumn("ts", F.col("timestamp")),
        keys=["user_id", "event_type"],
        order_col="ts",
        tiebreak="event_id",
    )
    want = {
        (r.user_id, r.event_type): (r.event_id, r.ts, r.duration_ms)
        for r in batch.collect()
    }
    assert got == want
    assert got[("A", "click")][0] == "e001"  # later ts beats higher id


def test_second_batch_emits_only_changed_keys(spark, tmp_path):
    """Across a checkpointed restart (parquet sink supports recovery),
    batch 2 must append rows only for keys whose state advanced."""
    src = tmp_path / "in"
    os.makedirs(src)
    ckpt, out = str(tmp_path / "ck"), str(tmp_path / "out")

    def drain():
        q = (
            latest_state_stream(
                read_event_stream_json(spark, str(src)), stale_timeout_ms=None
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    (src / "b1.jsonl").write_text("\n".join(_BATCH1))
    drain()
    assert spark.read.parquet(out).count() == 3  # (A,click) (A,view) (B,click)

    (src / "b2.jsonl").write_text("\n".join(_BATCH2))
    drain()
    rows = spark.read.parquet(out).collect()
    # exactly one appended row: A/click advanced to e005; B's older event
    # must NOT re-emit
    assert len(rows) == 4
    by_key: dict = {}
    for r in rows:
        by_key.setdefault((r.user_id, r.event_type), []).append(r.last_event_id)
    assert sorted(by_key[("A", "click")]) == ["e001", "e005"]
    assert by_key[("B", "click")] == ["e003"]


class _FakeState:
    """Minimal GroupState stand-in recording timeout refreshes."""

    def __init__(self, value=None):
        self._value = value
        self.hasTimedOut = False
        self.timeout_calls = 0
        self.removed = False

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def setTimeoutDuration(self, ms):
        self.timeout_calls += 1

    def remove(self):
        self.removed = True


def test_stale_events_still_refresh_idle_clock():
    """A key fed ONLY out-of-order (older) events is active: the handler
    must refresh its eviction timeout even though state does not advance,
    and must emit nothing (no state change)."""
    import pandas as pd

    from data_pipeline_zeal_spark.streaming.cdc import _latest_fn

    fn = _latest_fn(stale_timeout_ms=60_000)
    state = _FakeState(value=(2_000_000, "e9", 5))  # current winner at t=2s
    stale_batch = pd.DataFrame(
        {
            "timestamp": [pd.Timestamp(1_000_000_000)],  # 1s — older
            "event_id": ["e1"],
            "duration_ms": [7],
        }
    )
    out = list(fn(("u1", "click"), iter([stale_batch]), state))
    assert out == []                      # nothing emitted
    assert state.get == (2_000_000, "e9", 5)  # state unchanged
    assert state.timeout_calls == 1       # but the idle clock was reset


def test_advancing_event_updates_and_refreshes():
    import pandas as pd

    from data_pipeline_zeal_spark.streaming.cdc import _latest_fn

    fn = _latest_fn(stale_timeout_ms=60_000)
    state = _FakeState(value=(1_000_000, "e1", 7))
    newer = pd.DataFrame(
        {
            "timestamp": [pd.Timestamp(2_000_000_000)],
            "event_id": ["e2"],
            "duration_ms": [9],
        }
    )
    out = list(fn(("u1", "click"), iter([newer]), state))
    assert len(out) == 1 and out[0]["last_event_id"][0] == "e2"
    assert state.get[0] == 2_000_000
    assert state.timeout_calls == 2  # existing-key refresh + post-update


def test_timed_out_key_is_removed():
    from data_pipeline_zeal_spark.streaming.cdc import _latest_fn

    fn = _latest_fn(stale_timeout_ms=60_000)
    state = _FakeState(value=(1_000_000, "e1", 7))
    state.hasTimedOut = True
    assert list(fn(("u1", "click"), iter([]), state)) == []
    assert state.removed
