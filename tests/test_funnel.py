"""Funnel operator tests: custom stateful streaming detection
(applyInPandasWithState) and its batch twin."""

from __future__ import annotations

import json
import os

import pytest

from data_pipeline_zeal_spark.streaming.funnel import (
    funnel_conversions_batch,
    funnel_detect_stream,
)
from data_pipeline_zeal_spark.streaming.pipeline import (
    parse_events,
    read_event_stream_json,
)


def _event(i, user, etype, ts):
    return json.dumps(
        {
            "event_id": f"e{i}",
            "user_id": user,
            "event_type": etype,
            "timestamp": ts,
            "session_id": "s0",
            "page_url": None,
            "duration_ms": None,
            "metadata": None,
        }
    )


def test_streaming_funnel_detection(spark, tmp_path):
    lines = []
    i = 0
    # user A: one complete funnel + a dangling page_view
    for etype, t in [
        ("page_view", "10:00:00"),
        ("add_to_cart", "10:05:00"),
        ("purchase", "10:10:00"),
        ("page_view", "10:20:00"),
    ]:
        lines.append(_event(i, "A", etype, f"2024-01-01 {t}")); i += 1
    # user B: never starts the funnel (no page_view first)
    for etype, t in [("add_to_cart", "10:00:00"), ("purchase", "10:01:00")]:
        lines.append(_event(i, "B", etype, f"2024-01-01 {t}")); i += 1
    # user C: converts twice; out-of-order types in between
    for etype, t in [
        ("page_view", "09:00:00"),
        ("purchase", "09:01:00"),  # skipped: cart not reached yet
        ("add_to_cart", "09:30:00"),
        ("purchase", "09:45:00"),
        ("page_view", "11:00:00"),
        ("add_to_cart", "11:10:00"),
        ("purchase", "11:20:00"),
    ]:
        lines.append(_event(i, "C", etype, f"2024-01-01 {t}")); i += 1

    src = tmp_path / "in"
    os.makedirs(src)
    (src / "part-0.jsonl").write_text("\n".join(lines))

    events = read_event_stream_json(spark, str(src))
    q = (
        # drain mode: no processing-time timeout — with one registered,
        # availableNow keeps scheduling timeout-check batches and the
        # query never terminates (it used to burn the full 120 s here and
        # leak an active query into the rest of the suite)
        funnel_detect_stream(events, stale_timeout_ms=None)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("funnels")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive  # drained and terminated, not timed out
    rows = spark.table("funnels").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == {"A", "C"}
    assert len(by_user["A"]) == 1 and by_user["A"][0].duration_s == 600.0
    assert len(by_user["C"]) == 2
    assert sorted(r.duration_s for r in by_user["C"]) == [1200.0, 2700.0]


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    """StatefulProcessorHandle stand-in: records the TTL the processor
    asks for and hands back an in-memory ValueState."""

    def __init__(self):
        self.states = {}
        self.ttls = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttls[name] = ttlDurationMs
        return self.states.setdefault(name, _FakeValueState())


def test_tws_processor_state_machine():
    """FunnelProcessor (transformWithState form) matches the
    applyInPandasWithState semantics: ordered matching, repeat
    conversions, state carried across batches, TTL requested."""
    import pandas as pd

    from data_pipeline_zeal_spark.streaming.funnel import FunnelProcessor

    proc = FunnelProcessor(("page_view", "add_to_cart", "purchase"), 5000)
    handle = _FakeHandle()
    proc.init(handle)
    assert handle.ttls == {"funnel": 5000}

    def batch(rows):
        return pd.DataFrame(rows, columns=["timestamp", "event_type"])

    # batch 1: user completes steps 1-2; no emission, state mid-funnel
    out = list(
        proc.handleInputRows(
            ("A",),
            iter([batch([
                (pd.Timestamp("2024-01-01 10:00:00"), "page_view"),
                (pd.Timestamp("2024-01-01 10:02:00"), "purchase"),  # skipped
                (pd.Timestamp("2024-01-01 10:05:00"), "add_to_cart"),
            ])]),
            None,
        )
    )
    assert out == []
    idx, started_us = handle.states["funnel"].get()
    assert idx == 2
    assert started_us == int(pd.Timestamp("2024-01-01 10:00:00").value // 1000)

    # batch 2: completion + a second full funnel
    out = list(
        proc.handleInputRows(
            ("A",),
            iter([batch([
                (pd.Timestamp("2024-01-01 10:10:00"), "purchase"),
                (pd.Timestamp("2024-01-01 11:00:00"), "page_view"),
                (pd.Timestamp("2024-01-01 11:10:00"), "add_to_cart"),
                (pd.Timestamp("2024-01-01 11:30:00"), "purchase"),
            ])]),
            None,
        )
    )
    assert len(out) == 1
    emitted = list(out[0].itertuples(index=False))
    assert [(r.user_id, r.duration_s) for r in emitted] == [("A", 600.0), ("A", 1800.0)]
    assert handle.states["funnel"].get() == (0, 0)


def _has_protobuf():
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="PySpark's transformWithState state client requires protobuf "
    "(not installed in this sandbox)",
)
def test_streaming_funnel_tws_matches_applyinpandas(spark, tmp_path):
    """The transformWithState form emits the same conversions as the
    applyInPandasWithState form on the same input (RocksDB provider is a
    hard requirement of the TWS operator)."""
    from data_pipeline_zeal_spark.streaming.funnel import funnel_detect_stream_tws

    lines = []
    i = 0
    for etype, t in [
        ("page_view", "10:00:00"),
        ("add_to_cart", "10:05:00"),
        ("purchase", "10:10:00"),
        ("page_view", "10:20:00"),
    ]:
        lines.append(_event(i, "A", etype, f"2024-01-01 {t}")); i += 1
    for etype, t in [
        ("page_view", "09:00:00"),
        ("purchase", "09:01:00"),
        ("add_to_cart", "09:30:00"),
        ("purchase", "09:45:00"),
    ]:
        lines.append(_event(i, "C", etype, f"2024-01-01 {t}")); i += 1

    src = tmp_path / "in"
    os.makedirs(src)
    (src / "part-0.jsonl").write_text("\n".join(lines))

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events = read_event_stream_json(spark, str(src))
        q = (
            funnel_detect_stream_tws(events)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("funnels_tws")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    rows = spark.table("funnels_tws").collect()
    got = {(r.user_id, r.duration_s) for r in rows}
    assert got == {("A", 600.0), ("C", 2700.0)}


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the state machine."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self.removed = True
        self._v = None

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_funnel_fn_timeout_drops_state():
    """On processing-time timeout the key's state is removed (bounds total
    state by active users) and nothing is emitted."""
    import pandas as pd

    from data_pipeline_zeal_spark.streaming.funnel import _funnel_fn

    fn = _funnel_fn(("a", "b"), stale_timeout_ms=1000)
    st = _FakeState(value=(1, 123), timed_out=True)
    out = list(fn(("u1",), iter([]), st))
    assert out == [] and st.removed


def test_funnel_fn_sets_timeout_after_update():
    import pandas as pd

    from data_pipeline_zeal_spark.streaming.funnel import _funnel_fn

    fn = _funnel_fn(("a", "b"), stale_timeout_ms=5000)
    st = _FakeState()
    pdf = pd.DataFrame(
        {"timestamp": [pd.Timestamp("2024-01-01 10:00:00")], "event_type": ["a"]}
    )
    list(fn(("u1",), iter([pdf]), st))
    assert st.get == (1, int(pd.Timestamp("2024-01-01 10:00:00").value // 1000))
    assert st.timeout_set == 5000


def test_batch_funnel_matches_manual(spark):
    import datetime

    T = datetime.datetime.fromisoformat
    rows = [
        ("u1", T("2024-01-01 09:00:00"), "view"),
        ("u1", T("2024-01-01 09:10:00"), "click"),
        ("u1", T("2024-01-01 09:20:00"), "purchase"),
        ("u2", T("2024-01-01 09:00:00"), "click"),  # click before view
        ("u2", T("2024-01-01 09:30:00"), "view"),
        ("u2", T("2024-01-01 09:40:00"), "purchase"),  # purchase before click'
        ("u3", T("2024-01-01 08:00:00"), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    got = {r.user_id: r for r in funnel_conversions_batch(ev).collect()}
    assert set(got) == {"u1"}
    assert got["u1"].duration_s == 1200.0


def test_funnel_step_rates_hand_computed(spark):
    """3 users enter, 2 click after viewing, 1 purchases after clicking —
    rates 1.0 / 0.667 / 0.5, entry-rates 1.0 / 0.667 / 0.333."""
    import datetime

    from data_pipeline_zeal_spark.streaming.funnel import funnel_step_rates

    T0 = datetime.datetime(2024, 1, 1, 10, 0, 0)

    def ev(u, t, off):
        return (u, T0 + datetime.timedelta(minutes=off), t)

    events = spark.createDataFrame(
        [
            ev("a", "view", 0), ev("a", "click", 1), ev("a", "purchase", 2),
            ev("b", "view", 0), ev("b", "click", 3),
            ev("c", "view", 0),
            ev("d", "click", 0),  # clicked without viewing: not in funnel
        ],
        "user_id string, ts timestamp, event_type string",
    )
    rows = {r.step_index: r for r in funnel_step_rates(events).collect()}
    assert [rows[i].n_users for i in (1, 2, 3)] == [3, 2, 1]
    assert rows[1].rate_vs_prev == 1.0 and rows[1].rate_vs_entry == 1.0
    assert rows[2].rate_vs_prev == 0.666667
    assert rows[3].rate_vs_prev == 0.5 and rows[3].rate_vs_entry == 0.333333


def test_funnel_step_rates_zero_denominator(spark):
    """An upstream step with zero users yields 0.0 conversion (not NULL
    from Spark's x/0, not inf/NaN) — the explicitly-pinned semantics."""
    import datetime

    from data_pipeline_zeal_spark.streaming.funnel import funnel_step_rates

    T0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    # nobody views: every step downstream of entry has 0 users
    events = spark.createDataFrame(
        [("d", T0, "click"), ("e", T0, "purchase")],
        "user_id string, ts timestamp, event_type string",
    )
    rows = {r.step_index: r for r in funnel_step_rates(events).collect()}
    assert [rows[i].n_users for i in (1, 2, 3)] == [0, 0, 0]
    assert rows[1].rate_vs_prev == 1.0  # entry step: defined as 1.0
    assert rows[2].rate_vs_prev == 0.0 and rows[3].rate_vs_prev == 0.0
    assert rows[1].rate_vs_entry == 0.0  # 0/0 pinned to 0.0, not NULL
    assert rows[2].rate_vs_entry == 0.0 and rows[3].rate_vs_entry == 0.0
