"""MetricsListener captures progress from a real streaming query."""

from __future__ import annotations

import json
import os

from data_pipeline_zeal_spark.streaming.observability import MetricsListener
from data_pipeline_zeal_spark.streaming.pipeline import (
    ParquetUpsertSink,
    read_event_stream_json,
    start_pipeline,
)


def test_metrics_listener_accumulates(spark, tmp_path):
    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        os.makedirs(f"{tmp_path}/in")
        lines = [
            json.dumps(
                {
                    "event_id": f"e{i}",
                    "user_id": "u1",
                    "event_type": "click",
                    "timestamp": "2024-01-01 10:00:00",
                    "session_id": "s1",
                    "page_url": None,
                    "duration_ms": None,
                    "metadata": None,
                }
            )
            for i in range(25)
        ]
        (tmp_path / "in" / "p0.jsonl").write_text("\n".join(lines))
        sink = ParquetUpsertSink(f"{tmp_path}/agg")
        q = start_pipeline(
            read_event_stream_json(spark, f"{tmp_path}/in"),
            sink,
            f"{tmp_path}/ckpt",
            available_now=True,
            query_name="obs-test",
        )
        q.awaitTermination(120)
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            snap = listener.snapshot()
            m = next(
                (v for v in snap.values() if v.get("name") == "obs-test"), None
            )
            if m and m.get("terminated") and m.get("total_input_rows", 0) >= 25:
                break
            time.sleep(0.5)
        assert m is not None
        assert m["total_input_rows"] == 25
        assert m["batches"] >= 1
        assert m["terminated"] is True
        assert m["exception"] is None
    finally:
        spark.streams.removeListener(listener)


def test_render_prometheus_text():
    from data_pipeline_zeal_spark.streaming.observability import render_prometheus

    snap = {
        "q1": {
            "name": "hourly-aggregation",
            "batches": 3,
            "total_input_rows": 120,
            "last_input_rows_per_second": 40.0,
            "last_batch_duration_ms": 250,
            "state_rows": 20,
        },
        "q2": {"name": None, "batches": 1, "total_input_rows": 5},
    }
    text = render_prometheus(snap)
    assert "# TYPE pipeline_batches_total counter" in text
    assert 'pipeline_batches_total{query="hourly-aggregation",id="q1"} 3' in text
    assert 'pipeline_input_rows_total{query="unnamed",id="q2"} 5' in text
    # absent gauges are skipped, not rendered as None
    assert "None" not in text


def test_prometheus_text_round_trip():
    """render -> parse recovers every sample; label filters select."""
    from data_pipeline_zeal_spark.streaming.observability import (
        parse_prometheus_text,
        render_prometheus,
    )

    snap = {
        "q1": {"name": "hourly", "batches": 7, "total_input_rows": 120,
               "last_input_rows_per_second": 3.5,
               "last_batch_duration_ms": 90, "state_rows": 4},
        "q2": {"name": "funnel", "batches": 2, "total_input_rows": 10,
               "last_input_rows_per_second": 1.0,
               "last_batch_duration_ms": 5, "state_rows": 1},
    }
    text = render_prometheus(snap)
    got = parse_prometheus_text(text, "pipeline_batches_total")
    assert len(got) == 2 and set(got.values()) == {7.0, 2.0}
    only_q1 = parse_prometheus_text(
        text, "pipeline_input_rows_total", labels={"query": "hourly"}
    )
    assert list(only_q1.values()) == [120.0]


def test_prometheus_parser_general_format():
    from data_pipeline_zeal_spark.streaming.observability import (
        parse_prometheus_text,
    )

    text = """# HELP up Whether the target is up
# TYPE up gauge
up 1
requests_total{path="/a,b",method="GET"} 10
requests_total{path="/x",method="POST"} 2.5
junk_line_without_value
requests_total{path="/x",method="POST"} not_a_number
"""
    assert parse_prometheus_text(text, "up") == {(): 1.0}
    by_path = parse_prometheus_text(text, "requests_total", {"method": "GET"})
    assert list(by_path.values()) == [10.0]
    # the comma inside a quoted label value must not split the label list
    [(labels, v)] = by_path.items()
    assert dict(labels)["path"] == "/a,b"


def test_prometheus_parser_optional_timestamps():
    """The exposition format allows an optional trailing timestamp after
    the value; the value is the FIRST field after the metric/labels — a
    parser that takes the last field returns the timestamp instead, and
    one that float()s the whole remainder drops labeled samples."""
    from data_pipeline_zeal_spark.streaming.observability import (
        parse_prometheus_text,
    )

    text = """up 5 1700000000
requests_total{method="GET"} 10 1700000001
requests_total{method="POST"} 2.5
"""
    assert parse_prometheus_text(text, "up") == {(): 5.0}
    got = parse_prometheus_text(text, "requests_total")
    assert sorted(got.values()) == [2.5, 10.0]


def test_admin_server_routes():
    """The reference admin surface: /admin/health, /admin/status (GET),
    /admin/flush (POST), 404 otherwise — served over live callbacks."""
    import json as _json
    from urllib.error import HTTPError
    from urllib.request import Request, urlopen

    from data_pipeline_zeal_spark.streaming.admin import AdminServer

    flushed = []

    def status():
        return {"active": True, "batches": 3}

    def flush():
        flushed.append(1)
        return {"flushed": True}

    srv = AdminServer(status, flush).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urlopen(f"{base}/admin/health", timeout=5) as r:
            assert _json.loads(r.read()) == {"status": "healthy"}
        with urlopen(f"{base}/admin/status", timeout=5) as r:
            assert _json.loads(r.read())["batches"] == 3
        req = Request(f"{base}/admin/flush", data=b"", method="POST")
        with urlopen(req, timeout=5) as r:
            assert _json.loads(r.read()) == {"flushed": True}
        assert flushed == [1]
        try:
            urlopen(f"{base}/admin/nope", timeout=5)
            raise AssertionError("expected 404")
        except HTTPError as e:
            assert e.code == 404
    finally:
        srv.stop()


def test_listener_accumulates_watermark_drops():
    """rows_dropped_by_watermark sums numRowsDroppedByWatermark across
    batches and state operators.  (Spark populates that field when late
    rows reach a stateful operator — stream-stream joins,
    flatMapGroupsWithState; plain aggregations filter late rows at the
    EventTimeWatermark node instead, where they are invisible to state
    metrics — so the listener's job is faithful accumulation, pinned
    here with stub progress events.)"""

    class _Op:
        def __init__(self, dropped, total=5):
            self.numRowsTotal = total
            self.numRowsDroppedByWatermark = dropped

    class _Progress:
        def __init__(self, qid, ops):
            self.id = qid
            self.name = "stub"
            self.numInputRows = 10
            self.inputRowsPerSecond = 1.0
            self.durationMs = {"triggerExecution": 5}
            self.stateOperators = ops
            self.eventTime = {"watermark": "2024-01-01T00:00:00Z"}

    class _Event:
        def __init__(self, progress):
            self.progress = progress

    listener = MetricsListener()
    listener.onQueryProgress(_Event(_Progress("q", [_Op(3), _Op(2)])))
    listener.onQueryProgress(_Event(_Progress("q", [_Op(4)])))
    snap = listener.snapshot()
    assert snap["q"]["rows_dropped_by_watermark"] == 9
    # operators that lack the field (older Spark) contribute 0, not a crash
    class _Bare:
        numRowsTotal = 1
    listener.onQueryProgress(_Event(_Progress("q", [_Bare()])))
    assert listener.snapshot()["q"]["rows_dropped_by_watermark"] == 9
