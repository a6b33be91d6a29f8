"""Observability surface (reference S10 / A11, Spark-native).

The reference exposes pipeline health as Prometheus counters/gauges set by
hand throughout the processor (``aggregation_service.py:15-50,113-136``) and
then *scrapes its own metrics text* to serve ``/api/pipeline/memory``
(``pipeline_status.py:70-119``).  Spark already emits every one of those
signals in ``StreamingQueryProgress``; this listener just accumulates them
into a queryable snapshot — counters for rows/batches/errors, gauges for
state size and watermark — with no metrics-text round-trip.
"""

from __future__ import annotations

import threading
from typing import Any

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Accumulates per-query throughput/state metrics from progress events.

    Register with ``spark.streams.addListener(listener)``; read
    ``listener.snapshot()`` from any thread (the reference's admin/API
    surface), or export to a metrics registry from ``onQueryProgress``."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._queries: dict[str, dict[str, Any]] = {}

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._queries[str(event.id)] = {
                "name": event.name,
                "batches": 0,
                "total_input_rows": 0,
                "last_input_rows_per_second": 0.0,
                "last_batch_duration_ms": None,
                "state_rows": None,
                "rows_dropped_by_watermark": 0,
                "watermark": None,
                "terminated": False,
                "exception": None,
            }

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            m = self._queries.setdefault(str(p.id), {"name": p.name})
            m["batches"] = m.get("batches", 0) + 1
            m["total_input_rows"] = (
                m.get("total_input_rows", 0) + (p.numInputRows or 0)
            )
            m["last_input_rows_per_second"] = p.inputRowsPerSecond
            m["last_batch_duration_ms"] = (p.durationMs or {}).get("triggerExecution")
            ops = p.stateOperators or []
            m["state_rows"] = ops[0].numRowsTotal if ops else None
            # late-data accounting: rows the watermark silently discarded —
            # THE metric that distinguishes "no traffic" from "traffic too
            # late"; summed across batches and operators so the admin
            # surface can alert on it
            m["rows_dropped_by_watermark"] = m.get(
                "rows_dropped_by_watermark", 0
            ) + sum(
                (getattr(op, "numRowsDroppedByWatermark", 0) or 0)
                for op in ops
            )
            m["watermark"] = (p.eventTime or {}).get("watermark")

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            m = self._queries.setdefault(str(event.id), {})
            m["terminated"] = True
            m["exception"] = event.exception

    def onQueryIdle(self, event) -> None:  # pragma: no cover - no-op
        pass

    # -- read side ----------------------------------------------------------
    def snapshot(self) -> dict[str, dict[str, Any]]:
        with self._lock:
            return {k: dict(v) for k, v in self._queries.items()}


def render_prometheus(snapshot: dict[str, dict[str, Any]]) -> str:
    """Prometheus text exposition of a :meth:`MetricsListener.snapshot` —
    the reference's ``/metrics`` endpoint surface (S10; it hand-maintains
    ``events_processed_total`` etc., ``aggregation_service.py:15-50``).
    Serve the returned string with any HTTP handler."""
    metrics = [
        ("pipeline_batches_total", "counter", "batches"),
        ("pipeline_input_rows_total", "counter", "total_input_rows"),
        (
            "pipeline_input_rows_per_second",
            "gauge",
            "last_input_rows_per_second",
        ),
        ("pipeline_batch_duration_ms", "gauge", "last_batch_duration_ms"),
        ("pipeline_state_rows", "gauge", "state_rows"),
        (
            "pipeline_rows_dropped_by_watermark_total",
            "counter",
            "rows_dropped_by_watermark",
        ),
    ]
    lines: list[str] = []
    for metric, kind, key in metrics:
        lines.append(f"# TYPE {metric} {kind}")
        for qid, m in sorted(snapshot.items()):
            v = m.get(key)
            if v is None:
                continue
            name = (m.get("name") or "unnamed").replace('"', "'")
            lines.append(f'{metric}{{query="{name}",id="{qid}"}} {v}')
    return "\n".join(lines) + "\n"


def parse_prometheus_text(
    text: str, metric: str, labels: dict[str, str] | None = None
) -> dict[tuple[tuple[str, str], ...], float]:
    """Parse one metric family out of Prometheus text exposition — the
    read side the reference's status endpoint implements by scraping its
    own ``/metrics`` (``pipeline_status.py:29-63``).  Returns
    {sorted-label-tuple: value} for every sample of ``metric`` whose
    labels are a superset of ``labels``.  Round-trips
    :func:`render_prometheus` exactly, and accepts the general format
    (HELP/TYPE comments, label-less samples, escaped quotes)."""
    want = dict(labels or {})
    out: dict[tuple[tuple[str, str], ...], float] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        name_part, _, rest = line.partition("{")
        if rest:  # labeled sample: metric{k="v",...} value [timestamp]
            if name_part != metric:
                continue
            label_str, _, value_str = rest.rpartition("}")
            sample: dict[str, str] = {}
            for item in filter(None, _split_labels(label_str)):
                k, _, v = item.partition("=")
                sample[k.strip()] = v.strip().strip('"').replace("\\\"", '"')
        else:  # label-less: "metric value [timestamp]"
            parts = line.split()
            if len(parts) < 2 or parts[0] != metric:
                continue
            sample, value_str = {}, parts[1]
        # The exposition format allows an optional trailing timestamp after
        # the value — the value is always the FIRST field.
        fields = value_str.split()
        if not fields:
            continue
        value_str = fields[0]
        if any(sample.get(k) != v for k, v in want.items()):
            continue
        try:
            value = float(value_str.strip())
        except ValueError:
            continue
        out[tuple(sorted(sample.items()))] = value
    return out


def _split_labels(label_str: str) -> list[str]:
    """Split a Prometheus label body on commas OUTSIDE quoted values."""
    items, buf, in_quotes, escaped = [], [], False, False
    for ch in label_str:
        if escaped:
            buf.append(ch)
            escaped = False
        elif ch == "\\":
            buf.append(ch)
            escaped = True
        elif ch == '"':
            in_quotes = not in_quotes
            buf.append(ch)
        elif ch == "," and not in_quotes:
            items.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        items.append("".join(buf))
    return items
