"""CLI surface tests (``python -m data_pipeline_zeal_spark``)."""

from __future__ import annotations

import json
import subprocess
import sys

from data_pipeline_zeal_spark.__main__ import build_parser, cmd_list


def test_list_names_every_query_without_spark(capsys):
    assert cmd_list(None) == 0
    out = capsys.readouterr().out.strip().splitlines()
    import __spark_entry__ as em

    assert len(out) == len(em.queries())
    kinds = {line.split()[-1] for line in out}
    # since round 9 every registered query is oracle-backed (the last
    # rows-only multimodal stubs gained spec-derived DuckDB oracles), so
    # "rows-only" must never reappear in the listing
    assert kinds == {"oracle"}


def test_parser_rejects_unknown_command():
    import pytest

    with pytest.raises(SystemExit):
        build_parser().parse_args(["frobnicate"])


def test_query_subcommand_end_to_end():
    """Full subprocess run: own SparkSession, JSONL rows on stdout."""
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "data_pipeline_zeal_spark",
            "query",
            "agg_event_types",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--json",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(line) for line in proc.stdout.strip().splitlines()]
    assert {r["event_type"] for r in rows} == {
        "click", "error", "purchase", "signup", "view",
    }


def test_query_subcommand_unknown_name_fails_fast():
    proc = subprocess.run(
        [sys.executable, "-m", "data_pipeline_zeal_spark", "query", "nope"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd="/root/repo",
    )
    assert proc.returncode == 2
    assert "unknown query" in proc.stderr


def test_query_api_server_routes(spark):
    """Reference REST contract end-to-end: envelope shape, filters,
    pagination bounds (422 on violation), stats and event-type routes."""
    import json as _json
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from data_pipeline_zeal_spark.api_http import QueryApiServer
    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators.hourly import aggregate_events
    from tests.conftest import SF_SMALL

    agg = aggregate_events(load_table(spark, SF_SMALL, "events")).cache()
    srv = QueryApiServer(agg).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urlopen(f"{base}/health", timeout=10) as r:
            assert _json.loads(r.read()) == {"status": "healthy"}

        with urlopen(f"{base}/api/aggregations?limit=5", timeout=60) as r:
            body = _json.loads(r.read())
        assert body["count"] == 5 == len(body["records"])
        rec = body["records"][0]
        assert {"window_start", "event_type", "event_count"} <= set(rec)

        et = rec["event_type"]
        with urlopen(
            f"{base}/api/aggregations?event_type={et}&limit=3", timeout=60
        ) as r:
            filtered = _json.loads(r.read())
        assert all(x["event_type"] == et for x in filtered["records"])

        with urlopen(f"{base}/api/aggregations/latest?limit=2", timeout=60) as r:
            assert _json.loads(r.read())["count"] == 2

        with urlopen(f"{base}/api/aggregations/stats", timeout=60) as r:
            stats = _json.loads(r.read())
        assert stats["count"] >= 1 and "total_events" in stats["records"][0]

        with urlopen(f"{base}/api/aggregations/event-types", timeout=60) as r:
            types = _json.loads(r.read())
        assert sorted(x["event_type"] for x in types["records"]) == [
            x["event_type"] for x in types["records"]
        ]

        try:
            urlopen(f"{base}/api/aggregations?limit=5000", timeout=60)
            raise AssertionError("expected 422")
        except HTTPError as e:
            assert e.code == 422

        # unparseable datetime params are a 422 validation error (reference
        # FastAPI contract), not a 500 from the Spark filter
        try:
            urlopen(
                f"{base}/api/aggregations?from_time=not-a-date", timeout=60
            )
            raise AssertionError("expected 422")
        except HTTPError as e:
            assert e.code == 422

        # a valid ISO datetime (with a FastAPI-style trailing Z) still flows
        # through to the range filter
        with urlopen(
            f"{base}/api/aggregations?from_time=2020-01-01T00:00:00Z&limit=3",
            timeout=60,
        ) as r:
            assert _json.loads(r.read())["count"] >= 0
    finally:
        srv.stop()
        agg.unpersist()


def test_cli_serve_smoke(spark):
    from data_pipeline_zeal_spark.__main__ import main
    from tests.conftest import SF_SMALL

    assert main(["serve", "--sf-dir", SF_SMALL, "--smoke"]) == 0
