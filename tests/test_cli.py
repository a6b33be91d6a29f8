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
    assert kinds == {"oracle", "rows-only"}


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
