"""Batch IO surface: partitioned writer layout + wire-format JSONL reader."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import load_wire_events, write_partitioned
from data_pipeline_zeal_spark.sources.generator import generate_events


def test_write_partitioned_layout_and_roundtrip(spark, tmp_path):
    df = generate_events(spark, 5000, num_users=20).withColumn(
        "day", F.to_date("timestamp")
    )
    out = str(tmp_path / "out")
    write_partitioned(df, out, ["day", "event_type"], max_records_per_file=500)
    # hive-style directories exist
    dirs = glob.glob(f"{out}/day=*/event_type=*")
    assert dirs, "expected day=/event_type= partition directories"
    back = spark.read.parquet(out)
    assert back.count() == 5000
    # partition pruning: a day+type filter reads only the matching directory
    one = back.filter(
        (F.col("day") == "2024-01-01") & (F.col("event_type") == "purchase")
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan


def test_load_wire_events_drops_malformed(spark, tmp_path):
    good = {
        "event_id": "e1", "user_id": "u1", "event_type": "page_view",
        "timestamp": "2024-01-01 10:00:00", "session_id": "s1",
        "page_url": "/home", "duration_ms": 100, "metadata": None,
    }
    lines = [json.dumps(good), "{broken", json.dumps({"user_id": "u2"})]
    p = tmp_path / "dump"
    p.mkdir()
    (p / "part-0.jsonl").write_text("\n".join(lines))
    out = load_wire_events(spark, str(p))
    rows = out.collect()
    assert len(rows) == 1 and rows[0].event_id == "e1"
