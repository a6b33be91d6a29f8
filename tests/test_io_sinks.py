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


def test_load_csv_events_drops_malformed_and_counts_corrupt(spark, tmp_path):
    header = "event_id,user_id,event_type,timestamp,session_id,page_url,duration_ms,metadata"
    lines = [
        header,
        "e1,u1,page_view,2024-01-01T10:00:00,s1,/home,100,",
        "e2,u2,click,not-a-timestamp,s2,/cart,50,",     # bad timestamp
        "e3,u3,purchase,2024-01-01T11:00:00,s3,/checkout,not-a-long,",  # bad long
        ",u4,page_view,2024-01-01T12:00:00,s4,/home,10,",  # missing required id
    ]
    p = tmp_path / "csv"
    p.mkdir()
    (p / "part-0.csv").write_text("\n".join(lines))

    from data_pipeline_zeal_spark.io import load_csv_events

    out = load_csv_events(spark, str(p))
    rows = out.collect()
    assert [r.event_id for r in rows] == ["e1"]
    assert "_corrupt_record" not in out.columns

    raw = load_csv_events(spark, str(p), keep_corrupt=True)
    # corrupt detection happens at parse time, and the CSV parser only
    # parses projected columns — materialize the full rows (as a real
    # quarantine pass would) before inspecting _corrupt_record
    bad = [r for r in raw.collect() if r["_corrupt_record"] is not None]
    assert len(bad) == 2  # two unparseable lines, not the null-field one


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from data_pipeline_zeal_spark.io import compact_parquet

    path = str(tmp_path / "t")
    # write deliberately fragmented: 32 partitions of a small frame
    spark.range(0, 10_000).withColumnRenamed("id", "k").repartition(
        32
    ).write.parquet(path)
    # materialize the pre-compaction content: the swap deletes the files
    # a lazy frame would re-read
    before = sorted(r.k for r in spark.read.parquet(path).collect())
    stats = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["files_before"] >= 32
    assert stats["files_after"] == stats["partitions"] == 1
    after = sorted(r.k for r in spark.read.parquet(path).collect())
    assert after == before  # content identical


def test_compact_parquet_empty_dir(spark, tmp_path):
    from data_pipeline_zeal_spark.io import compact_parquet

    d = tmp_path / "empty"
    d.mkdir()
    assert compact_parquet(spark, str(d))["files_before"] == 0


def test_compact_parquet_preserves_partitions(spark, tmp_path):
    from data_pipeline_zeal_spark.io import compact_parquet

    path = str(tmp_path / "pt")
    df = spark.range(0, 1000).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS day")
    df.repartition(8).write.partitionBy("day").parquet(path)
    before = sorted((r.k, r.day) for r in spark.read.parquet(path).collect())
    stats = compact_parquet(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert stats["partitions"] == 3  # one output file budget per leaf
    # hive layout intact: the day=N directories survive
    import os

    subdirs = sorted(
        d for d in os.listdir(path) if d.startswith("day=")
    )
    assert subdirs == ["day=0", "day=1", "day=2"]
    after = sorted((r.k, r.day) for r in spark.read.parquet(path).collect())
    assert after == before


def test_compact_parquet_crash_recovery(spark, tmp_path):
    import os

    from data_pipeline_zeal_spark.io import compact_parquet

    path = str(tmp_path / "t2")
    spark.range(0, 100).withColumnRenamed("id", "k").repartition(4).write.parquet(
        path
    )
    rows = sorted(r.k for r in spark.read.parquet(path).collect())
    # simulate a crash between the two renames: live dir gone, old present
    os.rename(path, f"{path}.__compact_old")
    stats = compact_parquet(spark, path)
    assert stats["files_before"] == 4 and stats["files_after"] == 1
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == rows


def test_compact_parquet_nested_leaf_survives(spark, tmp_path):
    from data_pipeline_zeal_spark.io import compact_parquet

    path = str(tmp_path / "mix")
    spark.range(0, 50).withColumnRenamed("id", "k").repartition(4).write.parquet(
        path
    )
    spark.range(100, 150).withColumnRenamed("id", "k").repartition(
        4
    ).write.parquet(path + "/nested")
    stats = compact_parquet(spark, path)
    # both leaves compacted independently; the nested one is NOT destroyed
    assert stats["partitions"] == 2
    root_rows = sorted(r.k for r in spark.read.parquet(path).collect())
    nested_rows = sorted(r.k for r in spark.read.parquet(path + "/nested").collect())
    assert nested_rows == list(range(100, 150))
    # the root read picks up only its own files plus nested per normal
    # spark semantics; the nested leaf's own rows must all survive
    assert set(range(100, 150)) <= set(root_rows) | set(nested_rows)


def test_compact_recovery_is_scoped_to_the_table(spark, tmp_path):
    import os

    from data_pipeline_zeal_spark.io import compact_parquet

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for p in (a, b):
        spark.range(0, 20).withColumnRenamed("id", "k").repartition(2).write.parquet(p)
    # a sibling table's in-flight staging dir must NOT be touched when
    # compacting a different table under the same parent
    os.makedirs(f"{a}.__compact_tmp/partial")
    compact_parquet(spark, b)
    assert os.path.isdir(f"{a}.__compact_tmp/partial")
    os.rmdir(f"{a}.__compact_tmp/partial"); os.rmdir(f"{a}.__compact_tmp")


def test_write_training_shards_deterministic_and_ordered(spark, tmp_path):
    """Shard export: every shard directory exists, rows inside each shard
    are stored in shuffle-position order, the assignment matches
    corpus.shuffle_shards, and a second export is byte-identical in
    content (reproducible shuffle)."""
    from data_pipeline_zeal_spark.io import load_table, write_training_shards
    from data_pipeline_zeal_spark.operators.corpus import shuffle_shards
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    want = {
        r.doc_id: (r.shard, r.position)
        for r in shuffle_shards(docs, n_shards=4).collect()
    }
    got = {r.doc_id: (r.shard, r.position) for r in back.collect()}
    assert got == want

    import glob
    import pyarrow.parquet as pq

    for shard_dir in sorted(glob.glob(f"{out}/shard=*")):
        files = sorted(glob.glob(f"{shard_dir}/*.parquet"))
        positions = []
        for f in files:
            positions.extend(pq.read_table(f, columns=["position"])["position"].to_pylist())
        assert positions == sorted(positions)  # stored in read order
        assert positions[0] == 0  # dense from zero within the shard

    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, n_shards=4)
    again = {
        r.doc_id: (r.shard, r.position)
        for r in spark.read.parquet(out2).collect()
    }
    assert again == got


def test_read_evolved_merges_and_backfills(spark, tmp_path):
    """mergeSchema unions footers across writer generations (old files
    yield NULL for later columns) and `expected` backfills a typed column
    no file carries yet."""
    from data_pipeline_zeal_spark.io import read_evolved

    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        path + "/gen=1"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(path + "/gen=2")

    df = read_evolved(spark, path, expected=["flags:int"])
    rows = {r.id: r for r in df.collect()}
    assert set(df.columns) >= {"id", "name", "score", "flags"}
    assert rows[1].score is None and rows[2].score == 9.5
    assert rows[1].flags is None and rows[2].flags is None
    assert dict(df.dtypes)["flags"] == "int"
