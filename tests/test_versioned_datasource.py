"""The zeal_versioned Python DataSource: batch snapshot reads with
stats-pruned planning, and the streaming reader whose offsets are commit
versions (checkpoint-resumed, exactly-once)."""

from __future__ import annotations

import os

import pytest

from data_pipeline_zeal_spark.sources import versioned as V
from data_pipeline_zeal_spark.sources import versioned_datasource as DS


@pytest.fixture()
def registered(spark):
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", None)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    DS.register(spark)
    yield spark
    if old is None:
        spark.conf.unset("spark.sql.python.filterPushdown.enabled")
    else:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def _table(spark, tmp_path) -> str:
    t = str(tmp_path / "tbl")
    V.commit_write(
        _df(spark, 0, 100).repartitionByRange(2, "id").sortWithinPartitions("id"),
        t,
        mode="overwrite",
    )
    V.commit_write(
        _df(spark, 100, 200).repartitionByRange(2, "id").sortWithinPartitions("id"),
        t,
        mode="append",
    )
    return t


def test_batch_read_matches_read_version(registered, tmp_path):
    spark = registered
    t = _table(spark, tmp_path)
    got = spark.read.format("zeal_versioned").option("path", t).load()
    assert sorted(r.id for r in got.collect()) == list(range(200))
    # same names and types; nullability may differ (arrow footers carry
    # exact nullability, Spark's parquet reader reports everything
    # nullable)
    want = V.read_version(spark, t).schema
    assert [(f.name, f.dataType) for f in got.schema.fields] == [
        (f.name, f.dataType) for f in want.fields
    ]
    # time travel through the same option surface
    v1 = (
        spark.read.format("zeal_versioned")
        .option("path", t)
        .option("version", 1)
        .load()
    )
    assert v1.count() == 100


def test_batch_filter_pushdown_prunes_files(registered, tmp_path):
    """Catalyst filters reach pushFilters and shrink the PLANNED input
    partitions via the commit stats — fewer tasks, same rows."""
    spark = registered
    t = _table(spark, tmp_path)
    base = spark.read.format("zeal_versioned").option("path", t).load()
    assert base.rdd.getNumPartitions() == 4  # 2 commits x 2 files
    filtered = base.filter("id >= 150")
    assert filtered.rdd.getNumPartitions() == 1  # one file survives
    assert sorted(r.id for r in filtered.collect()) == list(range(150, 200))
    # residual filters still run row-by-row: a predicate the stats keep
    # conservatively must still filter exactly
    odd = base.filter("id >= 99").filter("v <= 200")
    assert sorted(r.id for r in odd.collect()) == [99, 100]


def test_stream_versions_are_offsets_with_restart(registered, tmp_path):
    """availableNow drain, then new commits, then a restart on the SAME
    checkpoint: only the new commits' rows append — the checkpointed
    version offset gives exactly-once consumption."""
    spark = registered
    t = _table(spark, tmp_path)
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("zeal_versioned")
            .option("path", t)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 200
    V.commit_write(_df(spark, 200, 230), t, mode="append")
    V.commit_write(_df(spark, 230, 240), t, mode="append")
    drain()  # restart on the SAME checkpoint: only versions 3-4 flow
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(240))  # no duplicates, nothing missed
    # a third drain with no new commits is a no-op
    drain()
    assert spark.read.parquet(out).count() == 240


def test_stream_overwrite_fails_loudly_unless_skipped(registered, tmp_path):
    spark = registered
    t = _table(spark, tmp_path)
    V.compact(spark, t)  # version 3: overwrite
    V.commit_write(_df(spark, 200, 210), t, mode="append")  # version 4
    ckpt = str(tmp_path / "ck")
    q = (
        spark.readStream.format("zeal_versioned")
        .option("path", t)
        .load()
        .writeStream.format("memory")
        .queryName("vds_fail")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="not[ _]?consumable|overwrite"):
        q.awaitTermination(120)
        raise AssertionError("stream over an overwrite must fail")
    # with skipChangeCommits the rewrite is passed over: appends flow
    q2 = (
        spark.readStream.format("zeal_versioned")
        .option("path", t)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.format("memory")
        .queryName("vds_skip")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = sorted(r.id for r in spark.table("vds_skip").collect())
    assert got == list(range(0, 210))  # v1+v2 appends + v4 append


def test_batch_write_commits_atomically_with_stats(registered, tmp_path):
    """df.write.format('zeal_versioned'): task files stage invisibly,
    the job commit publishes ONE log entry carrying per-file stats
    computed inline by the tasks (no read-back job), and the result
    round-trips through every reader path."""
    spark = registered
    t = str(tmp_path / "tbl")
    (
        _df(spark, 0, 100)
        .repartitionByRange(2, "id")
        .sortWithinPartitions("id")
        .write.format("zeal_versioned")
        .option("path", t)
        .mode("append")
        .save()
    )
    assert V._list_versions(t) == [1]
    entry = V._read_entry(t, 1)
    assert entry["action"] == "append" and entry["n_rows"] == 100
    assert entry["stats"]["id"] == [0, 99]
    assert len(entry["file_stats"]) == 2
    spans = sorted(b["id"] for b in entry["file_stats"].values())
    assert spans[0][0] == 0 and spans[-1][1] == 99
    assert sorted(
        r.id for r in V.read_version(spark, t).collect()
    ) == list(range(100))
    # no leftovers in the task-staging area
    inflight = os.path.join(t, "data", ".inflight")
    assert not os.path.isdir(inflight) or os.listdir(inflight) == []
    # mode("overwrite") resets the live set
    _df(spark, 500, 510).write.format("zeal_versioned").option(
        "path", t
    ).mode("overwrite").save()
    assert V.read_version(spark, t).count() == 10
    assert V.read_version(spark, t, 1).count() == 100  # time travel intact


def test_batch_write_txn_idempotent(registered, tmp_path):
    spark = registered
    t = str(tmp_path / "tbl")
    for _ in range(2):  # orchestrator retry of the same job
        (
            _df(spark, 0, 50)
            .write.format("zeal_versioned")
            .option("path", t)
            .option("txn", "job-42")
            .mode("append")
            .save()
        )
    assert V._list_versions(t) == [1]
    assert V.read_version(spark, t).count() == 50


def test_stream_write_exactly_once(registered, tmp_path):
    """writeStream.format('zeal_versioned'): each micro-batch is one
    atomic commit with txn <prefix>-<batchId>; a second drain over the
    same source data and a FRESH checkpoint replays batch 0 with the
    same txn id — the table must not double-append."""
    spark = registered
    src = str(tmp_path / "src")
    _df(spark, 0, 40).coalesce(1).write.parquet(src)
    t = str(tmp_path / "tbl")

    def drain(ckpt):
        q = (
            spark.readStream.schema("id long, v long")
            .parquet(src)
            .writeStream.format("zeal_versioned")
            .option("path", t)
            .option("txnPrefix", "ingest")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain("ck1")
    assert V.read_version(spark, t).count() == 40
    h1 = V.history(t)
    assert h1[-1]["txn"] == "ingest-0"
    # fresh checkpoint -> Spark replays batch 0; same txn -> no-op
    drain("ck2")
    assert V.read_version(spark, t).count() == 40
    assert len(V.history(t)) == len(h1)
    # the round-trip composes: stream INTO the table, stream OUT of it
    out = (
        spark.readStream.format("zeal_versioned")
        .option("path", t)
        .load()
        .writeStream.format("memory")
        .queryName("vds_roundtrip")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    assert spark.table("vds_roundtrip").count() == 40


def test_append_schema_drift_fails_loudly(registered, tmp_path):
    """Round-7 directive #6: an append carrying a NEW column must fail at
    plan time unless mergeSchema is set; dropped columns and type changes
    fail regardless."""
    spark = registered
    t = str(tmp_path / "tbl")
    _df(spark, 0, 10).write.format("zeal_versioned").option("path", t).mode(
        "append"
    ).save()

    added = spark.range(10, 12).selectExpr("id", "id * 2 AS v", "'x' AS tag")
    with pytest.raises(Exception, match="mergeSchema"):
        added.write.format("zeal_versioned").option("path", t).mode(
            "append"
        ).save()
    # nothing committed, nothing staged
    assert V._list_versions(t) == [1]

    dropped = spark.range(12, 14).selectExpr("id")
    with pytest.raises(Exception, match="incompatible"):
        dropped.write.format("zeal_versioned").option("path", t).mode(
            "append"
        ).save()
    retyped = spark.range(14, 16).selectExpr(
        "id", "CAST(id AS STRING) AS v"
    )
    with pytest.raises(Exception, match="incompatible"):
        retyped.write.format("zeal_versioned").option("path", t).mode(
            "append"
        ).save()
    assert V._list_versions(t) == [1]
    # overwrite replaces the table wholesale — any schema, no option
    dropped.write.format("zeal_versioned").option("path", t).mode(
        "overwrite"
    ).save()
    assert V.read_version(spark, t).columns == ["id"]


def test_append_with_merge_schema_evolves_table(registered, tmp_path):
    """With mergeSchema=true a column-adding append commits; the evolved
    schema surfaces on the next read and pre-evolution files null-fill
    the added column (round-trip through format('zeal_versioned'))."""
    spark = registered
    t = str(tmp_path / "tbl")
    _df(spark, 0, 5).write.format("zeal_versioned").option("path", t).mode(
        "append"
    ).save()
    evolved = spark.range(5, 8).selectExpr("id", "id * 2 AS v", "'x' AS tag")
    evolved.write.format("zeal_versioned").option("path", t).option(
        "mergeSchema", "true"
    ).mode("append").save()
    assert V._list_versions(t) == [1, 2]

    got = spark.read.format("zeal_versioned").option("path", t).load()
    assert got.columns == ["id", "v", "tag"]
    by_id = {r.id: r.tag for r in got.collect()}
    assert len(by_id) == 8
    assert by_id[0] is None and by_id[7] == "x"  # old files null-fill
    # a same-shape append now matches the evolved schema without options
    spark.range(8, 9).selectExpr(
        "id", "id * 2 AS v", "'y' AS tag"
    ).write.format("zeal_versioned").option("path", t).mode("append").save()
    assert (
        spark.read.format("zeal_versioned").option("path", t).load().count()
        == 9
    )


def test_pushed_filter_null_or_odd_literal_never_fails_planning():
    """Round-7 advice: a pushed EqualTo(col, null) or a literal that does
    not compare with the recorded stats must degrade to no-pruning, not
    raise TypeError inside planning."""
    from pyspark.sql.datasource import EqualTo, In

    assert DS._filter_to_predicate(EqualTo(("id",), None)) is None
    assert DS._filter_to_predicate(In(("id",), [None, None])) is None
    # a None mixed into IN prunes on the comparable values only
    assert DS._filter_to_predicate(In(("id",), [None, 5])) == ("id", "in", [5])
    # and the matcher itself keeps the file on any cross-type comparison
    assert V._predicate_may_match([1, 5], "=", None) is True
    assert V._predicate_may_match(["a", "b"], ">", 3) is True
    assert V._predicate_may_match([1, 5], "=", 7) is False  # still prunes
