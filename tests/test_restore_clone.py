"""RESTORE TO VERSION and shallow CLONE (r11): both re-reference live
parquet instead of copying it — restore publishes one multi-dir commit
over the old snapshot's files, clone hard-links them into a new table —
and both carry the source's per-dir stats/Bloom payloads so pruning
granularity survives the metadata operation."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.sources import versioned as V


@pytest.fixture()
def table():
    t = tempfile.mkdtemp(prefix="restore_")
    yield t
    shutil.rmtree(t, ignore_errors=True)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 3).alias("v")
    )


def _parquet_count(root):
    return sum(
        1 for r, _, fs in os.walk(root) for f in fs if f.endswith(".parquet")
    )


def test_restore_is_metadata_only_and_exact(spark, table):
    V.commit_write(_df(spark, 0, 10).coalesce(1), table, mode="append")
    V.commit_write(_df(spark, 10, 20).coalesce(1), table, mode="append")
    want = sorted(tuple(r) for r in V.read_version(spark, table).collect())
    # the bad deploy: an overwrite that clobbers the table
    V.commit_write(_df(spark, 900, 905).coalesce(1), table, mode="overwrite")

    n_files = _parquet_count(table)
    rep = V.restore_table(spark, table, 2, txn="restore-1")
    assert rep["metadata_only"] and rep["restored_from"] == 2
    assert _parquet_count(table) == n_files  # zero data copied
    got = sorted(tuple(r) for r in V.read_version(spark, table).collect())
    assert got == want
    # the bad deploy stays in history (time travel reads it)
    assert V.read_version(spark, table, 3).count() == 5
    # txn idempotency: replay adopts
    n_hist = len(V.history(table))
    V.restore_table(spark, table, 2, txn="restore-1")
    assert len(V.history(table)) == n_hist
    # vacuum keeps every re-referenced dir (reachable from the head)
    V.vacuum(table, retention_seconds=0)
    assert sorted(
        tuple(r) for r in V.read_version(spark, table).collect()
    ) == want


def test_restore_preserves_file_pruning_and_bloom(spark, table):
    df = spark.range(4000).select(F.col("id").alias("k"))
    V.commit_write(
        df.repartition(8, "k"), table, mode="overwrite", bloom_cols=["k"]
    )
    _, kept_before, skipped_before = V.pruned_paths(table, [("k", "=", 2000)])
    V.commit_write(_df(spark, 0, 5).coalesce(1), table, mode="overwrite")
    V.restore_table(spark, table, 1)
    _, kept_after, skipped_after = V.pruned_paths(table, [("k", "=", 2000)])
    assert (kept_after, skipped_after) == (kept_before, skipped_before)
    assert kept_after <= 2 and skipped_after >= 6  # bloom survived


def test_restore_materializes_across_live_dvs(spark, table):
    V.commit_write(_df(spark, 0, 100).coalesce(1), table, mode="overwrite")
    V.delete_where_dv(spark, table, [("id", "<", 10)])
    want = sorted(tuple(r) for r in V.read_version(spark, table).collect())
    V.commit_write(_df(spark, 500, 501).coalesce(1), table, mode="overwrite")
    rep = V.restore_table(spark, table, 2)
    assert not rep["metadata_only"]  # DV snapshot: honest rewrite
    got = sorted(tuple(r) for r in V.read_version(spark, table).collect())
    assert got == want  # tombstoned rows stay deleted, not resurrected


def test_clone_is_zero_copy_and_independent(spark, table):
    clone = tempfile.mkdtemp(prefix="clone_")
    try:
        df = spark.range(1000).select(F.col("id").alias("k"))
        V.commit_write(
            df.repartition(4, "k"), table, mode="overwrite", bloom_cols=["k"]
        )
        V.commit_write(
            spark.range(5000, 5007).select(F.col("id").alias("k")).coalesce(1),
            table,
            mode="append",
        )
        want = sorted(
            tuple(r) for r in V.read_version(spark, table).collect()
        )
        V.clone_table(spark, table, clone)
        got = sorted(tuple(r) for r in V.read_version(spark, clone).collect())
        assert got == want
        # zero-copy: cloned parquet shares inodes with the source
        src_inodes = {
            os.stat(os.path.join(r, f)).st_ino
            for r, _, fs in os.walk(table)
            for f in fs
            if f.endswith(".parquet")
        }
        for r, _, fs in os.walk(clone):
            for f in fs:
                if f.endswith(".parquet"):
                    assert os.stat(os.path.join(r, f)).st_ino in src_inodes
        # bloom pruning carried over to the clone
        _, kept, skipped = V.pruned_paths(clone, [("k", "=", 500)])
        assert kept <= 2 and skipped >= 2
        # divergence: writes to the clone never touch the source
        V.commit_write(
            spark.range(9000, 9010).select(F.col("id").alias("k")).coalesce(1),
            clone,
            "append",
        )
        assert V.read_version(spark, clone).count() == len(want) + 10
        assert sorted(
            tuple(r) for r in V.read_version(spark, table).collect()
        ) == want
        # a clone of a table with commits refuses to clobber
        with pytest.raises(ValueError, match="already has commits"):
            V.clone_table(spark, table, clone)
    finally:
        shutil.rmtree(clone, ignore_errors=True)


def test_chained_restore_counts_rows_once(spark, table):
    """r11 advice: a snapshot whose head is itself a restore re-references
    dirs that TWO commits (the original append and the restore entry)
    both list — summing every intersecting commit double-counted n_rows,
    corrupting history()/table_stats() and maintain_table's dv-ratio
    trigger.  Each live dir must count exactly once through restore →
    restore and restore → clone chains."""
    V.commit_write(_df(spark, 0, 10).coalesce(1), table, mode="append")
    V.commit_write(_df(spark, 10, 30).coalesce(1), table, mode="append")
    V.commit_write(_df(spark, 900, 905).coalesce(1), table, mode="overwrite")
    V.restore_table(spark, table, 2)                       # v4: head = restore
    assert V._read_entry(table, 4)["n_rows"] == 30

    # restore ON TOP of the restore head: still 30, not 60
    V.commit_write(_df(spark, 950, 955).coalesce(1), table, mode="overwrite")
    rep = V.restore_table(spark, table, 4)
    assert V._read_entry(table, rep["version"])["n_rows"] == 30
    assert V.read_version(spark, table).count() == 30

    # clone of a restore head carries the exact count too
    dst = tempfile.mkdtemp(prefix="restore_clone_dst_")
    shutil.rmtree(dst, ignore_errors=True)
    try:
        V.clone_table(spark, table, dst)
        assert V._read_entry(dst, 1)["n_rows"] == 30
        assert V.read_version(spark, dst).count() == 30
    finally:
        shutil.rmtree(dst, ignore_errors=True)

    # maintain_table's dv-ratio denominator uses the same attribution:
    # 3 deletes against 30 live rows is 0.1, not 0.05 against a doubled 60
    V.delete_where_dv(spark, table, [("id", "<", 3)])
    rec = V.maintain_table(spark, table, max_live_files=10**6,
                           max_dv_ratio=1.0)
    assert abs(rec["dv_ratio"] - 3 / 30) < 1e-9, rec
