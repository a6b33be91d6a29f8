"""Commit-log table format: atomicity, time travel, idempotent retries,
crash-orphan invisibility, optimistic-concurrency races, vacuum scope.
"""

from __future__ import annotations

import json
import os

from data_pipeline_zeal_spark.sources import versioned as V


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = V.commit_write(_df(spark, 0, 10), t, mode="overwrite")
    v2 = V.commit_write(_df(spark, 10, 15), t, mode="append")
    v3 = V.commit_write(_df(spark, 100, 102), t, mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert V.read_version(spark, t, 1).count() == 10
    assert V.read_version(spark, t, 2).count() == 15
    assert V.read_version(spark, t, 3).count() == 2
    assert V.read_version(spark, t).count() == 2  # latest
    # old versions still read after later overwrites (immutable files)
    assert sorted(r.id for r in V.read_version(spark, t, 2).collect())[:3] == [0, 1, 2]


def test_idempotent_txn_retry_does_not_double_append(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit_write(_df(spark, 0, 5), t, mode="overwrite")
    a = V.commit_write(_df(spark, 5, 8), t, mode="append", txn="job-42")
    b = V.commit_write(_df(spark, 5, 8), t, mode="append", txn="job-42")
    assert a == b  # second call is a no-op returning the same version
    assert V.read_version(spark, t).count() == 8


def test_crashed_write_is_invisible_and_vacuumed(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit_write(_df(spark, 0, 5), t, mode="overwrite")
    # simulate a crash BEFORE commit: data staged, no log entry
    orphan = os.path.join(t, "data", "vdeadbeef0000")
    _df(spark, 90, 95).write.parquet(orphan)
    assert V.read_version(spark, t).count() == 5  # reader never sees it
    removed = V.vacuum(t)
    assert removed == [orphan]
    assert not os.path.exists(orphan)
    # vacuum keeps every dir any committed version references
    assert V.read_version(spark, t, 1).count() == 5


def test_version_race_retries_to_next_number(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit_write(_df(spark, 0, 5), t, mode="overwrite")
    # another writer grabs version 2 out from under us
    with open(os.path.join(t, "_log", V._entry_name(2)), "w") as f:
        json.dump({"action": "append", "dirs": []}, f)
    v = V.commit_write(_df(spark, 5, 7), t, mode="append")
    assert v == 3
    assert V.read_version(spark, t).count() == 7


def test_read_errors(spark, tmp_path):
    import pytest

    t = str(tmp_path / "tbl")
    with pytest.raises(FileNotFoundError):
        V.live_dirs(t)
    V.commit_write(_df(spark, 0, 3), t, mode="overwrite")
    with pytest.raises(ValueError):
        V.live_dirs(t, version=9)
