"""Write-time expectations on the versioned table (r11): fail blocks
the commit atomically, drop filters, quarantine dead-letters violating
rows to a companion table — and every commit's meta carries the
violation counts, making the commit log the quality ledger."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.sources import expectations as E
from data_pipeline_zeal_spark.sources import versioned as V

SF_SMALL = "/root/testdata/sf0.001"

EXPECT = [
    ("value_non_negative", "value >= 0"),  # NULL value -> violation
    ("type_known", "event_type IS NOT NULL AND event_type != 'bogus'"),
]


@pytest.fixture()
def table():
    t = tempfile.mkdtemp(prefix="expect_")
    yield t
    shutil.rmtree(t, ignore_errors=True)
    shutil.rmtree(t + "_quarantine", ignore_errors=True)


def _events(spark):
    return load_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value"
    )


def test_fail_mode_blocks_commit_atomically(spark, table):
    ev = _events(spark)
    bad = ev.withColumn(
        "value", F.when(F.col("event_id") % 50 == 0, F.lit(-1.0)).otherwise(
            F.col("value")
        )
    )
    with pytest.raises(E.ExpectationViolation) as exc:
        E.commit_with_expectations(bad, table, EXPECT, on_violation="fail")
    assert exc.value.counts["value_non_negative"] > 0
    # NOTHING committed — not even a log directory entry
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, table)

    # an all-clean frame commits and records zero violations
    clean = ev.filter(F.col("value") >= 0)
    rep = E.commit_with_expectations(clean, table, EXPECT, on_violation="fail")
    assert rep["violations"] == {"value_non_negative": 0, "type_known": 0}
    assert V.read_version(spark, table).count() == rep["rows_written"]
    meta = V.commit_meta(table, rep["version"])["expectations"]
    assert meta["violations"]["value_non_negative"] == 0


def test_null_predicate_counts_as_violation(spark, table):
    # inject NULL values: three-valued logic would silently ADMIT them
    # through `value >= 0` without the coalesce-to-violation rule
    ev = _events(spark).withColumn(
        "value",
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    n_null = ev.filter(F.col("value").isNull()).count()
    assert n_null > 0
    rep = E.commit_with_expectations(ev, table, EXPECT, on_violation="drop")
    assert rep["violations"]["value_non_negative"] == n_null
    got = V.read_version(spark, table)
    assert got.filter(F.col("value").isNull()).count() == 0
    assert got.count() == rep["rows_written"]


def test_quarantine_dead_letters_with_violation_names(spark, table):
    ev = _events(spark)
    poisoned = ev.withColumn(
        "event_type",
        F.when(F.col("event_id") % 97 == 0, F.lit("bogus")).otherwise(
            F.col("event_type")
        ),
    )
    rep = E.commit_with_expectations(
        poisoned, table, EXPECT, on_violation="quarantine", txn="q1"
    )
    assert rep["quarantined"] > 0
    assert rep["rows_written"] + rep["quarantined"] == rep["rows_checked"]
    main = V.read_version(spark, table)
    q = V.read_version(spark, table + "_quarantine")
    assert main.count() == rep["rows_written"]
    assert q.count() == rep["quarantined"]
    # every quarantined row names what it violated
    named = {
        n for r in q.select("__violated").collect() for n in r["__violated"]
    }
    assert "type_known" in named
    # no lost rows: main + quarantine == input (keyed)
    ids_in = {r.event_id for r in poisoned.select("event_id").collect()}
    ids_out = {r.event_id for r in main.select("event_id").collect()} | {
        r.event_id for r in q.select("event_id").collect()
    }
    assert ids_out == ids_in

    # txn idempotency covers BOTH commits: replay adds nothing anywhere
    h_main = len(V.history(table))
    h_q = len(V.history(table + "_quarantine"))
    E.commit_with_expectations(
        poisoned, table, EXPECT, on_violation="quarantine", txn="q1"
    )
    assert len(V.history(table)) == h_main
    assert len(V.history(table + "_quarantine")) == h_q


def test_streaming_sink_gates_each_batch(spark, table, tmp_path):
    import os

    ev = _events(spark).filter(F.col("value").isNotNull())
    src = str(tmp_path / "in")
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        src + "/b1"
    )
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        src + "/b2"
    )
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    os.utime(files[0], (1_700_000_000,) * 2)
    os.utime(files[1], (1_700_000_100,) * 2)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    sink = E.expectations_sink(table, EXPECT, on_violation="drop")
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = V.read_version(spark, table)
    want = ev.filter(F.col("value") >= 0)
    assert got.count() == want.count()
    # per-batch quality ledger in the commit log
    for v in range(1, len(V.history(table)) + 1):
        assert "expectations" in V.commit_meta(table, v)


def test_quality_history_is_metadata_only_ledger(spark, table):
    """quality_history reads the violation counts back from log replay
    alone — one entry per gated commit, none for plain commits."""
    ev = _events(spark)
    V.commit_write(ev.limit(10), table, mode="append")  # ungated
    E.commit_with_expectations(
        ev.filter(F.col("event_id") % 2 == 0), table, EXPECT,
        on_violation="drop",
    )
    E.commit_with_expectations(
        ev.filter(F.col("event_id") % 2 == 1).withColumn(
            "value", F.lit(-1.0)
        ),
        table,
        EXPECT,
        on_violation="drop",
    )
    hist = E.quality_history(table)
    assert len(hist) == 2  # the ungated commit carries no metrics
    assert hist[0]["violations"]["value_non_negative"] == 0
    assert hist[1]["violations"]["value_non_negative"] > 0
    assert all(h["on_violation"] == "drop" for h in hist)


def test_empty_frame_commits_cleanly_with_zero_violations(spark, table):
    """SUM over zero rows is NULL — before the r12 coalesce, an empty
    input crashed commit_with_expectations with a TypeError instead of
    committing an empty frame with a zero-violation ledger entry."""
    ev = _events(spark).filter(F.lit(False))
    m = E.check_metrics(ev, [("value_ok", "value >= 0")])
    assert m == {"rows_checked": 0, "violations": {"value_ok": 0}}
    rep = E.commit_with_expectations(
        ev, table, [("value_ok", "value >= 0")], on_violation="fail"
    )
    assert rep["rows_checked"] == 0 and rep["rows_written"] == 0
    assert rep["violations"] == {"value_ok": 0}
    assert V.read_version(spark, table).count() == 0


def test_quarantine_lifecycle_vacuum_and_replay(spark, table):
    """r12 (verdict directive #6): the quarantine is a first-class
    versioned table with a drain.  (a) vacuuming the MAIN table never
    touches quarantined rows; (b) the quarantine's own vacuum honors
    the protected-versions floor; (c) once a rule is relaxed, replay
    re-admits newly-passing rows to main EXACTLY once (txn-idempotent
    on the quarantine version) and keeps still-failing rows with
    violation arrays recomputed under the new ruleset."""
    ev = _events(spark)
    poisoned = ev.withColumn(
        "value",
        F.when(F.col("event_id") % 10 == 0, F.lit(-5.0)).otherwise(
            F.col("value")
        ),
    )
    rules = [("value_ok", "value >= 0")]
    rep = E.commit_with_expectations(
        poisoned, table, rules, on_violation="quarantine"
    )
    qt = table + "_quarantine"
    n_q = rep["quarantined"]
    assert n_q > 0

    # (a) main-table maintenance does not reach the quarantine
    V.commit_write(
        V.read_version(spark, table), table, mode="overwrite"
    )  # churn main history
    V.vacuum(table, retention_seconds=0)
    assert V.read_version(spark, qt).count() == n_q

    # (c) relax the rule: -5.0 is now legal
    relaxed = [("value_ok", "value >= -10")]
    n_main = V.read_version(spark, table).count()
    out = E.replay_quarantine(spark, table, relaxed)
    assert out["readmitted"] == n_q and out["still_quarantined"] == 0
    assert V.read_version(spark, table).count() == n_main + n_q
    assert V.read_version(spark, qt).count() == 0
    # exactly once: the same replay call adopts, nothing doubles
    out2 = E.replay_quarantine(spark, table, relaxed)
    assert V.read_version(spark, table).count() == n_main + n_q
    # the ledger records the replay as a quality event
    hist = E.quality_history(table)
    assert any(h.get("on_violation") == "replay" for h in hist)

    # (b) the quarantine's own retention honors the floor
    qv = V.latest_version(qt)
    V.vacuum(qt, retention_seconds=0, min_retained_version=qv)
    with pytest.raises(V.VersionExpiredError):
        V.read_version(spark, qt, 1)
    assert V.read_version(spark, qt, qv).count() == 0


def test_replay_partial_readmission_recomputes_violations(spark, table):
    """A replay under a HALF-relaxed ruleset re-admits only the rows the
    new rules accept; survivors' __violated arrays reflect the NEW
    rules, not the old ones."""
    df = spark.createDataFrame(
        [(1, "a", -2.0), (2, "b", -20.0), (3, None, 5.0)],
        "event_id long, event_type string, value double",
    )
    rules = [
        ("value_ok", "value >= 0"),
        ("type_ok", "event_type IS NOT NULL"),
    ]
    E.commit_with_expectations(df, table, rules, on_violation="quarantine")
    qt = table + "_quarantine"
    assert V.read_version(spark, qt).count() == 3

    relaxed = [
        ("value_ok", "value >= -10"),  # admits -2, still rejects -20
        ("type_ok", "event_type IS NOT NULL"),
    ]
    out = E.replay_quarantine(spark, table, relaxed)
    assert out["readmitted"] == 1 and out["still_quarantined"] == 2
    left = {
        r["event_id"]: sorted(r["__violated"])
        for r in V.read_version(spark, qt).collect()
    }
    assert left == {2: ["value_ok"], 3: ["type_ok"]}
