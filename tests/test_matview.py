"""Incrementally-maintained materialized views (r11): refresh applies
the base table's delta (append-files or keyed change feed), never a
base rescan, and the result is EXACTLY a from-scratch recompute for
count / integer-sum measures."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.sources import matview as MV
from data_pipeline_zeal_spark.sources import versioned as V

SF_SMALL = "/root/testdata/sf0.001"

GROUPS = ["event_type"]
MEASURES = [
    ("n_events", "count", None),
    ("sum_cents", "sum", "CAST(FLOOR(value * 100) AS BIGINT)"),
]


@pytest.fixture()
def tables():
    base = tempfile.mkdtemp(prefix="mv_base_")
    view = tempfile.mkdtemp(prefix="mv_view_")
    yield base, view
    shutil.rmtree(base, ignore_errors=True)
    shutil.rmtree(view, ignore_errors=True)


def _events(spark):
    return load_table(spark, SF_SMALL, "events").select(
        "event_id", "event_type", "value"
    )


def _recompute(spark, base):
    return {
        tuple(r)
        for r in MV._partials(
            V.read_version(spark, base), GROUPS, MEASURES
        ).drop(MV._N).collect()
    }


def _view_rows(spark, view):
    return {tuple(r) for r in MV.read_matview(spark, view).collect()}


def test_append_delta_refresh_equals_recompute(spark, tables):
    base, view = tables
    ev = _events(spark)
    V.commit_write(ev.filter(F.col("event_id") % 3 == 0), base, "overwrite")
    MV.create_matview(spark, base, view, GROUPS, MEASURES)
    # two more appends land before the refresh
    V.commit_write(ev.filter(F.col("event_id") % 3 == 1), base, "append")
    V.commit_write(ev.filter(F.col("event_id") % 3 == 2), base, "append")

    res = MV.refresh_matview(spark, view)
    assert res["path"] == "append-delta"
    assert res["from_version"] == 1 and res["to_version"] == 3
    assert _view_rows(spark, view) == _recompute(spark, base)

    # idempotent: nothing new -> noop, view untouched
    before = V.latest_version(view)
    assert MV.refresh_matview(spark, view)["path"] == "noop"
    assert V.latest_version(view) == before


def test_keyed_diff_refresh_across_update_and_delete(spark, tables):
    base, view = tables
    ev = _events(spark)
    V.commit_write(ev, base, "overwrite")
    MV.create_matview(spark, base, view, GROUPS, MEASURES, keys=["event_id"])

    # an update that MOVES rows between groups (the hard case: -old +new)
    moved = (
        V.read_version(spark, base)
        .filter((F.col("event_id") % 7 == 0) & F.col("value").isNotNull())
        .withColumn("event_type", F.lit("migrated"))
        .withColumn("value", F.col("value") + 10.0)
    )
    V.merge_upsert(spark, base, moved, keys=["event_id"], order_col="value")
    # and a merge-on-read delete
    V.delete_where_dv(spark, base, [("event_id", "in", [1, 2, 3, 4, 5])])

    res = MV.refresh_matview(spark, view)
    assert res["path"] == "keyed-diff"
    assert _view_rows(spark, view) == _recompute(spark, base)


def test_emptied_group_disappears(spark, tables):
    base, view = tables
    ev = _events(spark)
    V.commit_write(ev, base, "overwrite")
    MV.create_matview(spark, base, view, GROUPS, MEASURES, keys=["event_id"])
    victim = V.read_version(spark, base).limit(1).collect()[0].event_type
    assert any(r[0] == victim for r in _view_rows(spark, view))
    V.delete_where(spark, base, [("event_type", "=", victim)])
    MV.refresh_matview(spark, view)
    rows = _view_rows(spark, view)
    assert rows == _recompute(spark, base)
    assert not any(r[0] == victim for r in rows)


def test_refresh_without_keys_rejects_non_append_range(spark, tables):
    base, view = tables
    ev = _events(spark)
    V.commit_write(ev, base, "overwrite")
    MV.create_matview(spark, base, view, GROUPS, MEASURES)  # no keys
    V.delete_where_dv(spark, base, [("event_id", "in", [10, 11])])
    with pytest.raises(ValueError, match="keyed-diff"):
        MV.refresh_matview(spark, view)


def test_view_itself_time_travels(spark, tables):
    base, view = tables
    ev = _events(spark)
    V.commit_write(ev.filter(F.col("event_id") % 2 == 0), base, "overwrite")
    MV.create_matview(spark, base, view, GROUPS, MEASURES)
    v1_rows = _view_rows(spark, view)
    V.commit_write(ev.filter(F.col("event_id") % 2 == 1), base, "append")
    MV.refresh_matview(spark, view)
    assert _view_rows(spark, view) != v1_rows  # the view moved
    pinned = {
        tuple(r)
        for r in MV.read_matview(spark, view, version=1).collect()
    }
    assert pinned == v1_rows  # but version 1 still serves the old state


def test_streaming_maintained_view(spark, tables, tmp_path):
    """foreachBatch maintenance: each micro-batch appends to the base
    and advances the view in the same sink call — the serving aggregate
    is fresh within one trigger, equals a recompute, and crash replay
    of a batch adopts both commits (base AND view) without drift."""
    import os

    base, view = tables
    ev = _events(spark)
    V.commit_write(ev.filter(F.col("event_id") % 3 == 0), base, "overwrite")
    MV.create_matview(spark, base, view, GROUPS, MEASURES, keys=["event_id"])

    src = str(tmp_path / "in")
    rest = ev.filter(F.col("event_id") % 3 != 0)
    rest.filter(F.col("event_id") % 3 == 1).coalesce(1).write.parquet(
        src + "/b1"
    )
    rest.filter(F.col("event_id") % 3 == 2).coalesce(1).write.parquet(
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
        spark.readStream.schema(rest.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            MV.maintained_matview_sink(base, view)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert V.read_version(spark, base).count() == ev.count()
    assert _view_rows(spark, view) == _recompute(spark, base)
    # replay adopts BOTH commits: no new base or view version
    hb, hv = len(V.history(base)), len(V.history(view))
    MV.maintained_matview_sink(base, view)(spark.read.parquet(files[0]), 0)
    assert len(V.history(base)) == hb and len(V.history(view)) == hv
    assert _view_rows(spark, view) == _recompute(spark, base)


RICH_MEASURES = [
    ("n_events", "count", None),
    ("sum_cents", "sum", "CAST(FLOOR(value * 100) AS BIGINT)"),
    ("avg_cents", "avg", "CAST(FLOOR(value * 100) AS BIGINT)"),
    ("min_cents", "min", "CAST(FLOOR(value * 100) AS BIGINT)"),
    ("max_cents", "max", "CAST(FLOOR(value * 100) AS BIGINT)"),
]


def _rich_recompute(spark, base):
    """From-scratch GROUP BY over the live base — the oracle every
    refresh must equal, avg derived exactly as sum/count."""
    snap = V.read_version(spark, base)
    rows = snap.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.expr("CAST(FLOOR(value * 100) AS BIGINT)")).alias("sum_cents"),
        F.avg(F.expr("CAST(FLOOR(value * 100) AS BIGINT)")).alias("avg_cents"),
        F.min(F.expr("CAST(FLOOR(value * 100) AS BIGINT)")).alias("min_cents"),
        F.max(F.expr("CAST(FLOOR(value * 100) AS BIGINT)")).alias("max_cents"),
    ).collect()
    return {
        (r.event_type, r.n_events, r.sum_cents,
         round(r.avg_cents, 9), r.min_cents, r.max_cents)
        for r in rows
    }


def _rich_view(spark, view):
    return {
        (r.event_type, r.n_events, r.sum_cents,
         round(r.avg_cents, 9), r.min_cents, r.max_cents)
        for r in MV.read_matview(spark, view)
        .select("event_type", "n_events", "sum_cents",
                "avg_cents", "min_cents", "max_cents")
        .collect()
    }


def test_avg_min_max_append_path(spark, tables):
    """r12 (verdict directive #3): avg is maintained as decomposable
    sum/count internals and derived at read; min/max merge decomposably
    across pure-append refreshes.  View == from-scratch GROUP BY after
    two appends."""
    base, view = tables
    ev = _events(spark)
    V.commit_write(
        ev.filter(F.col("event_id") % 3 == 0).coalesce(1), base,
        mode="overwrite",
    )
    MV.create_matview(spark, base, view, GROUPS, RICH_MEASURES,
                      keys=["event_id"])
    V.commit_write(
        ev.filter(F.col("event_id") % 3 == 1).coalesce(1), base, mode="append"
    )
    V.commit_write(
        ev.filter(F.col("event_id") % 3 == 2).coalesce(1), base, mode="append"
    )
    rep = MV.refresh_matview(spark, view)
    assert rep["path"] == "append-delta"
    assert _rich_view(spark, view) == _rich_recompute(spark, base)
    # the avg internals never leave the view table
    assert "avg_cents__sum" not in MV.read_matview(spark, view).columns


def test_delete_forces_group_recompute_for_minmax(spark, tables):
    """A delete can WIDEN a group's min/max — no stored partial can
    repair it, so the keyed-diff refresh recomputes exactly the shrunk
    groups from the base.  Pin: delete every row holding one group's
    maximum; the refreshed view must surface the NEXT max (provably not
    derivable from the old view row + signed partials), and every
    measure still equals the from-scratch recompute."""
    base, view = tables
    ev = _events(spark)
    V.commit_write(ev.coalesce(1), base, mode="overwrite")
    MV.create_matview(spark, base, view, GROUPS, RICH_MEASURES,
                      keys=["event_id"])

    # the current max row(s) of one group
    target = "click"
    mx = (
        V.read_version(spark, base)
        .filter(F.col("event_type") == target)
        .agg(F.max(F.expr("CAST(FLOOR(value * 100) AS BIGINT)")).alias("m"))
        .collect()[0]["m"]
    )
    V.delete_where_dv(
        spark, base,
        [("event_type", "=", target)],
    ) if mx is None else V.delete_where_dv(
        spark, base,
        [("event_type", "=", target), ("value", ">=", (mx) / 100.0)],
    )
    rep = MV.refresh_matview(spark, view)
    assert rep["path"] == "keyed-diff"
    got = _rich_view(spark, view)
    assert got == _rich_recompute(spark, base)
    new_mx = next(r[5] for r in got if r[0] == target)
    assert new_mx is not None and new_mx < mx


def test_minmax_delete_without_keys_still_raises(spark, tables):
    """min/max change nothing about the keys contract: a delete-crossing
    refresh without keys fails loudly."""
    base, view = tables
    ev = _events(spark)
    V.commit_write(ev.coalesce(1), base, mode="overwrite")
    MV.create_matview(spark, base, view, GROUPS, RICH_MEASURES)
    V.delete_where_dv(spark, base, [("event_id", "<", 100)])
    with pytest.raises(ValueError, match="keys"):
        MV.refresh_matview(spark, view)


def test_unknown_measure_kind_rejected_at_create(spark, tables):
    base, view = tables
    ev = _events(spark)
    V.commit_write(ev.coalesce(1), base, mode="overwrite")
    with pytest.raises(ValueError, match="unknown measure kind"):
        MV.create_matview(
            spark, base, view, GROUPS, [("p50", "median", "value")]
        )


def test_avg_all_null_group_reads_null(spark, tables):
    """SQL AVG semantics end-to-end: a group whose every value is NULL
    serves avg NULL (not 0), count still counts rows."""
    base, view = tables
    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", None), (3, "b", 4.0)],
        "event_id long, event_type string, value double",
    )
    V.commit_write(df.coalesce(1), base, mode="overwrite")
    MV.create_matview(
        spark, base, view, GROUPS,
        [("n", "count", None), ("avg_v", "avg", "value")],
        keys=["event_id"],
    )
    rows = {
        r.event_type: (r.n, r.avg_v)
        for r in MV.read_matview(spark, view).collect()
    }
    assert rows == {"a": (2, None), "b": (1, 4.0)}


def test_randomized_op_sequence_refresh_equals_recompute(spark, tables):
    """Soak law for the full measure surface: a seeded random sequence
    of appends and DV deletes, refreshing after every step — the view
    must equal the from-scratch GROUP BY at EVERY intermediate state,
    whichever path each refresh takes.  This is the associativity/
    targeted-recompute argument exercised as a trajectory, not a
    single transition."""
    import random

    rng = random.Random(0x5EED12)
    base, view = tables
    next_id = 2000
    V.commit_write(
        spark.range(0, next_id).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 13).cast("string").alias("event_type"),
            ((F.col("id") * 37) % 500).cast("double").alias("value"),
        ).coalesce(1),
        base, mode="overwrite",
    )
    MV.create_matview(spark, base, view, GROUPS, RICH_MEASURES,
                      keys=["event_id"])
    paths = []
    for step in range(6):
        op = rng.choice(["append", "delete", "delete"])
        if op == "append":
            lo, hi = next_id, next_id + rng.randrange(200, 600)
            next_id = hi
            V.commit_write(
                spark.range(lo, hi).select(
                    F.col("id").alias("event_id"),
                    (F.col("id") % 13).cast("string").alias("event_type"),
                    ((F.col("id") * 37) % 500).cast("double").alias("value"),
                ).coalesce(1),
                base, mode="append",
            )
        else:
            # delete a random id stripe (may hit group extremes)
            lo = rng.randrange(0, next_id)
            V.delete_where_dv(
                spark, base,
                [("event_id", ">=", lo), ("event_id", "<", lo + 150)],
            )
        rep = MV.refresh_matview(spark, view)
        paths.append(rep["path"])
        assert _rich_view(spark, view) == _rich_recompute(spark, base), (
            step, op, paths
        )
    # the trajectory exercised BOTH refresh tiers
    assert "append-delta" in paths and "keyed-diff" in paths, paths
