"""asof_join semantics: inclusive/strict matching, per-key isolation,
null when no prior right row — checked against hand-computed expectations
(the fixture-scale DuckDB ASOF JOIN oracle runs in test_oracle_parity)."""

from __future__ import annotations

import datetime

from data_pipeline_zeal_spark.operators.asof import asof_join

T = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00"), "a"),
            (1, T("2024-01-01 12:00:00"), "b"),
            (2, T("2024-01-01 09:00:00"), "c"),
            (3, T("2024-01-01 09:00:00"), "d"),  # key with no right rows
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, T("2024-01-01 10:00:00"), 100.0),
            (1, T("2024-01-01 11:00:00"), 110.0),
            (2, T("2024-01-01 08:00:00"), 200.0),
            (2, T("2024-01-01 09:30:00"), 210.0),
        ],
        "k long, rts timestamp, px double",
    )
    return left, right


def test_asof_inclusive(spark):
    left, right = _frames(spark)
    out = {
        (r.k, r.tag): r.px
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts", right_values=["px"]
        ).collect()
    }
    assert out == {
        (1, "a"): 100.0,  # same-instant right row IS visible
        (1, "b"): 110.0,  # latest at-or-before
        (2, "c"): 200.0,  # 09:30 is in the future
        (3, "d"): None,  # no right rows for key
    }


def test_asof_strict(spark):
    left, right = _frames(spark)
    out = {
        (r.k, r.tag): r.px
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="rts",
            right_values=["px"],
            strict=True,
        ).collect()
    }
    assert out[(1, "a")] is None  # same-instant right row NOT visible
    assert out[(1, "b")] == 110.0


def test_asof_tolerance_nulls_stale_matches(spark):
    """A matched right row older than left_ts - tolerance yields NULL,
    a fresh one passes through, and unmatched keys stay NULL."""
    left, right = _frames(spark)
    out = {
        (r.k, r.tag): r.px
        for r in asof_join(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="rts",
            right_values=["px"],
            tolerance="45 minutes",
        ).collect()
    }
    assert out[(1, "a")] == 100.0   # same instant: staleness 0
    assert out[(1, "b")] is None    # 11:00 match is 60 min stale > 45
    # backward as-of: 09:30 is a FUTURE row and never matches (see
    # test_asof_inclusive); the only at-or-before row (08:00) is 60 min
    # stale > 45, so the tolerance nulls it.
    assert out[(2, "c")] is None
    assert out[(3, "d")] is None    # no right rows at all


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = {
        (r.k, r.tag): r.px
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_values=["px"], direction="forward",
        ).collect()
    }
    assert out == {
        (1, "a"): 100.0,  # same-instant right row IS visible forward too
        (1, "b"): None,   # nothing at-or-after 12:00
        (2, "c"): 210.0,  # earliest at-or-after: 09:30
        (3, "d"): None,   # no right rows for key
    }


def test_asof_forward_strict_and_tolerance(spark):
    left, right = _frames(spark)
    out = {
        (r.k, r.tag): r.px
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_values=["px"], direction="forward", strict=True,
        ).collect()
    }
    assert out[(1, "a")] == 110.0  # same-instant 10:00 hidden -> 11:00
    tol = {
        (r.k, r.tag): r.px
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_values=["px"], direction="forward", tolerance="20 minutes",
        ).collect()
    }
    assert tol[(2, "c")] is None  # 09:30 is 30 min ahead > 20


def test_asof_nearest(spark):
    left, right = _frames(spark)
    out = {
        (r.k, r.tag): r.px
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_values=["px"], direction="nearest",
        ).collect()
    }
    assert out == {
        (1, "a"): 100.0,  # distance 0 backward
        (1, "b"): 110.0,  # only backward exists
        (2, "c"): 210.0,  # 09:30 (30 min ahead) beats 08:00 (60 min back)
        (3, "d"): None,
    }


def test_asof_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, T("2024-01-01 10:00:00"), "x")], "k long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, T("2024-01-01 09:30:00"), 1.0),
            (1, T("2024-01-01 10:30:00"), 2.0),
        ],
        "k long, rts timestamp, px double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_values=["px"], direction="nearest",
    ).collect()
    assert out[0].px == 1.0  # equal 30-min distance: backward wins


def test_asof_nearest_tolerance_and_strict_rejected(spark):
    import pytest

    left, right = _frames(spark)
    tol = {
        (r.k, r.tag): r.px
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_values=["px"], direction="nearest", tolerance="20 minutes",
        ).collect()
    }
    assert tol[(2, "c")] is None  # nearest is 30 min away > 20 both sides
    assert tol[(1, "a")] == 100.0
    with pytest.raises(ValueError):
        asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_values=["px"], direction="nearest", strict=True,
        )
