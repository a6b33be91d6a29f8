"""Data-quality audit checks: each constraint must count its violations
exactly, and the audit union must carry the pass flag per check."""

from __future__ import annotations

from data_pipeline_zeal_spark.operators import quality as dq


def test_each_check_counts_violations(spark):
    child = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", None), (2, "a", -1.0), (9, "zz", 200.0)],
        "k long, cat string, v double",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")

    result = {
        r.check: (r.n_checked, r.n_violations, r.passed)
        for r in dq.audit(
            [
                dq.unique_key(child, ["k"]),          # k=1 twice -> 1 extra
                dq.not_null(child, "v"),              # one null
                dq.in_range(child, "v", 0.0, 100.0),  # -1 and 200 out
                dq.accepted_values(child, "cat", ["a", "b"]),  # zz bad
                dq.foreign_key(child, "k", parent, "pk"),      # k=9 orphan
            ]
        ).collect()
    }
    assert result["unique:k"] == (4, 1, False)
    assert result["not_null:v"] == (4, 1, False)
    assert result["range:v"] == (4, 2, False)
    assert result["accepted:cat"] == (4, 1, False)
    assert result["fk:k->pk"] == (4, 1, False)


def test_clean_data_passes_all(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    out = dq.audit(
        [
            dq.unique_key(df, ["k"]),
            dq.not_null(df, "v"),
            dq.in_range(df, "v", 0.0, 10.0),
            dq.foreign_key(df, "k", parent, "pk"),
        ]
    ).collect()
    assert all(r.passed and r.n_violations == 0 for r in out)
    assert [r.check for r in out] == sorted(r.check for r in out)


def test_fk_ignores_null_child_keys(spark):
    child = spark.createDataFrame([(None,), (1,)], "k long")
    parent = spark.createDataFrame([(1,)], "pk long")
    r = dq.foreign_key(child, "k", parent, "pk").collect()[0]
    assert (r.n_checked, r.n_violations) == (2, 0)


def test_empty_frame_all_checks_pass(spark):
    """Zero rows = zero violations = passed (not NULL): SUM over an empty
    frame is NULL and must be coalesced."""
    df = spark.createDataFrame([], "k long, v double, cat string")
    parent = spark.createDataFrame([(1,)], "pk long")
    out = dq.audit(
        [
            dq.unique_key(df, ["k"]),
            dq.not_null(df, "v"),
            dq.in_range(df, "v", 0.0, 10.0),
            dq.accepted_values(df, "cat", ["a"]),
            dq.foreign_key(df, "k", parent, "pk"),
        ]
    ).collect()
    assert all(r.passed is True for r in out)
    assert all((r.n_checked, r.n_violations) == (0, 0) for r in out)


def test_unique_key_null_keys_are_violations(spark):
    """count(*) - count(DISTINCT k) semantics: every NULL-key row is a
    violation (matches the DuckDB oracle's formulation)."""
    df = spark.createDataFrame([(None,), (None,), (1,), (2,)], "k long")
    r = dq.audit([dq.unique_key(df, ["k"])]).collect()[0]
    assert (r.n_checked, r.n_violations, r.passed) == (4, 2, False)
