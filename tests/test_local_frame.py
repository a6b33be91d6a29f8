"""local_frame (r14 optimization): the Arrow-backed local relation must be
value- and schema-identical to the classic ``spark.createDataFrame(rows,
schema)`` path it replaces, while planning as a JVM-only LocalTableScan
(no Python-worker evaluation at scan time — optimization guide §4)."""

from __future__ import annotations

import datetime
import decimal
import math

from data_pipeline_zeal_spark.io import local_frame

NASTY_SCHEMA = (
    "a int, b bigint, c double, d string, e array<double>, "
    "f struct<x:int,y:string>, g timestamp, h date, i decimal(12,2), "
    "j boolean, k binary"
)
NASTY_ROWS = [
    (
        1, 10**12, 1.5, "x", [1.0, 2.0], (1, "s"),
        datetime.datetime(2024, 1, 5, 3, 0, 0),
        datetime.date(2024, 1, 5), decimal.Decimal("12.34"), True, b"ab",
    ),
    (None,) * 11,
    (
        2, -5, float("nan"), "", [], (None, None),
        datetime.datetime(1995, 6, 1, 0, 0, 0, 123456),
        datetime.date(1970, 1, 1), decimal.Decimal("-0.01"), False, b"",
    ),
]


def _rows_equal(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        for x, y in zip(ra, rb):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
            if x != y:
                return False
    return True


def test_matches_classic_path_values_and_schema(spark):
    classic = spark.createDataFrame(NASTY_ROWS, NASTY_SCHEMA)
    arrow = local_frame(spark, NASTY_ROWS, NASTY_SCHEMA)
    assert [f.dataType for f in arrow.schema.fields] == [
        f.dataType for f in classic.schema.fields
    ]
    assert arrow.schema.fieldNames() == classic.schema.fieldNames()
    assert _rows_equal(arrow.collect(), classic.collect())


def test_plans_as_local_table_scan(spark):
    arrow = local_frame(spark, NASTY_ROWS, NASTY_SCHEMA)
    plan = arrow._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_collected_row_objects_roundtrip(spark):
    classic = spark.createDataFrame(NASTY_ROWS, NASTY_SCHEMA)
    collected = classic.collect()
    rebuilt = local_frame(spark, collected, classic.schema)
    assert _rows_equal(rebuilt.collect(), collected)


def test_empty_rows(spark):
    df = local_frame(spark, [], "a int, b string")
    assert df.count() == 0
    assert df.schema.fieldNames() == ["a", "b"]


def test_coalesce_one_stays_cheap(spark):
    # the motivating pathology: coalesce(1) over a pickled-list relation
    # serialized 32 Python-worker partition evaluations into one task
    # (~7 s); the arrow relation must stay a LocalTableScan under it
    df = local_frame(
        spark, [(i, [0.1] * 8) for i in range(8)],
        "cell int, centroid array<double>",
    ).coalesce(1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert df.count() == 8


def test_mapping_rows_bind_by_key(spark):
    # r14 advice (medium): dict rows must bind values BY KEY — the old
    # zip(names, dict) paired names with the dict's keys, so a
    # string-coercible schema silently collected the KEY strings
    rows = [{"x": "hello", "y": "world"}, {"y": "b", "x": "a"}]
    df = local_frame(spark, rows, "x string, y string")
    got = sorted((r.x, r.y) for r in df.collect())
    assert got == [("a", "b"), ("hello", "world")]


def test_short_tuple_raises_like_classic(spark):
    # r14 advice (low): a malformed sequence row must surface an error
    # (the classic path raises), never silent NULL-fill
    import pytest

    with pytest.raises(Exception):
        local_frame(spark, [(1,)], "a int, b int").collect()
