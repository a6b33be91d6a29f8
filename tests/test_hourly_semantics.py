"""Reference-semantics unit tests for the hourly aggregation operator
(SURVEY.md §5): hour-boundary window assignment, NULL-if-empty AVG,
null-skipping SUM, exact distincts, and the upsert sink contract.
"""

from __future__ import annotations

import datetime

from pyspark.sql import types as T

from data_pipeline_zeal_spark.operators.hourly import aggregate_events
from data_pipeline_zeal_spark.streaming.pipeline import (
    jdbc_upsert_sink,
    postgres_upsert_sql,
)

from tests.conftest import SF_SMALL

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _agg(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.window_start, r.event_type): r
        for r in aggregate_events(df, ts_col="ts").collect()
    }


def test_hour_boundary_belongs_to_starting_window(spark):
    """An event at exactly 13:00:00.000 belongs to [13:00, 14:00) —
    reference truncation semantics (aggregation.py:48-49)."""
    t13 = datetime.datetime(2024, 1, 1, 13, 0, 0)
    t1259 = datetime.datetime(2024, 1, 1, 12, 59, 59, 999999)
    out = _agg(spark, [(t13, "click", "u1", 1.0), (t1259, "click", "u1", 1.0)])
    assert out[(datetime.datetime(2024, 1, 1, 13, 0), "click")].event_count == 1
    assert out[(datetime.datetime(2024, 1, 1, 12, 0), "click")].event_count == 1
    w = out[(datetime.datetime(2024, 1, 1, 13, 0), "click")]
    assert w.window_end == datetime.datetime(2024, 1, 1, 14, 0)


def test_avg_null_when_no_values(spark):
    """AVG is NULL (not 0) for a window with no non-null values —
    reference aggregation.py:31-36."""
    t = datetime.datetime(2024, 1, 1, 9, 30)
    out = _agg(spark, [(t, "click", "u1", None), (t, "click", "u2", None)])
    row = out[(datetime.datetime(2024, 1, 1, 9, 0), "click")]
    assert row.avg_value is None
    assert row.total_value is None
    assert row.value_count == 0
    assert row.event_count == 2


def test_sum_skips_nulls_and_counts_contributors(spark):
    """SUM skips nulls; the contributing count tracks only non-null values —
    reference aggregation.py:65-67."""
    t = datetime.datetime(2024, 1, 1, 9, 30)
    out = _agg(
        spark,
        [(t, "pv", "u1", 10.0), (t, "pv", "u1", None), (t, "pv", "u2", 30.0)],
    )
    row = out[(datetime.datetime(2024, 1, 1, 9, 0), "pv")]
    assert row.total_value == 40.0
    assert row.value_count == 2
    assert row.avg_value == 20.0
    assert row.event_count == 3


def test_exact_distinct_users(spark):
    t = datetime.datetime(2024, 1, 1, 9, 30)
    rows = [(t, "pv", f"u{i % 3}", 1.0) for i in range(12)]
    out = _agg(spark, rows)
    assert out[(datetime.datetime(2024, 1, 1, 9, 0), "pv")].unique_user_count == 3


def test_session_distinct_matches_duckdb_oracle(spark, tmp_path):
    """A4 (exact COUNT(DISTINCT session)) batch oracle: the driver fixture
    has no session column, so write a generator-produced events table with
    sessions and cross-check the full hourly aggregate — including
    unique_session_count — against DuckDB on the same parquet (reference
    aggregation.py:17,63)."""
    import duckdb

    from data_pipeline_zeal_spark.sources.generator import generate_events

    path = str(tmp_path / "gen_events.parquet")
    generate_events(spark, 20_000, num_users=50).write.mode("overwrite").parquet(
        path
    )

    got = {
        (str(r.window_start), r.event_type): (
            r.event_count,
            r.unique_user_count,
            r.unique_session_count,
        )
        for r in aggregate_events(
            spark.read.parquet(path),
            ts_col="timestamp",
            session_col="session_id",
            value_col="duration_ms",
        ).collect()
    }
    con = duckdb.connect()
    want = {
        (str(w), t): (n, u, s)
        for w, t, n, u, s in con.execute(
            f"""
            SELECT date_trunc('hour', timestamp) AS w, event_type,
                   count(*), count(DISTINCT user_id),
                   count(DISTINCT session_id)
            FROM '{path}/*.parquet'
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    con.close()
    assert got == want and len(got) > 0


def test_postgres_upsert_sql_shape():
    """The production sink SQL carries the reference's conflict contract
    (upsert_aggregation.sql:12-19): conflict on the logical PK, update all
    aggregate columns."""
    sql = postgres_upsert_sql()
    assert "ON CONFLICT (window_start, event_type) DO UPDATE" in sql
    for col in [
        "event_count",
        "unique_user_count",
        "unique_session_count",
        "total_duration_ms",
        "avg_duration_ms",
    ]:
        assert f"{col} = EXCLUDED.{col}" in sql


class _RecordingConn:
    """DB-API stub recording multi-row VALUES statements: reconstructs the
    8-wide row tuples from each execute's flattened parameter list."""

    def __init__(self):
        self.rows: list = []
        self.statements: list = []
        self.committed = False
        self.rolled_back = False

    def cursor(self):
        conn = self

        class Cur:
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

            def execute(self, sql, params):
                n_rows = sql.count("(%s")
                assert len(params) == n_rows * 8  # placeholders match params
                conn.statements.append(sql)
                conn.rows.extend(
                    tuple(params[i * 8 : (i + 1) * 8]) for i in range(n_rows)
                )

        return Cur()

    def commit(self):
        self.committed = True

    def rollback(self):
        self.rolled_back = True

    def close(self):
        pass


def test_jdbc_upsert_sink_plumbing(spark):
    """foreachBatch sink dedups per key and ships one multi-row VALUES
    statement in a committed transaction (reference
    postgres_repository.py:59-98, execute_values batching 83-88)."""
    t = datetime.datetime(2024, 1, 1, 9, 0)
    batch = spark.createDataFrame(
        [(t, "click", 5), (t, "click", 7), (t, "pv", 3)],
        T.StructType(
            [
                T.StructField("window_start", T.TimestampType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("event_count", T.LongType()),
            ]
        ),
    )
    conn = _RecordingConn()
    sink = jdbc_upsert_sink("hourly_aggregations", lambda: conn)
    sink(batch, 0)
    assert conn.committed
    assert len(conn.rows) == 2  # (t, click) deduped to one row + (t, pv)
    assert len(conn.statements) == 1  # both rows ride one VALUES statement
    # missing schema columns are null-filled so the tuple width always
    # matches the 8 SQL placeholders
    assert all(len(r) == 8 for r in conn.rows)


def test_jdbc_upsert_sink_pages_large_batches(spark):
    """Batches beyond page_size split into multiple VALUES statements in
    the SAME transaction (one commit)."""
    t = datetime.datetime(2024, 1, 1, 9, 0)
    batch = spark.createDataFrame(
        [(t, f"type_{i}", i) for i in range(5)],
        T.StructType(
            [
                T.StructField("window_start", T.TimestampType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("event_count", T.LongType()),
            ]
        ),
    )
    conn = _RecordingConn()
    sink = jdbc_upsert_sink("hourly_aggregations", lambda: conn, page_size=2)
    sink(batch, 0)
    assert conn.committed
    assert len(conn.rows) == 5
    assert len(conn.statements) == 3  # 2 + 2 + 1
    assert {s.count("(%s") for s in conn.statements} == {1, 2}


def test_jdbc_upsert_sink_drops_helper_columns(spark):
    """The streaming aggregate carries a duration_ms_count helper column;
    the sink must project to exactly the 8 persisted columns or executemany
    dies on the placeholder-count mismatch (round-1 advisory bug)."""
    from data_pipeline_zeal_spark.streaming.pipeline import (
        parse_events,
        streaming_hourly_aggregate,  # noqa: F401  (shape source documented)
    )
    from data_pipeline_zeal_spark.operators.hourly import aggregate_events
    import json

    raw = spark.createDataFrame(
        [
            (json.dumps({
                "event_id": f"e{i}", "user_id": f"u{i % 2}",
                "event_type": "page_view",
                "timestamp": "2024-01-01 10:00:00",
                "session_id": f"s{i}", "page_url": "/home",
                "duration_ms": 100 * i, "metadata": None,
            }),)
            for i in range(4)
        ],
        ["raw"],
    )
    # identical shape to the streaming path: 9 columns incl. the helper
    batch = aggregate_events(
        parse_events(raw),
        ts_col="timestamp",
        session_col="session_id",
        value_col="duration_ms",
    )
    assert "duration_ms_count" in batch.columns

    conn = _RecordingConn()
    sink = jdbc_upsert_sink("hourly_aggregations", lambda: conn)
    sink(batch, 0)
    assert conn.committed
    assert len(conn.rows) == 1
    assert len(conn.rows[0]) == 8
    # column order matches the INSERT list: the count lands at position 3
    assert conn.rows[0][3] == 4  # event_count
    assert conn.rows[0][4] == 2  # unique_user_count


def test_hll_weekly_rollup_matches_exact_within_error(spark):
    """Daily HLL sketches unioned to weeks must estimate weekly distinct
    users within HLL error bounds (lgK=12 → ~1.6% rsd; fixture
    cardinalities are far below saturation so expect near-exact)."""
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators.events_ext import (
        weekly_distinct_rollup,
    )

    ev = load_table(spark, SF_SMALL, "events")
    got = {r.week: r.est_users for r in weekly_distinct_rollup(ev).collect()}
    exact = {
        r.week: r.exact
        for r in ev.groupBy(F.date_trunc("week", "ts").alias("week"))
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for wk, est in got.items():
        assert abs(est - exact[wk]) <= max(2, 0.05 * exact[wk]), (wk, est, exact[wk])


def test_incremental_update_matches_full_recompute(spark):
    import datetime

    from data_pipeline_zeal_spark.operators import hourly

    t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    # window 10:00 gets events in BOTH halves (same user 1 in each, so
    # exact distinct across the boundary must be 1, not 2); window 11:00
    # is untouched; window 12:00 exists only in the new batch
    rows = [
        (1, t(10, 0), 1, "click", 2.0),
        (2, t(10, 30), 2, "click", None),
        (3, t(11, 0), 3, "view", 4.0),
        (4, t(10, 45), 1, "click", 6.0),   # new batch, touches 10:00
        (5, t(12, 5), 4, "view", 8.0),     # new batch, fresh window
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    from pyspark.sql import functions as F

    cut = t(10, 40)
    old = ev.filter(F.col("ts") < cut)
    new = ev.filter(F.col("ts") >= cut)
    merged = hourly.incremental_update(
        hourly.aggregate_events(old), ev, new
    )
    full = hourly.aggregate_events(ev)
    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    # round float sums: merged and full run different physical plans, so
    # raw doubles are not guaranteed bitwise-equal
    stable = lambda df: df.withColumn(  # noqa: E731
        "total_value", F.round("total_value", 6)
    ).withColumn("avg_value", F.round("avg_value", 6))
    got = {key(r): r.asDict() for r in stable(merged).collect()}
    want = {key(r): r.asDict() for r in stable(full).collect()}
    assert got == want
    assert got[(t(10, 0), "click")]["unique_user_count"] == 2  # users {1, 2}
    assert got[(t(10, 0), "click")]["event_count"] == 3
