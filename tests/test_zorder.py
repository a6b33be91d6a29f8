"""Data-skipping layout tests: the clustered writers must produce parquet
whose row-group footer stats actually let a range predicate skip data.
Verified from the parquet footers themselves (pyarrow), reader-agnostic."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from data_pipeline_zeal_spark.functions.zorder import write_clustered, zorder_key
from data_pipeline_zeal_spark.io import load_table
from tests.conftest import SF_SMALL


def _row_group_ranges(path: str, col: str):
    """(min, max) of ``col`` for every row group under ``path``."""
    import glob
    import os

    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        pf = pq.ParquetFile(f)
        idx = pf.schema_arrow.get_field_index(col)
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            out.append((st.min, st.max))
    return out


def _selectivity(ranges, lo, hi):
    """Fraction of row groups a [lo, hi] predicate must read."""
    hit = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
    return hit / len(ranges)


def test_linear_clustering_skips_on_leading_column(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "by_user")
    write_clustered(ev, path, ["user_id"], num_files=8)
    ranges = _row_group_ranges(path, "user_id")
    assert len(ranges) >= 8
    # a ~10%-of-keyspace predicate should touch a small minority of groups
    keys_lo = min(mn for mn, _ in ranges)
    keys_hi = max(mx for _, mx in ranges)
    lo = keys_lo
    hi = keys_lo + max(1, (keys_hi - keys_lo) // 10)
    assert _selectivity(ranges, lo, hi) <= 0.35


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    # linear layout on user_id: value is unclustered -> no skipping on it
    write_clustered(ev, lin, ["user_id"], num_files=8)
    write_clustered(ev, zo, ["user_id", "value"], num_files=8, zorder=True)

    stats = ev.selectExpr(
        "min(value) lo", "max(value) hi", "min(user_id) ulo", "max(user_id) uhi"
    ).first()
    v_lo = stats.lo + 0.4 * (stats.hi - stats.lo)
    v_hi = stats.lo + 0.6 * (stats.hi - stats.lo)

    lin_sel = _selectivity(_row_group_ranges(lin, "value"), v_lo, v_hi)
    zo_sel = _selectivity(_row_group_ranges(zo, "value"), v_lo, v_hi)
    # the value dimension is only skippable under the z-order layout
    assert lin_sel == 1.0
    assert zo_sel < lin_sel
    # and user_id stays skippable too (bounded, even if coarser than linear)
    u_span = stats.uhi - stats.ulo
    zo_user = _selectivity(
        _row_group_ranges(zo, "user_id"), stats.ulo, stats.ulo + 0.1 * u_span
    )
    assert zo_user < 1.0


def test_zorder_key_interleaves_deterministically(spark):
    df = spark.createDataFrame([(0, 0), (3, 0), (0, 3), (3, 3)], "x int, y int")
    keyed = df.withColumn("z", zorder_key(df, ["x", "y"], bits=2)).orderBy("x", "y")
    got = {(r.x, r.y): r.z for r in keyed.collect()}
    # 2-bit grid: (0,0)->0; (3,0)->0b0101=5; (0,3)->0b1010=10; (3,3)->15
    assert got == {(0, 0): 0, (3, 0): 5, (0, 3): 10, (3, 3): 15}


def test_zorder_constant_column_is_safe(spark):
    df = spark.createDataFrame([(i, 7) for i in range(16)], "x int, c int")
    keyed = df.withColumn("z", zorder_key(df, ["x", "c"], bits=4))
    rows = keyed.collect()
    assert len({r.z for r in rows}) > 1  # x still differentiates
    assert all(r.z >= 0 for r in rows)


def test_zorder_key_all_null_column(spark):
    """All-NULL cluster column: min/max stats are None — must behave as a
    constant column (cell 0), not raise at plan time."""
    df = spark.createDataFrame(
        [(1, None), (2, None)], "a long, b double"
    )
    out = df.withColumn("zk", zorder_key(df, ["a", "b"])).collect()
    assert all(r.zk is not None for r in out)
