"""Driver-contract rehearsal: every ``queries()`` entry with an oracle must
match the DuckDB result at sf0.001 (row count + column names + order-
insensitive values) — the same comparison shape the driver runs at sf0.01.
"""

from __future__ import annotations

import datetime
import math

import pytest

from tests.conftest import SF_SMALL

import __spark_entry__ as entry_mod


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 7)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return tuple(_norm_cell(x) for x in v.tolist())
        if isinstance(v, np.generic):
            return _norm_cell(v.item())
    except ImportError:
        pass
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sdf = QUERIES[name](spark, SF_SMALL)
    srows = sdf.collect()
    scols = sdf.columns

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    assert _normalize([tuple(r) for r in srows], scols) == _normalize(
        drows, dcols
    ), f"{name}: values differ"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, spark):
    sdf = QUERIES[name](spark, SF_SMALL)
    assert sdf.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
