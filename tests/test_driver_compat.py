"""Driver-harness compatibility guards.

The verify driver canonicalizes each query result by sorting a pandas frame
over ALL columns and hashing the values.  Array/map/struct output columns
make pandas cells unhashable and crash that comparison (round 2's only red
row, ``sim_quantized_embeddings``) — so no ORACLE-BACKED query may return a
complex-typed column.  Rows-only queries are exempt: the driver only counts
their rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entry
from tests.conftest import SF_SMALL

_QUERIES = entry.queries()
_ORACLES = entry.oracle_sql()


def test_every_oracle_has_a_query():
    missing = set(_ORACLES) - set(_QUERIES)
    assert not missing, f"oracles without queries: {sorted(missing)}"


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_backed_output_is_scalar_only(spark, name):
    df = _QUERIES[name](spark, SF_SMALL)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name} returns complex-typed columns {bad}; the driver canonicalizer "
        "crashes on list/dict cells — serialize them (concat_ws/to_json) or "
        "explode to scalar rows in BOTH engines"
    )


_ROWS_ONLY = sorted(set(_QUERIES) - set(_ORACLES))


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_queries_execute_with_stable_schema(spark, name):
    """The remaining rows-only queries (the payload-stubbed multimodal
    decode set — everything else is oracle-backed, incl. the round-7
    pinned-constant estimator oracles) have no oracle, so the driver only smoke-
    runs them — rehearse that here: they must execute on the fixture dir,
    return a deterministic row count across two runs, and keep a non-empty
    schema."""
    df1 = _QUERIES[name](spark, SF_SMALL)
    df2 = _QUERIES[name](spark, SF_SMALL)
    assert len(df1.columns) > 0
    n1, n2 = df1.count(), df2.count()
    assert n1 == n2
    assert df1.schema == df2.schema
