"""Vector (array<float>) expressions — JVM-side higher-order functions.

``zip_with`` + ``aggregate`` keep the dot product inside codegen; everything
is cast to double before arithmetic so results are bit-stable across engines
(float-precision accumulation would drift from the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (0 when either norm is 0)."""
    d = dot(a, b)
    nn = norm(a) * norm(b)
    return F.when(nn == 0, F.lit(0.0)).otherwise(d / nn)
