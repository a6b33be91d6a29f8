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


def cosine_from_parts(d: Column, na: Column, nb: Column) -> Column:
    """Cosine from a precomputed dot product and per-side norms — the
    factored form of :func:`cosine` for broadcast top-k joins, where
    recomputing ``norm(a)`` / ``norm(b)`` per PAIR costs two extra
    ``zip_with``+``aggregate`` array passes per candidate x query.
    Factoring the norms onto each side before the join cuts the per-pair
    work to ONE dot product (~3x at any scale) and is bit-identical to
    :func:`cosine`: same doubles, same ``na * nb`` multiplication order,
    same division — so 6-dp-rounded oracle parity is preserved exactly.

    Callers must pass ``na`` / ``nb`` in the same operand order
    :func:`cosine` would use (``norm(a) * norm(b)``)."""
    nn = na * nb
    return F.when(nn == 0, F.lit(0.0)).otherwise(d / nn)
