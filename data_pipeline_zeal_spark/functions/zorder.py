"""Multi-dimensional clustering keys for data-skipping layouts.

Parquet scans skip row groups whose footer min/max excludes the filter
range — but only if the write layout made those ranges tight.  A linear
sort gives tight ranges on ONE leading column; bit-interleaving the
dimensions into a Z-order (Morton) key gives bounded ranges on EVERY
participating column, which is what multi-predicate scans at 100 TB need
(the same layout move as Delta OPTIMIZE ZORDER / ClickHouse mortonEncode,
built here from Spark bit built-ins — everything stays in codegen).

The scaling step maps each dimension to an integer grid via its global
min/max — two scalar aggregates, one tiny driver round-trip at plan time,
exactly the statistics a table format would already have in its metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: A long has 63 usable positive bits; d interleaved dims get 63 // d each.
_MAX_KEY_BITS = 63


def _grid(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Scale a numeric column to the integer grid [0, 2**bits)."""
    cells = (1 << bits) - 1
    if hi <= lo:  # constant column: every row in cell 0
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
    return F.round(clamped * F.lit(float(cells))).cast("long")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton-interleaved clustering key over ``cols`` (numeric or
    timestamp).  ``bits`` grid bits per dimension, capped so the combined
    key fits a positive long.  Triggers ONE bounded aggregate to fetch the
    per-column min/max (plan-time scalars, not data volume)."""
    bits = min(bits, _MAX_KEY_BITS // len(cols))
    stats = df.select(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        # all-NULL column or empty frame: min/max come back None — treat as
        # a constant column (every row in cell 0) instead of comparing
        # None to float in _grid
        lo = stats[f"lo_{i}"] if stats[f"lo_{i}"] is not None else 0.0
        hi = stats[f"hi_{i}"] if stats[f"hi_{i}"] is not None else 0.0
        g = _grid(F.col(c), lo, hi, bits)
        # spread bit b of dim i to position b * ndims + i
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(g, b).bitwiseAND(F.lit(1)), b * len(cols) + i
                )
            )
    return key


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 32,
    zorder: bool = False,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Data-skipping-aware parquet write.

    ``zorder=False``: range-partition + sort on ``cluster_cols`` — tight
    footer stats on the leading column (time-series layout).
    ``zorder=True``: range-partition + sort on the Morton key — bounded
    footer stats on EVERY cluster column (multi-predicate layout).

    Either way the job is one range-exchange (sampled boundaries, no
    skew pile-up) plus an in-partition sort; downstream scans prune at
    the row-group level with zero reader-side cooperation."""
    if zorder:
        keyed = df.withColumn("__zkey", zorder_key(df, cluster_cols, bits))
        out = (
            keyed.repartitionByRange(num_files, "__zkey")
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
        )
    else:
        out = df.repartitionByRange(num_files, *cluster_cols).sortWithinPartitions(
            *cluster_cols
        )
    out.write.mode(mode).parquet(path)
