"""Skew-mitigation utilities: salted two-phase aggregation.

When one grouping key dominates (the classic hot-user / hot-null problem),
a plain groupBy sends the whole hot key to one reducer.  Salting splits
each key into ``salt`` sub-keys for a parallel partial aggregate, then
merges the partials — two small shuffles instead of one skewed one.

AQE's skew-join handling covers *joins* automatically; this covers
*aggregations*, which AQE does not rebalance.  Associative aggregates only
(count/sum/min/max — the merge must be the same op).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → "fn(input)" with fn in
    {count, sum, min, max}.  Phase 1 groups by (keys..., random salt)
    — hot keys fan out over ``salt`` reducers; phase 2 merges partials
    grouped by the real keys (count partials merge by SUM).
    """
    merge_fn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    phase1_aggs, phase2_aggs = [], []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        fn = fn.strip().lower()
        arg = arg.rstrip(")").strip()
        if fn not in merge_fn:
            raise ValueError(f"non-mergeable aggregate: {spec}")
        # count(*) counts rows; count(col) must keep SQL null-skipping
        # semantics through the partial phase.
        col: Column = F.lit(1) if fn == "count" and arg in ("", "*") else F.col(arg)
        phase1_aggs.append(getattr(F, fn)(col).alias(out))
        phase2_aggs.append(merge_fn[fn](F.col(out)).alias(out))

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    )
    partial = salted.groupBy(*keys, "__salt").agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)
