"""[EXT] Mergeable count-min sketch over DataFrames.

The frequency twin of the HLL/GK sketches already in the engine
(``events_hll_weekly_users``, ``price_quantiles_sketch``): a fixed-size
counter table answering "how often does item x occur" with a one-sided
error (estimates never undercount; overcount probability shrinks with
width, per Cormode & Muthukrishnan 2005).  Because counter tables ADD,
per-partition / per-day sketches merge into rollups without touching raw
data — the property that matters at 100 TB, where "count everything
exactly, again" is the query you must never re-run.

Scale notes:
* ``cms_build`` is explode(depth) → one map-side-combined count keyed on
  (seed, bucket) — hashes are uniform by construction, so the shuffle
  cannot skew, and the result is AT MOST depth x width rows regardless of
  input size.
* ``cms_estimate`` probes depth buckets per queried item against the
  (tiny) counter table — a broadcast-friendly equality join, min-reduced.
* ``cms_merge`` is union + sum on the counter key: sketches built on
  disjoint slices compose exactly (pinned by a merge-law test).

Everything is JVM built-ins; the sketch rows are plain (seed, bucket, c)
so any engine (or the DuckDB oracle) can consume them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _probes(item: F.Column, depth: int, width: int) -> F.Column:
    """Array of (seed, bucket) probe structs for one item."""
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"),
                F.pmod(F.xxhash64(item, F.lit(s)), F.lit(width)).alias(
                    "bucket"
                ),
            )
            for s in range(depth)
        ]
    )


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 65536
) -> DataFrame:
    """Build a (seed, bucket, c) count-min counter table over ``col``.
    NULL items are skipped (SQL COUNT semantics)."""
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.explode(_probes(F.col(col), depth, width)).alias("p"))
        .groupBy(F.col("p.seed").alias("seed"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge counter tables built with the SAME (depth, width): union +
    sum per counter — the additivity that makes the sketch a rollup."""
    from functools import reduce

    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy("seed", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 65536,
) -> DataFrame:
    """Estimate the frequency of every (distinct) value of ``items.col``:
    min over the item's ``depth`` counters, 0 for never-seen items
    (missing buckets coalesce to 0).  The counter table is at most
    depth x width rows — broadcast it so the probe join never shuffles
    the item side."""
    probes = (
        items.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("item"))
        .distinct()
        .select("item", F.explode(_probes(F.col("item"), depth, width)).alias("p"))
        .select("item", F.col("p.seed").alias("seed"), F.col("p.bucket").alias("bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
