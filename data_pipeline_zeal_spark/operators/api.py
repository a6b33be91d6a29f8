"""The API query surface as DataFrame functions (reference Q1-Q9).

The reference serves these as parameterized SQL templates executed by
Postgres (``api/src/infrastructure/queries/*.sql`` +
``api/src/routers/aggregations.py:58-219``).  Here each endpoint is a pure
DataFrame function over the hourly-aggregate table; Catalyst supplies the
parse/optimize/execute pipeline Postgres was providing (predicate pushdown,
TakeOrderedAndProject for top-k, partial aggregation for the rollups).

Determinism note: the reference orders by ``window_start DESC`` alone, which
under-determines row order when multiple event types share a window.  Every
sorted/paginated function below adds ``event_type`` as a tiebreaker so that
pagination is stable and oracle-comparable.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGGREGATION_COLUMNS = [
    "window_start",
    "window_end",
    "event_type",
    "event_count",
    "unique_user_count",
    "total_value",
    "avg_value",
]


def get_aggregations(
    agg: DataFrame,
    event_type: str | None = None,
    from_time: datetime | str | None = None,
    to_time: datetime | str | None = None,
    limit: int = 100,
    offset: int = 0,
) -> DataFrame:
    """Q1-Q5: projection + optional equality/range filters (ANDed) + sort +
    paginate (reference ``get_aggregations.sql`` +
    ``aggregations.py:66-86``: ``event_type = %s``, ``window_start >= %s``,
    ``window_end <= %s``, ``ORDER BY window_start DESC LIMIT %s OFFSET %s``)."""
    out = agg.select(*[c for c in AGGREGATION_COLUMNS if c in agg.columns])
    if event_type is not None:
        out = out.filter(F.col("event_type") == event_type)
    if from_time is not None:
        out = out.filter(F.col("window_start") >= F.lit(from_time))
    if to_time is not None:
        out = out.filter(F.col("window_end") <= F.lit(to_time))
    out = out.orderBy(F.desc("window_start"), F.asc("event_type"))
    if offset:
        out = out.offset(offset)
    return out.limit(limit)


def get_latest_aggregations(agg: DataFrame, limit: int = 10) -> DataFrame:
    """Q6: top-k by recency (reference ``get_latest_aggregations.sql:5-7``,
    ``ORDER BY created_at DESC LIMIT %s``; the fixture aggregate has no
    created_at — window_start is the recency key).  Catalyst plans this as
    TakeOrderedAndProject: no full sort, no single-node shuffle."""
    return agg.orderBy(F.desc("window_start"), F.asc("event_type")).limit(limit)


def get_stats(agg: DataFrame) -> DataFrame:
    """Q7: re-aggregation over the aggregate table per event_type
    (reference ``get_stats.sql:1-12``)."""
    return (
        agg.groupBy("event_type")
        .agg(
            F.sum("event_count").alias("total_events"),
            F.sum("unique_user_count").alias("total_unique_users"),
            F.round(F.avg("event_count"), 4).alias("avg_events_per_window"),
            F.count(F.lit(1)).alias("window_count"),
        )
        .orderBy(F.desc("total_events"), F.asc("event_type"))
    )


def get_event_types(agg: DataFrame) -> DataFrame:
    """Q8: DISTINCT event_type ORDER BY event_type
    (reference ``get_event_types.sql:1-3``)."""
    return agg.select("event_type").distinct().orderBy("event_type")


def rollup_by_type(agg: DataFrame) -> DataFrame:
    """Q9: the README's ad-hoc rollup (reference ``README.md:126-128``)."""
    return (
        agg.groupBy("event_type")
        .agg(F.sum("event_count").alias("total_events"))
        .orderBy("event_type")
    )
