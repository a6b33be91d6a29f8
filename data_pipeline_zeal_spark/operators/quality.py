"""[EXT] Data-quality audit operators (Deequ / dbt-test-style constraints).

A pipeline feeding a 100 TB training run needs machine-checkable data
contracts at every hop: key uniqueness, referential integrity, null
budgets, domain ranges.  Each check here compiles to ONE aggregate (or
one anti-join + aggregate) over the audited frame and reports a
`(check, n_checked, n_violations)` row; `audit` unions any number of
checks into a single result frame so the whole contract runs as one job.

Scale notes (100 TB bar):
* Every check is a full-scan-then-tiny-result shape: no check ever
  materializes violating ROWS into the result (a separate
  ``violations()``-style drill-down can reuse the same predicates when a
  human needs examples).  FK checks are LEFT ANTI joins — at scale the
  parent key side is a hash relation (broadcast when small, shuffled
  otherwise, AQE's call); uniqueness is one groupBy on the key.
* The union of k checks is k independent jobs under one plan; Spark
  schedules their scans concurrently, and each contributes exactly one
  output row, so the audit's cost is the scans, never the combine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _result(name: str, checked: Column, violations: Column) -> list[Column]:
    return [
        F.lit(name).alias("check"),
        checked.cast("long").alias("n_checked"),
        violations.cast("long").alias("n_violations"),
    ]


def unique_key(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Violations = ``count(*) - count(DISTINCT cols)`` — rows beyond the
    first per key, where a row with ANY NULL key column always counts as a
    violation (SQL ``COUNT(DISTINCT ...)`` skips NULL tuples; NULL never
    equals NULL, so a NULL key can't witness uniqueness).  Matches the
    dq_audit DuckDB oracle's formulation exactly.  Empty frame: 0 checked,
    0 violations, passed."""
    name = name or f"unique:{','.join(cols)}"
    return df.agg(
        *_result(
            name,
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]),
        )
    )


def not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    return df.agg(
        *_result(
            name or f"not_null:{col}",
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.count(col),
        )
    )


def in_range(
    df: DataFrame, col: str, lo, hi, name: str | None = None
) -> DataFrame:
    """Violations = non-null values outside [lo, hi]."""
    out = (F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi))
    return df.agg(
        *_result(
            name or f"range:{col}",
            F.count(F.lit(1)),
            # coalesce: SUM over an empty frame is NULL, not 0
            F.coalesce(F.sum(F.when(out, 1).otherwise(0)), F.lit(0)),
        )
    )


def foreign_key(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Violations = child rows whose non-null key has no parent row."""
    name = name or f"fk:{col}->{parent_col}"
    total = child.agg(F.count(F.lit(1)).alias("t"))
    orphans = (
        child.filter(F.col(col).isNotNull())
        .join(
            parent.select(F.col(parent_col).alias(col)).distinct(),
            col,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v"))
    )
    return total.crossJoin(orphans).select(
        *_result(name, F.col("t"), F.col("v"))
    )


def accepted_values(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    bad = F.col(col).isNotNull() & ~F.col(col).isin(values)
    return df.agg(
        *_result(
            name or f"accepted:{col}",
            F.count(F.lit(1)),
            F.coalesce(F.sum(F.when(bad, 1).otherwise(0)), F.lit(0)),
        )
    )


def audit(checks: list[DataFrame]) -> DataFrame:
    """Union any number of single-row check frames into one audit result,
    ordered by check name, with a pass flag."""
    unioned = reduce(lambda a, b: a.unionByName(b), checks)
    return unioned.select(
        "check",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("check")
