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


def functional_dependency(
    df: DataFrame,
    determinant: list[str],
    dependent: str,
    name: str | None = None,
) -> DataFrame:
    """FD check ``determinant -> dependent``: checked = distinct
    determinant keys (NULL-key tuples excluded, matching COUNT DISTINCT
    semantics everywhere else in this module); violations = keys mapping
    to MORE than one distinct non-null dependent value.  The schema-rule
    analogue of Deequ's uniqueness family — catches denormalization drift
    (one order shipping under two customers, one code with two labels).

    One determinant-keyed aggregate with map-side combine, then a tiny
    second aggregate over |keys| rows — no join, no window."""
    name = name or f"fd:{','.join(determinant)}->{dependent}"
    keys = (
        df.filter(
            reduce(
                lambda a, b: a & b,
                [F.col(c).isNotNull() for c in determinant],
            )
        )
        .groupBy(*determinant)
        .agg(F.count_distinct(F.col(dependent)).alias("n_dep"))
    )
    return keys.agg(
        *_result(
            name,
            F.count(F.lit(1)),
            F.coalesce(
                F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0)), F.lit(0)
            ),
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


def column_profile(
    df: DataFrame, columns: list[str], method: str = "exact"
) -> DataFrame:
    """Per-column statistical profile in long format: row count, null
    count/rate, distinct count, and (for numeric columns) min/max — the
    snapshot half of drift detection.

    One aggregate over one scan.  ``method="exact"`` uses
    ``countDistinct`` (k distinct columns → Catalyst's expand, k copies
    of the shuffle — the oracle anchor); ``method="approx"`` is the
    100 TB path: ``approx_count_distinct`` (HLL) keeps the whole profile
    a single-pass, expand-free, map-side-combined aggregate no matter how
    many columns are profiled."""
    if method not in ("exact", "approx"):
        raise ValueError(f"unknown method {method!r}")
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("byte", "short", "integer", "long", "float", "double", "decimal")
    }
    structs = []
    for c in columns:
        col = F.col(c)
        distinct = (
            F.countDistinct(col)
            if method == "exact"
            else F.approx_count_distinct(col)
        )
        is_num = c in numeric
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(F.sum(col.isNull().cast("long")), F.lit(0)).alias(
                    "n_null"
                ),
                distinct.cast("long").alias("n_distinct"),
                (
                    F.round(F.min(col).cast("double"), 6)
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("min_value"),
                (
                    F.round(F.max(col).cast("double"), 6)
                    if is_num
                    else F.lit(None).cast("double")
                ).alias("max_value"),
            ).alias(f"p_{c}")
        )
    row = df.agg(*structs)
    return (
        row.select(
            F.explode(F.array(*[F.col(f"p_{c}") for c in columns])).alias("p")
        )
        .select("p.*")
        .withColumn(
            "null_rate",
            F.round(F.col("n_null") / F.greatest("n_rows", F.lit(1)), 6),
        )
        .select(
            "col_name", "n_rows", "n_null", "null_rate",
            "n_distinct", "min_value", "max_value",
        )
    )


def profile_drift(
    before: DataFrame,
    after: DataFrame,
    columns: list[str],
    null_rate_tol: float = 0.05,
    distinct_ratio_tol: float = 2.0,
    method: str = "exact",
) -> DataFrame:
    """Column-level drift report between two snapshots of the same table —
    the "did today's load change the data?" gate a pipeline runs before
    promoting a batch.  Joins the two :func:`column_profile` frames on the
    column name (a #columns-row join — trivially broadcast) and flags a
    column as drifted when its null rate moved more than
    ``null_rate_tol`` or its distinct count changed by more than
    ``distinct_ratio_tol`` in either direction.  Cost = two profile scans;
    everything after is constant-size."""
    b = column_profile(before, columns, method=method)
    a = column_profile(after, columns, method=method)
    bb = b.select(
        "col_name",
        F.col("n_rows").alias("n_rows_before"),
        F.col("null_rate").alias("null_rate_before"),
        F.col("n_distinct").alias("n_distinct_before"),
        F.col("min_value").alias("min_before"),
        F.col("max_value").alias("max_before"),
    )
    aa = a.select(
        "col_name",
        F.col("n_rows").alias("n_rows_after"),
        F.col("null_rate").alias("null_rate_after"),
        F.col("n_distinct").alias("n_distinct_after"),
        F.col("min_value").alias("min_after"),
        F.col("max_value").alias("max_after"),
    )
    j = bb.join(aa, "col_name")
    null_delta = F.round(
        F.col("null_rate_after") - F.col("null_rate_before"), 6
    )
    ratio = F.round(
        F.col("n_distinct_after")
        / F.greatest("n_distinct_before", F.lit(1)),
        6,
    )
    # gate the ratio check on an actual count change: an all-NULL column
    # is 0 distinct on both sides, and 0/greatest(0,1) = 0 would otherwise
    # flag a bit-identical column as drifted
    drifted = (
        (F.abs(null_delta) > null_rate_tol)
        | (
            (F.col("n_distinct_before") != F.col("n_distinct_after"))
            & ((ratio > distinct_ratio_tol) | (ratio < 1.0 / distinct_ratio_tol))
        )
    )
    return j.select(
        "col_name",
        "n_rows_before",
        "n_rows_after",
        "null_rate_before",
        "null_rate_after",
        null_delta.alias("null_rate_delta"),
        "n_distinct_before",
        "n_distinct_after",
        ratio.alias("distinct_ratio"),
        "min_before",
        "min_after",
        "max_before",
        "max_after",
        drifted.cast("int").alias("drifted"),
    ).orderBy("col_name")


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 10
) -> DataFrame:
    """k-anonymity audit (Sweeney 2002, public): group the frame by its
    quasi-identifier columns and report every equivalence class with its
    size and whether it violates the ``k`` floor — a class smaller than
    ``k`` means those rows are re-identifiable by the quasi-identifier
    combination alone.  The release gate a training corpus carrying user
    attributes runs before export; pair with ``text.scrub_pii`` (which
    handles direct identifiers inside free text).

    Returns one row per class: (*quasi_cols, group_size, violates).
    NULL quasi-values form their own class (SQL GROUP BY semantics) —
    they are still a joinable signature for an attacker.

    SCALE: ONE map-side-combined groupBy on the quasi-identifier tuple —
    the same shape as any distinct-count; output cardinality is the
    number of classes, bounded by the quasi space, not the row count."""
    if not quasi_cols:
        raise ValueError("k_anonymity needs at least one quasi column")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("group_size"))
        .select(
            *quasi_cols,
            "group_size",
            (F.col("group_size") < k).cast("int").alias("violates"),
        )
        .orderBy(*quasi_cols)
    )


def l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2006, public):
    the follow-on gate to :func:`k_anonymity` — a class can satisfy the
    ``k`` size floor yet still leak if every member shares ONE sensitive
    value (the homogeneity attack), so each equivalence class over the
    quasi-identifiers must also contain at least ``l`` distinct values of
    ``sensitive_col``.

    Returns one row per class: (*quasi_cols, group_size,
    distinct_sensitive, violates).  NULL sensitive values do not count
    toward diversity (SQL ``COUNT(DISTINCT)`` skips NULL in both engines
    — a class of all-NULL sensitives reveals exactly that and violates).

    SCALE: still ONE shuffle — ``count(DISTINCT)`` alongside ``count(*)``
    in the same groupBy expands to Spark's two-phase distinct aggregate
    keyed on (quasi, sensitive) then (quasi): partial-aggregated
    map-side, never wider than the class count times the per-class
    sensitive cardinality."""
    if not quasi_cols:
        raise ValueError("l_diversity needs at least one quasi column")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct(sensitive_col).alias("distinct_sensitive"),
        )
        .select(
            *quasi_cols,
            "group_size",
            "distinct_sensitive",
            (F.col("distinct_sensitive") < l).cast("int").alias("violates"),
        )
        .orderBy(*quasi_cols)
    )
