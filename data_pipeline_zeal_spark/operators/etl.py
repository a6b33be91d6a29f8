"""[EXT] Batch ETL operator suite over the TPC-H-style star schema.

The reference has no joins, window functions, set ops, or grouping sets
(SURVEY.md §2.4 "Not present"); these extend the engine to the general batch
surface a user of the pipeline would reach for next.  Everything is plain
DataFrame API so Catalyst handles join reordering, predicate pushdown into the
parquet scans, and partial aggregation.

Scale design notes (targets: 1000-executor cluster, ~100 TB):

* Only FIXED-cardinality dimensions (region: 5 rows, nation: 25 rows) carry
  unconditional ``F.broadcast`` hints.  customer/supplier/part grow with the
  scale factor (SF x 150k/10k/200k rows — multi-GB at SF100+), so hinting them
  would force an OOM-prone driver-side build at the 100 TB target; we leave
  those joins unhinted and let size statistics + AQE pick broadcast when the
  side is actually small (they do at test SFs).  customer-orders and
  orders-lineitem are genuine shuffle joins on their keys; at scale those
  benefit from bucketing both tables on the join key (see ``sources/bucketing``
  notes) and AQE handles skewed keys.
* Aggregations group on low-cardinality keys (flags, priorities, nations) so
  map-side partial aggregation collapses the shuffle to ~partitions x groups.
* Double aggregates are rounded at the final projection to the exact decimal
  precision of the true value (inputs are fixed-decimal), which makes results
  bit-stable across engines and summation orders; averages divide the
  canonicalized sum.  Intermediate math stays in doubles inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1: pricing summary report over lineitem.

    One scan, one low-cardinality groupBy (6 groups) — at 100 TB this is
    shuffle-light because partial aggregation reduces each input partition to
    ≤6 rows before the exchange."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # Sums are rounded to the exact decimal precision of the true
            # value (inputs are fixed-decimal), which makes them bit-stable
            # across engines/summation orders; averages divide the already-
            # canonicalized sum so they inherit that stability.
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                6,
            ).alias("sum_charge"),
            F.round(F.round(F.sum("l_quantity"), 2) / F.count(F.lit(1)), 4).alias(
                "avg_qty"
            ),
            F.round(
                F.round(F.sum("l_extendedprice"), 2) / F.count(F.lit(1)), 4
            ).alias("avg_price"),
            F.round(F.round(F.sum("l_discount"), 2) / F.count(F.lit(1)), 6).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    limit: int = 10,
) -> DataFrame:
    """TPC-H Q3: top unshipped orders by revenue for one market segment.

    The segment filter keeps ~1/5 of customer, which still scales with SF, so
    no unconditional broadcast hint — AQE picks broadcast when the filtered
    side is actually small; orders↔lineitem is the real shuffle join on
    l_orderkey.  Final top-k is TakeOrderedAndProject (no global sort
    materialization)."""
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit(cutoff))
        .join(
            orders.filter(F.col("o_orderdate") < F.lit(cutoff)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == segment),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(limit)
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5: revenue from local suppliers per nation in one region.

    region/nation/supplier are tiny dimensions → broadcast all three; the plan
    keeps a single shuffle chain on orderkey.  The c_nationkey = s_nationkey
    co-location predicate is applied as a post-join filter, as in the spec."""
    dim = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit(date_from))
            & (F.col("o_orderdate") < F.lit(date_to))
        )
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        # customer/supplier scale with SF — no broadcast hint; AQE/size stats
        # choose broadcast when the side is genuinely small.
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


def revenue_forecast(
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
    disc_lo: float = 0.02,
    disc_hi: float = 0.08,
    qty_below: float = 24.0,
) -> DataFrame:
    """TPC-H Q6: filter-and-sum revenue change forecast.  Pure scan+filter →
    all predicates push to parquet row-group pruning; single-row output."""
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from))
        & (F.col("l_shipdate") < F.lit(date_to))
        & (F.col("l_discount") >= F.lit(disc_lo))
        & (F.col("l_discount") <= F.lit(disc_hi))
        & (F.col("l_quantity") < F.lit(qty_below))
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
            "revenue"
        )
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Ranking window function: top-k orders per customer by total price.

    Partitioned window (no global sort); o_orderkey tiebreaker makes ranks
    deterministic.  At scale this is one shuffle on o_custkey."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rank",
        )
    )


def customer_order_stats(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """Join + aggregate: per-nation customer order volume.  nation broadcast;
    customer↔orders shuffle join on custkey (AQE may broadcast customer at
    small SFs), then low-cardinality rollup."""
    return (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.countDistinct("o_custkey").alias("customer_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_revenue"),
            F.round(F.round(F.sum("o_totalprice"), 2) / F.count(F.lit(1)), 4).alias(
                "avg_order_value"
            ),
        )
        .orderBy("n_name")
    )


def nations_customers_without_suppliers(
    customer: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Set operation: nation keys with customers but no suppliers (EXCEPT).
    Both sides pre-aggregate to distinct keys before the set op — the
    exchange carries ≤25 rows regardless of input size."""
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


def nations_with_both(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """Set operation (INTERSECT): nation keys having BOTH customers and
    suppliers — the dual of :func:`nations_customers_without_suppliers`.
    Distinct-before-intersect keeps the exchange at ≤25 rows."""
    return (
        customer.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(supplier.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


def order_priority_rollup(orders: DataFrame) -> DataFrame:
    """GROUP BY ROLLUP(status, priority): subtotal hierarchy in one pass.
    Catalyst expands the grouping sets without rescanning the input."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_count"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def part_type_stats(part: DataFrame) -> DataFrame:
    """Dimension profiling: per (brand, type) size stats over part."""
    return (
        part.groupBy("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("part_count"),
            F.round(F.avg("p_size"), 4).alias("avg_size"),
            F.round(F.round(F.sum("p_retailprice"), 2) / F.count(F.lit(1)), 4).alias(
                "avg_retail"
            ),
        )
        .orderBy("p_brand", "p_type")
    )


def order_lineitem_detail(
    orders: DataFrame, lineitem: DataFrame, status: str = "F", limit: int = 100
) -> DataFrame:
    """Plain inner join + projection + deterministic paginate — the bread-and-
    butter ETL shape (filter pushes below the join on both sides)."""
    return (
        orders.filter(F.col("o_orderstatus") == status)
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "l_linenumber",
            "o_orderdate",
            F.round("l_extendedprice", 2).alias("l_extendedprice"),
            "l_returnflag",
        )
        .orderBy("o_orderkey", "l_linenumber")
        .limit(limit)
    )


def revenue_seasonality(orders: DataFrame, period: int = 12) -> DataFrame:
    """Classical (ratio-to-moving-average) time-series decomposition of
    monthly revenue: centered ``period``-month trend, multiplicative
    seasonal index per month-of-year, and the deseasonalized series — the
    "is December really up, or is that just December" readout.

    Scale shape: ONE aggregate collapses orders to the monthly series
    (map-side combined; the series is ≤ #months rows no matter the SF),
    and every window below runs over that tiny frame — a deliberate
    single-partition window over dozens of rows, not raw data.  Months at
    the series edges lack a full centered window and carry NULL trend,
    matching the textbook treatment; the seasonal index averages only
    months with trend."""
    from pyspark.sql import Window

    month = F.date_format(F.col("o_orderdate"), "yyyy-MM")
    series = (
        orders.groupBy(month.alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    half = period // 2
    w = Window.orderBy("month")
    win = w.rowsBetween(-half, half)
    n_in_win = F.count("revenue").over(win)
    if period % 2 == 0:
        # even period: the standard (period+1)-point centered window with
        # half-weight endpoints
        first_rev = F.first("revenue").over(win)
        last_rev = F.last("revenue").over(win)
        centered = F.when(
            n_in_win == period + 1,
            (F.sum("revenue").over(win) - (first_rev + last_rev) / 2)
            / period,
        )
    else:
        # odd period: a plain period-point centered moving average
        centered = F.when(
            n_in_win == period, F.sum("revenue").over(win) / period
        )
    with_trend = series.select(
        "month",
        "revenue",
        # floor-based cent quantization: engines' round(double, 2)
        # implementations can disagree by one ULP exactly at .5 cent
        # boundaries; floor over the same IEEE double cannot
        (F.floor(centered * 100 + 0.5) / 100).alias("trend"),
        F.substring("month", 6, 2).alias("moy"),
    )
    idx = (
        with_trend.filter(F.col("trend").isNotNull())
        .groupBy("moy")
        .agg(F.avg(F.col("revenue") / F.col("trend")).alias("seasonal_idx"))
    )
    # Cross-engine numerics: engines implement round(double, n)
    # differently on the same double (BigDecimal-exact vs multiply-based),
    # so the published index is derived via floor — floor over identical
    # IEEE doubles is identical everywhere — and the deseasonalized cents
    # divide by that exact micro-unit integer.
    idx6 = F.floor(F.col("seasonal_idx") * 1_000_000 + 0.5)
    # quantize the (already 2-dp) revenue to integer cents as well: the
    # engines' round(double, 2) can disagree by one ULP, and a 1-ulp
    # divisor/dividend difference flips the final cent at division
    # boundaries; integer cents / integer micro-index is exact
    rev_cents = F.floor(F.col("revenue") * 100 + 0.5)
    return (
        with_trend.join(F.broadcast(idx), "moy")
        .select(
            "month",
            "revenue",
            "trend",
            (idx6 / 1_000_000).alias("seasonal_idx"),
            (
                F.floor(rev_cents * 1_000_000 / idx6 + 0.5) / 100
            ).alias("deseasonalized"),
        )
        .orderBy("month")
    )


def cohort_ltv(orders: DataFrame) -> DataFrame:
    """Cohort lifetime-value triangle: customers grouped by first-order
    month, revenue and buyer counts accumulated at each later month
    offset — the revenue twin of the retention triangle
    (:func:`events_ext.weekly_cohort_retention`).

    Scale shape: the first-order aggregate and the per-(customer, month)
    pre-aggregate both shuffle ONCE on o_custkey (uniform key); the join
    is custkey⋈custkey so AQE co-locates it, and the final aggregate is
    tiny (#cohorts x #offsets).  Cumulative revenue comes from a window
    over the already-aggregated triangle (cohorts x offsets rows), never
    over raw orders."""
    from pyspark.sql import Window

    # month key as a 'yyyy-MM' STRING: every engine renders it identically
    # (date_trunc's return type varies date/timestamp across engines and
    # SF fixtures, which broke cross-engine hash parity both ways)
    month = F.date_format(F.col("o_orderdate"), "yyyy-MM")
    first = orders.groupBy("o_custkey").agg(F.min(month).alias("cohort_month"))
    per_cust_month = (
        orders.select("o_custkey", month.alias("month"), "o_totalprice")
        .groupBy("o_custkey", "month")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    offset = (
        12 * (F.substring("month", 1, 4).cast("int")
              - F.substring("cohort_month", 1, 4).cast("int"))
        + (F.substring("month", 6, 2).cast("int")
           - F.substring("cohort_month", 6, 2).cast("int"))
    )
    tri = (
        per_cust_month.join(first, "o_custkey")
        .groupBy("cohort_month", offset.alias("month_offset"))
        .agg(
            F.count(F.lit(1)).alias("buyers"),
            F.round(F.sum("rev"), 2).alias("revenue"),
        )
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return tri.select(
        "cohort_month",
        "month_offset",
        "buyers",
        "revenue",
        F.round(F.sum("revenue").over(w), 2).alias("cum_revenue"),
    ).orderBy("cohort_month", "month_offset")


def inactive_customers(
    customer: DataFrame,
    orders: DataFrame,
    date_from: str = "1995-01-01",
    date_to: str = "1995-07-01",
) -> DataFrame:
    """Anti-join: customers with NO orders in a window — left_anti keeps the
    big side unshuffled beyond its join key and never materializes matches."""
    active = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        customer.join(active, "c_custkey", "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


def part_search(
    part: DataFrame, name_prefix: str = "red ", type_like: str = "%STANDARD%"
) -> DataFrame:
    """String-predicate search: LIKE + prefix + regexp extraction.  String
    predicates push to the scan (StringStartsWith/StringContains reach the
    parquet reader)."""
    return (
        part.filter(
            F.col("p_name").startswith(name_prefix)
            | F.col("p_type").like(type_like)
        )
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_word"),
            F.upper(F.col("p_brand")).alias("brand_upper"),
        )
        .orderBy("p_partkey")
    )


def price_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per return flag (``percentile`` —
    exact, sort-based; use ``approx_percentile`` (t-digest/GK) at 100 TB
    where a full per-group sort is not worth it)."""
    pct = lambda q: F.round(  # noqa: E731
        F.percentile(F.col("l_extendedprice"), F.lit(q)), 4
    )
    return (
        lineitem.groupBy("l_returnflag")
        .agg(
            pct(0.25).alias("p25"),
            pct(0.5).alias("p50"),
            pct(0.75).alias("p75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


def price_quantiles_sketch(
    lineitem: DataFrame, accuracy: int = 10_000
) -> DataFrame:
    """Sketch-based percentiles (``approx_percentile``, Greenwald-Khanna):
    the 100 TB replacement for :func:`price_quantiles` — bounded memory per
    group and a mergeable partial state instead of a full per-group sort.
    Estimator-specific output → rows-only correctness; a pytest gate bounds
    the error vs the exact operator."""
    pct = F.approx_percentile(
        F.col("l_extendedprice"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
        F.lit(accuracy),
    )
    return (
        lineitem.groupBy("l_returnflag")
        .agg(pct.alias("p"), F.count(F.lit(1)).alias("n"))
        .select(
            "l_returnflag",
            F.round(F.col("p")[0], 4).alias("p25"),
            F.round(F.col("p")[1], 4).alias("p50"),
            F.round(F.col("p")[2], 4).alias("p75"),
            "n",
        )
        .orderBy("l_returnflag")
    )


def priority_with_returns(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Semi-join (EXISTS) coverage, TPC-H Q4 shape: count orders per
    priority that have at least one returned line item.  left_semi never
    duplicates or materializes the match side."""
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def returned_item_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    limit: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top customers by revenue lost to returns.
    Fact-side filter first, fixed dims broadcast, top-k TakeOrdered."""
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(limit)
    )


def promo_revenue_share(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: share of revenue from PROMO parts — conditional
    aggregation over the part dimension join (part scales with SF, so no
    unconditional broadcast hint)."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo), 4).alias("promo_revenue"),
            F.round(F.sum(rev), 4).alias("total_revenue"),
            F.round(
                F.round(F.sum(promo), 4) / F.round(F.sum(rev), 4) * 100.0, 6
            ).alias("promo_share_pct"),
        )
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_quantity: float = 200.0,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds a bound
    (aggregate-subquery + HAVING), joined back to customers.  The HAVING
    runs on the already-aggregated (small) side before the joins."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > min_quantity)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


def rfm_segments(
    orders: DataFrame,
    anchor: str = "2001-01-01",
    method: str = "auto",
    exact_max_rows: int = 10_000_000,
) -> DataFrame:
    """RFM customer segmentation: recency (days from a FIXED anchor date —
    a runtime ``max(date)`` would make results nondeterministic), frequency
    (order count) and monetary (total spend), each cut into quartiles.

    One customer-keyed aggregation, then quartile assignment:

    * ``method="exact"`` — three global ``ntile(4)`` windows with custkey
      tie-breaks: exact equal-count quartiles, but every (custkey, aggs)
      row funnels through ONE reducer for the sort.  The oracle anchor;
      only sane while #customers fits a single task.
    * ``method="approx"`` — the 100 TB path: one extra aggregate computes
      the 25/50/75 ``percentile_approx`` cut points for all three metrics,
      broadcast back (1 row) and applied as range predicates — map-only
      bucket assignment, no global sort, no single-partition exchange.
      Contract difference vs exact: ties sharing a metric value land in
      the same quartile (value-based, not equal-count), so bucket sizes
      are approximately — not exactly — n/4.
    * ``method="auto"`` — exact below ``exact_max_rows`` customers (one
      count() job), else approx — same flip as
      :func:`~..dedup.duplicate_clusters`.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    per_cust = per_cust.select(
        "o_custkey",
        F.datediff(F.lit(anchor).cast("date"), F.col("last_order")).alias(
            "recency_days"
        ),
        "frequency",
        "monetary",
    )
    if method == "auto":
        # orders.count() is a metadata-served UPPER BOUND on distinct
        # customers; counting per_cust would run the aggregation twice
        method = "exact" if orders.count() <= exact_max_rows else "approx"
    if method == "exact":
        r_w = Window.orderBy(F.asc("recency_days"), F.asc("o_custkey"))
        f_w = Window.orderBy(F.desc("frequency"), F.asc("o_custkey"))
        m_w = Window.orderBy(F.desc("monetary"), F.asc("o_custkey"))
        scored = per_cust.select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            F.ntile(4).over(r_w).alias("r_quartile"),
            F.ntile(4).over(f_w).alias("f_quartile"),
            F.ntile(4).over(m_w).alias("m_quartile"),
        )
    elif method == "approx":
        # Cut points: recency quartile 1 = LOWEST recency_days (most recent),
        # frequency/monetary quartile 1 = HIGHEST value.  bucket(x) =
        # 1 + #{cut points the row falls past}, computed against a
        # broadcast 1-row frame of three 3-element arrays.
        cuts = per_cust.agg(
            F.percentile_approx(
                "recency_days", [0.25, 0.50, 0.75], 10_000
            ).alias("r_cuts"),
            F.percentile_approx(
                "frequency", [0.75, 0.50, 0.25], 10_000
            ).alias("f_cuts"),
            F.percentile_approx(
                "monetary", [0.75, 0.50, 0.25], 10_000
            ).alias("m_cuts"),
        )
        n_past = lambda arr, cmp: F.size(F.filter(arr, cmp))  # noqa: E731
        scored = per_cust.crossJoin(F.broadcast(cuts)).select(
            "o_custkey",
            "recency_days",
            "frequency",
            "monetary",
            (
                F.lit(1)
                + n_past(F.col("r_cuts"), lambda c: F.col("recency_days") > c)
            ).alias("r_quartile"),
            (
                F.lit(1)
                + n_past(F.col("f_cuts"), lambda c: F.col("frequency") < c)
            ).alias("f_quartile"),
            (
                F.lit(1)
                + n_past(F.col("m_cuts"), lambda c: F.col("monetary") < c)
            ).alias("m_quartile"),
        )
    else:
        raise ValueError(f"unknown method: {method!r}")
    return scored.withColumn(
        "rfm",
        F.concat_ws(
            "", F.col("r_quartile"), F.col("f_quartile"), F.col("m_quartile")
        ),
    ).orderBy("o_custkey")


def part_basket_pairs(
    lineitem: DataFrame, min_support: int = 2, ordered: bool = True
) -> DataFrame:
    """Market-basket co-occurrence: pairs of parts appearing in the same
    order, kept when they co-occur in at least ``min_support`` orders.

    The association-mining primitive (frequent itemsets, k=2) over the
    order/lineitem model the reference never joins.  Plan shape for
    100 TB: ONE shuffle gathers each order's distinct parts into a sorted
    basket array (map-side-combined collect_set — baskets are tiny, TPC-H
    <= 7 lines), then the C(basket, 2) pairs expand INLINE via nested
    array transforms (codegen, no self-join, no second pass over
    lineitem), and one more shuffle counts per-pair support.  The earlier
    self-join formulation shuffled the projected table twice and joined;
    this shape halves the exchanged volume and cannot skew on hot
    orderkeys (the expansion happens where the basket row lives)."""
    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    )
    return _pairs_from_baskets(baskets, min_support=min_support, ordered=ordered)


def _pairs_from_baskets(
    baskets: DataFrame, min_support: int, ordered: bool = True
) -> DataFrame:
    """The pair-expansion + support-count stage of
    :func:`part_basket_pairs` over an already-built basket frame —
    factored out (r15) so :func:`basket_association_rules` can feed it
    its persisted basket frame instead of re-aggregating lineitem."""
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(parts, (x, i) -> "
                    "transform(slice(parts, i + 2, size(parts)), "
                    "y -> struct(x AS part_a, y AS part_b)))"
                )
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    out = (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= min_support)
    )
    # ordered=False skips the presentation sort (a rangepartition
    # exchange + global sort) for consumers that immediately re-key —
    # pagerank's edge normalization, the rules join (r15, guide §2.4:
    # an orderBy used only to make output deterministic is a shuffle)
    return out.orderBy(F.desc("n_orders"), "part_a", "part_b") if ordered else out


def basket_association_rules(
    lineitem: DataFrame,
    min_support: int = 2,
    min_confidence: float = 0.0,
    top_n: int = 100,
) -> DataFrame:
    """Association rules (A → B) from the k=2 frequent itemsets of
    :func:`part_basket_pairs`: support, confidence = P(B|A), and
    lift = P(B|A)/P(B).  Both rule directions are emitted per pair.

    Scale shape: pair supports come from the basket-expansion kernel (no
    self-join); per-item basket counts are ONE aggregate over the basket
    frame; both attach to the rules via item-keyed joins whose right side
    is |items| rows — broadcastable at any realistic catalog size.  The
    n_baskets denominator is a 1-row broadcast cross join.

    r15 (guide §5): the basket aggregate feeds THREE consumers (pair
    expansion, item supports, the n_baskets denominator) and the pair
    supports feed BOTH rule directions — lazily each consumer re-ran
    the lineitem scan + basket shuffle (4 full passes measured).  Both
    frames persist for the query's lifetime (session-cache convention:
    the bench's per-row isolation releases them)."""
    from pyspark import StorageLevel

    baskets = (
        lineitem.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
        .filter(F.size("parts") >= 2)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pair_support = _pairs_from_baskets(
        baskets, min_support=min_support
    ).persist(StorageLevel.MEMORY_AND_DISK)
    item_support = (
        baskets.select(F.explode("parts").alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("item_orders"))
    )
    n_baskets = baskets.agg(F.count(F.lit(1)).alias("n_baskets"))
    # both directions: (a → b) and (b → a)
    rules = pair_support.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "n_orders",
    ).unionByName(
        pair_support.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "n_orders",
        )
    )
    out = (
        rules.join(
            F.broadcast(
                item_support.select(
                    F.col("part").alias("antecedent"),
                    F.col("item_orders").alias("ante_orders"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                item_support.select(
                    F.col("part").alias("consequent"),
                    F.col("item_orders").alias("cons_orders"),
                )
            ),
            "consequent",
        )
        .join(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            F.col("n_orders").alias("support"),
            F.round(F.col("n_orders") / F.col("ante_orders"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("n_orders") / F.col("ante_orders"))
                / (F.col("cons_orders") / F.col("n_baskets")),
                6,
            ).alias("lift"),
        )
        .filter(F.col("confidence") >= min_confidence)
    )
    return out.orderBy(
        F.desc("lift"), F.desc("support"), "antecedent", "consequent"
    ).limit(top_n)


def customer_spend_deciles(
    customer: DataFrame,
    orders: DataFrame,
    method: str = "auto",
    exact_max_rows: int = 10_000_000,
) -> DataFrame:
    """Customer lifetime-spend deciles: total o_totalprice per customer
    (0 for the orderless), decile by descending spend, then per-decile
    size and spend boundaries — the segmentation table behind "top-10%
    customers" dashboards.

    * ``method="exact"`` — global NTILE(10) window (custkey tie-break):
      exact equal-count deciles, single-reducer sort of the (custkey,
      spend) frame.  The oracle anchor.
    * ``method="approx"`` — the 100 TB path: ``percentile_approx`` spend
      cut points at 90..10%, broadcast back (1 row) as range predicates —
      map-side decile assignment, no single-partition exchange.  Ties on
      spend land in one decile, so bucket sizes are ~n/10, not exactly.
    * ``method="auto"`` — exact below ``exact_max_rows`` customers (one
      count() job), else approx.
    """
    spend = orders.groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 2).alias("spend")
    )
    per_cust = (
        customer.select("c_custkey")
        .join(spend, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_custkey", F.coalesce(F.col("spend"), F.lit(0.0)).alias("spend")
        )
    )
    if method == "auto":
        # per_cust has exactly one row per customer, so probe the customer
        # table directly (parquet metadata count, no join execution)
        method = "exact" if customer.count() <= exact_max_rows else "approx"
    if method == "exact":
        w = Window.orderBy(F.desc("spend"), F.asc("c_custkey"))
        deciled = per_cust.withColumn("decile", F.ntile(10).over(w))
    elif method == "approx":
        # cuts = [p90, p80, ..., p10]; decile(x) = 1 + #{cut : x < cut}
        cuts = per_cust.agg(
            F.percentile_approx(
                "spend", [round(0.9 - 0.1 * i, 1) for i in range(9)], 10_000
            ).alias("cuts")
        )
        deciled = per_cust.crossJoin(F.broadcast(cuts)).select(
            "c_custkey",
            "spend",
            (
                F.lit(1)
                + F.size(F.filter(F.col("cuts"), lambda c: F.col("spend") < c))
            ).alias("decile"),
        )
    else:
        raise ValueError(f"unknown method: {method!r}")
    return (
        deciled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("spend"), 2).alias("total_spend"),
            F.round(F.max("spend"), 2).alias("max_spend"),
            F.round(F.min("spend"), 2).alias("min_spend"),
        )
        .orderBy("decile")
    )


def order_ship_latency(
    orders: DataFrame,
    lineitem: DataFrame,
    method: str = "auto",
    exact_max_rows: int = 50_000_000,
) -> DataFrame:
    """Order-to-ship latency distribution per order priority: how many
    days from order placement to each line's ship date — the fulfillment
    SLA readout (avg, p50/p90 spread, max) ops teams watch per priority
    class.

    One equality join orders⋈lineitem on the orderkey (the natural
    co-partitioned key; at warehouse layout both sides are bucketed on
    it, so AQE plans a local join), then one aggregate per priority —
    five output rows.  The exact ``percentile`` kernel materializes and
    sorts each priority's latency VALUES inside one aggregation buffer —
    with only 5 priorities a group is ~1/5 of ALL lines, so past
    ``exact_max_rows`` total lines ``method="auto"`` flips to
    ``percentile_approx`` (GK sketch, bounded memory, mergeable
    partials); exact below anchors the oracle."""
    lat = orders.join(
        lineitem, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("ship_days"),
    )
    if method == "auto":
        # probe the INPUT count (parquet metadata, no job) — each line
        # joins at most one order, so lineitem bounds the joined rows;
        # counting `lat` itself would execute the join twice
        method = "exact" if lineitem.count() <= exact_max_rows else "approx"
    if method == "exact":
        p50 = F.expr("percentile(ship_days, 0.5)")
        p90 = F.expr("percentile(ship_days, 0.9)")
    elif method == "approx":
        p50 = F.percentile_approx("ship_days", 0.5, 10_000)
        p90 = F.percentile_approx("ship_days", 0.9, 10_000)
    else:
        raise ValueError(f"unknown method: {method!r}")
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.avg("ship_days"), 4).alias("avg_days"),
            F.round(p50, 4).alias("p50_days"),
            F.round(p90, 4).alias("p90_days"),
            F.max("ship_days").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


def supplier_fulfillment_scorecard(lineitem: DataFrame) -> DataFrame:
    """Per-supplier fulfillment scorecard: line volume, revenue, return
    rate, and revenue-weighted return share — the vendor-quality table a
    procurement dashboard ranks on.

    Single map-side-combined aggregate keyed on l_suppkey (uniform TPC-H
    key); the return flags fold in as conditional sums, so no second
    pass and no join."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    returned = (F.col("l_returnflag") == "R").cast("int")
    return (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(revenue), 2).alias("revenue"),
            F.sum(returned).alias("n_returned"),
            F.round(F.sum(returned) / F.count(F.lit(1)), 6).alias(
                "return_rate"
            ),
            F.round(
                F.sum(F.when(F.col("l_returnflag") == "R", revenue).otherwise(0.0))
                / F.sum(revenue),
                6,
            ).alias("returned_revenue_share"),
        )
        .orderBy("l_suppkey")
    )


def order_backlog_timeline(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Daily open-order backlog: for every day on which an order opened or
    fully shipped, how many orders opened, how many closed, and how many
    were still open at end of day — the classic interval-concurrency
    count (orders here, but the same kernel answers "concurrent sessions"
    / "active subscriptions" / "beds occupied").

    An order is open from ``o_orderdate`` through its LAST ``l_shipdate``
    inclusive (orders with no line items never open).  The naive
    formulation range-joins every order interval against every day — a
    theta join that explodes at scale.  This kernel uses the standard
    sweep-line decomposition instead:

    1. one aggregate collapses lineitem to (orderkey, last_ship) — shuffle
       keyed by orderkey, map-side combined;
    2. each interval becomes two +-1 delta rows (map-only union);
    3. one aggregate sums deltas per day — the shuffle is bounded by the
       number of DISTINCT DAYS, not orders;
    4. one running sum over the per-day frame.  That final window is
       global-unpartitioned BY CONSTRUCTION on a frame whose size is the
       day count (~2.5k rows for 7 years) — bounded regardless of order
       volume, same argument as ``daily_moving_average``.
    """
    span = (
        lineitem.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
    )
    # both deltas come out of ONE pass over span (a union of two selects
    # would re-run the aggregate+join lineage once per branch)
    deltas = span.select(
        F.explode(
            F.array(
                F.struct(
                    F.date_trunc("day", "o_orderdate").alias("day"),
                    F.lit(1).alias("opened"),
                    F.lit(0).alias("closed"),
                ),
                F.struct(
                    F.date_trunc("day", "last_ship").alias("day"),
                    F.lit(0).alias("opened"),
                    F.lit(1).alias("closed"),
                ),
            )
        ).alias("d")
    ).select("d.*")
    daily = deltas.groupBy("day").agg(
        F.sum("opened").alias("n_opened"), F.sum("closed").alias("n_closed")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum(F.col("n_opened") - F.col("n_closed")).over(w).alias("backlog"),
    ).orderBy("day")


def supplier_concentration(lineitem: DataFrame) -> DataFrame:
    """Supply-concentration per part: each supplier's share of the part's
    total shipped quantity, folded into the Herfindahl-Hirschman index
    (sum of squared shares; 1.0 = single-supplier, 1/n = evenly split) —
    the sourcing-risk screen over the order book.

    Two aggregates under ONE partkey shuffle: (part, supplier) quantity,
    then a window total per part attaches the denominator in place (no
    join back), then the per-part fold.  Shares are ratios of exact
    integer-ish sums, so 6 dp rounding is engine-stable."""
    from pyspark.sql import Window

    per_supp = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    total = F.sum("qty").over(Window.partitionBy("l_partkey"))
    share = F.col("qty") / total
    # fold the squared shares in SORTED order so the floating sum is
    # bit-identical across engines/partitionings (a plain SUM's order-
    # dependent last ulp can straddle the 6 dp rounding boundary)
    return (
        per_supp.withColumn("share2", share * share)
        .groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("share2")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("hhi"),
        )
        .orderBy("l_partkey")
    )


def top_customer_revenue_share(
    orders: DataFrame, ks: tuple[int, ...] = (10, 100)
) -> DataFrame:
    """Revenue concentration: what share of total order revenue the top-k
    customers capture, for each ``k`` — the Pareto readout next to
    :func:`customer_spend_deciles` that needs NO global ranking window:
    the top-k spends come from ``TakeOrderedAndProject`` (per-partition
    heaps of k rows), the total from one scalar aggregate, and each k's
    share is a bounded union row.  Safe at any customer count for the
    fixed, small ``ks`` a dashboard shows."""
    from functools import reduce as _reduce

    per_cust = orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend")
    )
    total = per_cust.agg(F.sum("spend").alias("total_spend"))
    rows = []
    for k in ks:
        topk = per_cust.orderBy(F.desc("spend"), F.asc("o_custkey")).limit(k)
        rows.append(
            topk.agg(
                F.count(F.lit(1)).alias("n_customers"),
                F.sum("spend").alias("top_spend"),
            )
            .select(F.lit(k).alias("k"), "n_customers", "top_spend")
            .crossJoin(F.broadcast(total))
        )
    return (
        _reduce(lambda a, b: a.unionByName(b), rows)
        .select(
            "k",
            "n_customers",
            F.round("top_spend", 2).alias("top_spend"),
            F.round("total_spend", 2).alias("total_spend"),
            F.round(F.col("top_spend") / F.col("total_spend"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("k")
    )
