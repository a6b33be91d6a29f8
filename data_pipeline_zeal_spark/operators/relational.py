"""[EXT] Advanced relational coverage: the remaining TPC-H query shapes
expressible over the trimmed fixture schema, plus pivot.

The reference has none of these (SURVEY.md §2.4 "Not present"); they complete
the join/subquery/window surface a warehouse user expects.  Shapes whose TPC-H
original needs columns the fixtures lack (partsupp, l_commitdate, c_phone) are
re-anchored on available columns and documented per-function.

Scale notes: every aggregate groups on low-cardinality keys (nation, year,
brand, mode) so partial aggregation collapses the shuffles; fixed dims
(region/nation) broadcast unconditionally, SF-scaled tables never carry hints
(AQE picks broadcast when a side is genuinely small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def _rev():
    # built lazily: column expressions touch the JVM, and this module must
    # import before any SparkContext exists (driver harness imports first)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q7: revenue shipped between two nations, by year and direction.

    Two independent nation lookups (both broadcast) on the supplier and
    customer sides; the fact chain lineitem→orders→customer shuffles on its
    keys once.  The (n1, n2) ≠ (n2, n1) pair filter runs post-join on the
    two tiny dim columns."""
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == nation_a) & (F.col("cust_nation") == nation_b)
    ) | ((F.col("supp_nation") == nation_b) & (F.col("cust_nation") == nation_a))
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from))
            & (F.col("l_shipdate") < F.lit(date_to))
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate")).alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "AMERICA",
    part_type: str = "ECONOMY",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8: the target nation's share of revenue for one part type sold
    into one region, by order year.  Share = conditional sum / sum — one
    aggregation, no self-join."""
    cust_region = (
        customer.join(
            nation.select("n_nationkey", "n_regionkey"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol = F.round(F.sum(_rev()), 4)
    target_vol = F.round(
        F.sum(F.when(F.col("supp_nation") == target_nation, _rev()).otherwise(0.0)), 4
    )
    return (
        lineitem.join(
            part.filter(F.col("p_type") == part_type),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit(date_from))
                & (F.col("o_orderdate") < F.lit(date_to))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust_region, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy(F.year(F.col("o_orderdate")).alias("o_year"))
        .agg(
            target_vol.alias("target_revenue"),
            vol.alias("total_revenue"),
            F.round(target_vol / vol, 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def product_type_revenue(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    name_contains: str = "red",
) -> DataFrame:
    """TPC-H Q9 shape: revenue by supplier nation x order year for parts
    whose name contains a color.  Deviation: the fixture has no partsupp, so
    this profiles discounted revenue rather than profit minus supply cost."""
    return (
        lineitem.join(
            part.filter(F.col("p_name").contains(name_contains)),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate")).alias("o_year"),
        )
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy("nation", F.desc("o_year"))
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13: histogram of customers by order count, including the
    zero-order bucket (left outer join, count of non-null keys).  Two
    aggregations on shrinking data: per-customer counts (#customers rows),
    then the histogram (≤ max-orders rows)."""
    per_cust = (
        customer.join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def top_suppliers_by_revenue(
    supplier: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue —
    aggregate, then a scalar-max comparison via an unpartitioned max over
    the already-tiny per-supplier aggregate (#suppliers rows)."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from))
            & (F.col("l_shipdate") < F.lit(date_to))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 4).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def supplier_part_variety(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    exclude_brand: str = "Brand#45",
    type_not_like: str = "MEDIUM%",
) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size).
    Deviation: supplier-part pairs come from observed lineitem trade (the
    fixture has no partsupp).  COUNT(DISTINCT) over a pre-deduplicated
    pair set keeps the expand off the raw fact table."""
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .dropDuplicates(["l_partkey", "l_suppkey"])
        .join(
            part.filter(
                (F.col("p_brand") != exclude_brand)
                & ~F.col("p_type").like(type_not_like)
                & F.col("p_size").isin(1, 4, 7, 15, 19, 23, 36, 49)
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


def small_quantity_revenue(
    part: DataFrame,
    lineitem: DataFrame,
    brand: str = "Brand#23",
    qty_factor: float = 0.5,
) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small orders were not
    taken — lineitems below ``qty_factor`` x the part's average quantity.
    The correlated scalar subquery becomes a per-part aggregate joined back
    to the fact (both sides shuffle on partkey once; at scale AQE handles
    the skewed popular parts)."""
    avg_qty = lineitem.groupBy(F.col("l_partkey").alias("aq_partkey")).agg(
        (F.avg("l_quantity") * qty_factor).alias("qty_cut")
    )
    return (
        lineitem.join(
            part.filter(F.col("p_brand") == brand),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(avg_qty, F.col("l_partkey") == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.round(F.round(F.sum("l_extendedprice"), 2) / 7.0, 4).alias(
                "avg_yearly"
            )
        )
    )


def disjunctive_bracket_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q19: revenue matching three disjunctive brand/size/quantity
    brackets.  One join; the OR-of-ANDs predicate stays a single filter so
    Catalyst can still push the common ``p_partkey`` equi-key into the join
    and the per-bracket ranges into the scans."""
    joined = lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(b1 | b2 | b3).agg(
        F.round(F.sum(_rev()), 4).alias("revenue")
    )


def idle_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    segments: list[str] | None = None,
    since: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22 shape: customers richer than the average positive account
    balance with no orders since ``since``, grouped by market segment.
    Deviations: the fixture has no phone-country prefix, so the cohort key
    is ``c_mktsegment``; and the fixture's dense order history means
    literally-never-ordered rich customers don't exist, so the anti-join is
    time-windowed (the business question "lapsed rich customers").  Scalar
    subquery broadcasts one row; anti-join keeps the big side
    unmaterialized."""
    segs = segments or ["AUTOMOBILE", "BUILDING", "FURNITURE"]
    cohort = customer.filter(F.col("c_mktsegment").isin(segs))
    avg_bal = cohort.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cohort.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderdate") >= F.lit(since)).select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


def error_event_context(events: DataFrame, window_minutes: int = 30) -> DataFrame:
    """Bounded-range temporal self-join: for each error event, how many
    OTHER events the same user produced within ±``window_minutes`` (the
    "what was the user doing around the failure" query).

    The scale path for range joins: bucket both sides into fixed HOUR
    buckets, explode each probe into its candidate buckets (2-3 for
    sub-hour windows) → EQUALITY join on (user, bucket) → exact range
    filter.  A naive ``|ts1 - ts2| <= w`` join is inequality-only
    (nested-loop, O(n²)); bucketing turns it into one hash join whose
    fan-out is the fixed window width.  Same trick as the minhash band
    join: equality keys first, verify exactly after."""
    n_buckets = window_minutes // 60 + 1
    ev = events.select(
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
    )
    cand = F.array(
        *[
            F.date_trunc(
                "hour", F.col("ts") + F.expr(f"INTERVAL {h} HOURS")
            )
            for h in range(-n_buckets, n_buckets + 1)
        ]
    )
    probes = events.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "ts",
        F.explode(F.array_distinct(cand)).alias("bucket"),
    )
    w = F.expr(f"INTERVAL {window_minutes} MINUTES")
    return (
        probes.join(
            ev,
            (probes["user_id"] == ev["r_user"]) & (probes["bucket"] == ev["bucket"]),
        )
        .filter(
            (F.col("r_ts") >= F.col("ts") - w)
            & (F.col("r_ts") <= F.col("ts") + w)
            & (F.col("r_event_id") != F.col("event_id"))
        )
        .groupBy("event_id", "user_id", "ts")
        .agg(F.count(F.lit(1)).alias("nearby_events"))
        .orderBy("event_id")
    )


def order_gaps(orders: DataFrame) -> DataFrame:
    """Analytic-window breadth over the order history: per-customer order
    sequence with lag (days since previous order), ntile spend quartile,
    and running spend.  ONE shuffle on o_custkey serves all three window
    frames; full-key ordering (date, orderkey) makes every function
    deterministic."""
    from pyspark.sql import Window

    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    spend = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(seq)).alias(
            "days_since_prev"
        ),
        F.ntile(4).over(spend).cast("int").alias("spend_quartile"),
        F.round(
            F.sum("o_totalprice").over(
                seq.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_spend"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


def type_hour_pivot(events: DataFrame, hours: list[int] | None = None) -> DataFrame:
    """Pivot: event counts per type x hour-of-day as a wide table.  The
    pivot values are enumerated explicitly so the plan is a single pass
    (no pivot-value discovery job) — the production rule for pivots on
    unbounded inputs."""
    hrs = hours if hours is not None else list(range(24))
    piv = (
        events.select("event_type", F.hour("ts").alias("h"))
        .groupBy("event_type")
        .pivot("h", hrs)
        .agg(F.count(F.lit(1)))
    )
    out = piv.select(
        "event_type",
        *[F.coalesce(F.col(str(h)), F.lit(0)).alias(f"h{h}") for h in hrs],
    )
    return out.orderBy("event_type")


def priority_year_grouping_sets(orders: DataFrame) -> DataFrame:
    """Revenue by explicit GROUPING SETS — (year, priority), (year),
    (priority), and grand total — in one pass over orders.

    Generalizes the cube/rollup surface (``daily_type_cube``,
    ``order_priority_rollup``) to arbitrary set lists: Catalyst expands
    the sets with a single Expand node, so the input is scanned once and
    the shuffle carries one row per (set, key) — the same property the
    SQL ``GROUPING SETS`` clause gives a warehouse user.  ``grouping()``
    flags disambiguate "NULL key" from "subtotal row"; o_totalprice is
    2-decimal so the rounded SUM is exact in both engines."""
    return (
        orders.select(
            F.year("o_orderdate").alias("o_year"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
        .groupingSets(
            [["o_year", "priority"], ["o_year"], ["priority"], []],
            "o_year",
            "priority",
        )
        .agg(
            F.grouping("o_year").cast("int").alias("g_year"),
            F.grouping("priority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy(
            F.col("g_year"),
            F.col("g_priority"),
            F.col("o_year").asc_nulls_first(),
            F.col("priority").asc_nulls_first(),
        )
    )


def hour_pivot_unpivot(events: DataFrame, hours: int = 8) -> DataFrame:
    """Unpivot (melt): the wide type x hour matrix from
    :func:`type_hour_pivot` folded back to long (event_type, hour, n)
    rows — the wide->long reshaping operator warehouses pair with PIVOT.
    ``DataFrame.unpivot`` expands columns inline (an Expand node — one
    pass, no join against a column-name table), so the round trip costs
    one extra projection over the pivot plan."""
    hrs = list(range(hours))
    wide = type_hour_pivot(events, hours=hrs)
    return (
        wide.unpivot(
            "event_type", [f"h{h}" for h in hrs], "hour_label", "n"
        )
        .select(
            "event_type",
            F.substring("hour_label", 2, 2).cast("int").alias("hour"),
            "n",
        )
        .orderBy("event_type", "hour")
    )

def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    size: int = 15,
    name_like: str = "%widget%",
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier in a region
    offering it at the minimum cost.  Deviation: the fixture has no
    partsupp, so "supply cost" is the minimum observed unit price
    (l_extendedprice / l_quantity) per (part, supplier) from trade history,
    and the part filter is (p_size, p_name LIKE) since p_type carries only
    six coarse values.

    The correlated MIN subquery becomes a per-part aggregate joined back on
    (partkey, cost) equality — the same two-phase min-per-group plan Q15/Q17
    use.  Region/nation broadcast; the per-pair cost table shuffles once on
    partkey and is reused for both the candidate set and the per-part min
    (cheaper than recomputing from the fact table)."""
    eligible = (
        supplier.join(
            F.broadcast(
                nation.join(
                    region.filter(F.col("r_name") == region_name),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
    )
    # fixed-point (1e-4) unit cost: floor of an IEEE quotient is identical
    # across engines, unlike round() on a .xxxx5 boundary (Spark rounds the
    # shortest-decimal rendering, DuckDB the raw binary — they disagree one
    # ulp below the half).  Integer min/equality downstream is then exact.
    costs = (
        lineitem.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.floor(
                    F.col("l_extendedprice") / F.col("l_quantity") * 10000
                )
            ).alias("unit_cost_e4")
        )
    )
    qualified = costs.join(
        part.filter(
            (F.col("p_size") == size) & F.col("p_name").like(name_like)
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    ).join(eligible, F.col("l_suppkey") == F.col("s_suppkey"))
    per_part_min = qualified.groupBy(
        F.col("p_partkey").alias("m_partkey")
    ).agg(F.min("unit_cost_e4").alias("min_cost"))
    return (
        qualified.join(
            per_part_min,
            (F.col("p_partkey") == F.col("m_partkey"))
            & (F.col("unit_cost_e4") == F.col("min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_name",
            "unit_cost_e4",
        )
        .orderBy(F.desc("s_acctbal"), "nation", "s_name", "p_partkey")
        .limit(limit)
    )


def important_part_values(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_7",
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's traded value.  Deviation: no partsupp, so "value" is revenue
    shipped by that nation's suppliers rather than supplycost x availqty.

    The scalar HAVING subquery (fraction of the grand total) broadcasts a
    single row against the already-aggregated per-part values — the
    group-vs-global comparison costs one extra tiny stage, never a second
    pass over the fact table.  The nation's supplier keys are a broadcast
    semi-join (bounded by suppliers-per-nation), so lineitem shuffles once,
    on partkey, after the filter."""
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    vals = (
        lineitem.join(
            F.broadcast(nat_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.round(F.sum(_rev()), 2).alias("part_value"))
    )
    cutoff = vals.agg(
        (F.sum("part_value") * F.lit(fraction)).alias("cutoff")
    )
    return (
        vals.join(F.broadcast(cutoff), F.col("part_value") > F.col("cutoff"))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def late_shipment_priority(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 365
) -> DataFrame:
    """TPC-H Q12 shape: critical- vs non-critical-priority line counts per
    category, restricted to late shipments.  Deviations: no l_shipmode /
    l_commitdate / l_receiptdate in the fixture, so the category is
    l_returnflag and "late" is shipped more than ``late_days`` after the
    order date.

    One fact-fact equi-join on orderkey (both sides shuffle once), then a
    conditional aggregation over three groups — the CASE WHEN collapses in
    the partial aggregate, so the final exchange carries six counters."""
    high = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > late_days
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def promotion_part_suppliers(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_3",
    name_like: str = "%bolt%",
    year: int = 1998,
    qty_min: float = 25.0,
) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation with substantial stock of a
    promoted part family.  Deviation: no partsupp availqty, so the inner
    threshold is "shipped more than ``qty_min`` units of a qualifying part
    during ``year``" (the original's availqty > half-of-year's-shipments
    collapses to a constant bound once availqty is gone).

    The nested-subquery chain (parts LIKE -> per-(part,supplier) year
    quantity -> suppliers) stays three semi-join stages, each shrinking:
    the fact table is filtered by year + part family BEFORE its one
    shuffle on (partkey, suppkey); the surviving supplier keys semi-join
    the dim."""
    fam = part.filter(F.col("p_name").like(name_like)).select("p_partkey")
    heavy = (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(fam, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > qty_min)
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


def waiting_orders_by_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_5",
    late_days: int = 365,
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finalized multi-supplier order.  Deviation: "late" is shipped more
    than ``late_days`` after the order date (no receipt/commit dates).

    The EXISTS (another supplier on the order) / NOT EXISTS (another LATE
    supplier) pair is re-expressed as one per-order aggregate — distinct
    supplier count and distinct late-supplier count — joined back to the
    late lines.  That replaces two correlated self-joins over the fact
    table (quadratic per order at scale) with one orderkey shuffle reused
    by both the aggregate and the join-back."""
    lo = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "o_orderkey",
            "l_suppkey",
            (
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                > late_days
            ).alias("is_late"),
        )
    )
    per_order = lo.groupBy("o_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    sole_late = (
        lo.filter(F.col("is_late"))
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            "o_orderkey",
        )
        .select("o_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        sole_late.join(
            supplier.join(
                F.broadcast(nation.filter(F.col("n_name") == nation_name)),
                F.col("s_nationkey") == F.col("n_nationkey"),
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(limit)
    )


def late_order_priority_check(
    orders: DataFrame,
    lineitem: DataFrame,
    from_date: str = "1995-07-01",
    to_date: str = "1995-10-01",
    late_days: int = 1400,
) -> DataFrame:
    """TPC-H Q4 shape: per-priority count of orders in a date window that
    have AT LEAST ONE problem line — the EXISTS-semi-join + rollup pattern
    (reference Q4 counts orders with a line where commitdate < receiptdate).
    Deviations: the fixture has no commit/receipt dates, so the problem
    line is one shipped more than ``late_days`` after the order date
    (1400 ≈ the fixture's p90 ship latency, so the predicate actually
    discriminates).

    LEFT SEMI join with the compound condition: the order row survives at
    most once no matter how many lines qualify — Catalyst plans a hash
    semi-join on orderkey with the date predicate as a join residual, so
    the fact table never produces duplicate order rows and no distinct is
    needed.  The date-window filter on orders pushes to the parquet scan."""
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(from_date))
        & (F.col("o_orderdate") < F.lit(to_date))
    )
    l = lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                > late_days
            ),
            "left_semi",
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
    from_date: str = "1995-07-01",
    to_date: str = "1995-10-01",
    limit: int = 20,
) -> DataFrame:
    """TPC-H Q10: top customers by revenue lost to returned items in a
    quarter.  Fact-fact equi-join lineitem(R-flag)×orders(window) — both
    filters push to the scans — then one customer-keyed aggregate;
    nation broadcasts (25 rows).  The final top-``limit`` is
    TakeOrderedAndProject (no global sort); c_custkey tiebreaks equal
    revenues so the cut is deterministic for the oracle."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(from_date))
        & (F.col("o_orderdate") < F.lit(to_date))
    ).select("o_orderkey", "o_custkey")
    l = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", rev.alias("rev")
    )
    per_cust = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
    )
    return (
        per_cust.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name"
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(limit)
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_quantity: float = 300.0,
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q18: customers holding orders whose total line quantity
    exceeds ``min_quantity``.  The IN-subquery (orders qualifying by a
    grouped HAVING over lineitem) becomes one lineitem aggregate reused
    twice: the qualifying keys semi-filter via an inner join (big-order
    keys are rare — the aggregate output after HAVING is tiny, so AQE
    broadcasts it), and the same row carries the total_qty the output
    needs, avoiding TPC-H's classic re-join of lineitem.  o_totalprice
    DESC + orderkey tiebreak → TakeOrderedAndProject."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > min_quantity)
    )
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(limit)
    )


def variance_decomposition(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """One-way variance decomposition (ANOVA table): how much of a
    measure's variance lies BETWEEN groups vs WITHIN them, with the
    F-statistic and effect size eta^2 — the "does this dimension explain
    the metric" screen run before any segmentation analysis.

    SCALE + cross-engine numerics: one map-side-combined aggregate per
    group collecting (n, sum, sum-of-squares) IN DECIMAL — decimal sums
    are exact, so the result is independent of partial-aggregation order
    (double sums of ~1e14 magnitudes differ across engines by more than
    any absolute rounding can absorb); the k-row group frame then reduces
    to one summary row, and only that constant-size arithmetic runs in
    floating point.  Uses the algebraic identities
    SSB = sum(s_g^2/n_g) - S^2/N and SSW = SS_total - sum(s_g^2/n_g),
    so no second pass over the data."""
    v = F.col(value_col).cast("decimal(18,2)")
    per_group = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum((v * v).cast("decimal(38,4)")).alias("ss"),
    )
    # decimal -> double goes THROUGH THE EXACT DECIMAL STRING: engines
    # disagree on direct decimal casts at 19 significant digits (observed:
    # DuckDB's is not correctly rounded), while string -> double is
    # correctly-rounded IEEE everywhere, so both sides get the identical
    # nearest double.
    dd = lambda c: F.col(c).cast("string").cast("double")  # noqa: E731
    terms = per_group.select(
        "n",
        dd("s").alias("s"),
        dd("ss").alias("ss"),
        (dd("s") * dd("s") / F.col("n")).alias("s2n"),
    )
    # the k-row reduce sums doubles: do it as a left fold over a SORTED
    # list so the summation order (hence every last ulp) is identical in
    # any engine and any partitioning — plain SUM is order-dependent and
    # a half-ulp difference at ~1e13 flips rounding boundaries
    ordered_sum = lambda c: F.aggregate(  # noqa: E731
        F.array_sort(F.collect_list(c)), F.lit(0.0), lambda a, x: a + x
    )
    out = terms.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("n").alias("n_rows"),
        ordered_sum("s").alias("S"),
        ordered_sum("ss").alias("SS"),
        ordered_sum("s2n").alias("S2N"),
    ).select(
        "n_groups",
        "n_rows",
        (F.col("S2N") - F.col("S") * F.col("S") / F.col("n_rows")).alias("ssb"),
        (F.col("SS") - F.col("S2N")).alias("ssw"),
    )
    f_stat = (F.col("ssb") / (F.col("n_groups") - 1)) / (
        F.col("ssw") / (F.col("n_rows") - F.col("n_groups"))
    )
    return out.select(
        "n_groups",
        "n_rows",
        F.round("ssb", 2).alias("ss_between"),
        F.round("ssw", 2).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
        F.round(F.col("ssb") / (F.col("ssb") + F.col("ssw")), 6).alias("eta_sq"),
    )
