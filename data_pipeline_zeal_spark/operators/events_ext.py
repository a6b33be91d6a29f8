"""[EXT] Extended event-table operators: JSON extraction, cube, moving
windows, sessionization, ranking.

These widen the engine past the reference's five SQL templates to the
shapes an analytics user reaches for next.  All built-ins; the analytic
windows are partitioned (never a global unpartitioned sort over raw
events), and the sessionizer is the classic gap-and-island plan — one
shuffle on user_id, everything after is within-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def props_profile(events: DataFrame) -> DataFrame:
    """JSON property extraction + aggregate: the ``props`` column carries a
    JSON object; pull ``$.k`` as an int and profile it per event type.
    ``get_json_object`` is JVM-side (Jackson) — no Python in the path."""
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.col("k")).alias("k_present"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.round(F.avg("k"), 4).alias("k_avg"),
        )
        .orderBy("event_type")
    )


def daily_type_cube(events: DataFrame) -> DataFrame:
    """GROUP BY CUBE(day, event_type): all subtotal combinations in one
    pass (Catalyst expands grouping sets without rescanning)."""
    return (
        events.select(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .cube("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("day").asc_nulls_first(), F.col("event_type").asc_nulls_first()
        )
    )


def daily_moving_average(events: DataFrame, days: int = 7) -> DataFrame:
    """Daily event counts with a trailing N-day moving average — the
    monitoring-dashboard query.  Two-level: aggregate first (tiny), then a
    window over ~#days rows; the expensive input never sees the window."""
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-(days - 1), 0)
    return daily.select(
        "day",
        "n",
        F.round(F.avg("n").over(w), 4).alias(f"ma_{days}d"),
    ).orderBy("day")


def top_paths(
    events: DataFrame,
    k: int = 3,
    gap_minutes: int = 30,
    top_n: int = 20,
) -> DataFrame:
    """Journey mining: the most common ordered sequences of the first
    ``k`` event types per session (gap-based sessions, same
    gaps-and-islands kernel as :func:`sessionize`) — the product-analytics
    "what do users do first" query, and the n>2 generalization of
    :func:`type_transitions`.

    Scale shape: ONE user-keyed shuffle runs sessionization, in-session
    ranking, and the path assembly (all three windows share the
    (user_id, ts, event_id) sort); path assembly aggregates ≤ k tiny
    structs per session; the final per-path count is map-side combined and
    top-``top_n`` plans as TakeOrderedAndProject."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = events.select(
        "user_id", "ts", "event_id", "event_type", new_session.alias("is_new")
    ).withColumn(
        "session_num",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ranked = numbered.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "session_num").orderBy(*order)
        ),
    ).filter(F.col("rn") <= k)
    paths = (
        ranked.groupBy("user_id", "session_num")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "event_type"))
            ).alias("steps")
        )
        .select(
            F.concat_ws(
                ">", F.transform("steps", lambda s: s["event_type"])
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(top_n)
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session starts
    when a user is idle longer than ``gap_minutes``.  One shuffle on
    user_id; lag + running sum are within-partition.  Emits per-session
    stats — the batch analog of a streaming session window."""
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = events.select(
        "user_id", "ts", "event_id", new_session.alias("is_new")
    ).withColumn(
        "session_num",
        F.sum("is_new").over(
            Window.partitionBy("user_id").orderBy(*order).rowsBetween(
                Window.unboundedPreceding, 0
            )
        ),
    )
    return (
        numbered.groupBy("user_id", "session_num")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_num")
    )


def type_share(events: DataFrame) -> DataFrame:
    """Per-type event share of total — windowed aggregate over an
    aggregate (the single-row total broadcast happens via an unpartitioned
    window over #types rows, not over raw events)."""
    counts = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return counts.select(
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).alias("share"),
    ).orderBy("event_type")


def top_users_by_activity(events: DataFrame, k: int = 100) -> DataFrame:
    """Dense-ranked most-active users.  Top-k-THEN-rank: the aggregate's
    top k rows come out via TakeOrderedAndProject (no single-reducer sort
    of all #users rows — at 100 TB that's hundreds of millions); the
    unpartitioned dense_rank then runs over only k rows, which is exact
    because a row's dense rank depends only on rows ordered above it, all
    of which are inside the top-k set."""
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    topk = counts.orderBy(F.desc("n"), F.asc("user_id")).limit(k)
    w = Window.orderBy(F.desc("n"), F.asc("user_id"))
    return topk.select(
        "user_id",
        "n",
        F.dense_rank().over(w).cast("int").alias("activity_rank"),
    ).orderBy(F.desc("n"), F.asc("user_id"))


def weekly_cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted as
    active at each later week offset — the classic growth-analytics
    triangle.

    Scale shape: (user, week) dedup and the first-seen aggregate both
    shuffle on user-dominated keys (uniform); the join is user⋈user on
    the same key so AQE can co-locate it, and the final aggregate is tiny
    (#cohorts × #offsets).  No window over raw events."""
    week = F.date_trunc("week", F.col("ts"))
    first = events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    activity = events.select("user_id", week.alias("week")).distinct()
    offset = (
        (F.col("week").cast("long") - F.col("cohort_week").cast("long"))
        / F.lit(7 * 86400)
    ).cast("int")
    return (
        activity.join(first, "user_id")
        .groupBy("cohort_week", offset.alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


def hour_of_day_profile(events: DataFrame) -> DataFrame:
    """Diurnal profile: counts by hour-of-day x type (date-part coverage)."""
    return (
        events.groupBy(
            F.hour(F.col("ts")).alias("hour_of_day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("unique_users"),
        )
        .orderBy("hour_of_day", "event_type")
    )


def approx_distinct_users(events: DataFrame, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog distinct-user counts per type — the documented 100 TB
    alternative to exact distinct (bounded state vs the reference's
    unbounded sets).  Estimator-specific → rows-only correctness check."""
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd).alias("approx_users"))
        .orderBy("event_type")
    )


def session_window_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native Spark session windows (``F.session_window``): per-user
    activity sessions that merge while events are within ``gap``.  Batch
    form here; the identical expression works in Structured Streaming with
    a watermark (merging session state) — the operator the reference lacks
    (SURVEY §2.4: tumbling only).  Cross-checked against the gaps-and-
    islands SQL formulation in the oracle."""
    return (
        events.groupBy("user_id", F.session_window(F.col("ts"), gap).alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


def sliding_window_counts(
    events: DataFrame, width: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding (hopping) windows: each event lands in width/slide windows.
    Spark expands assignments inline (no self-join); the aggregate stays
    (windows x types)-sized."""
    return (
        events.groupBy(
            F.window(F.col("ts"), width, slide).alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
        .orderBy("window_start", "event_type")
    )


def value_histogram(events: DataFrame, bin_width: float = 10.0) -> DataFrame:
    """Fixed-width histogram of the value column per event type — the
    profiling primitive behind dashboards and outlier triage.  Map-only
    bin assignment + a tiny (type x bin) aggregate: the shuffle carries one
    row per occupied bin, independent of input size."""
    bin_col = F.floor(F.col("value") / F.lit(bin_width)).cast("long")
    return (
        events.filter(F.col("value").isNotNull())
        .select("event_type", bin_col.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            F.round(F.col("bin") * bin_width, 2).alias("bin_lo"),
            "n",
        )
        .orderBy("event_type", "bin")
    )


def user_burst_profile(
    events: DataFrame, window_seconds: int = 300, min_events: int = 10
) -> DataFrame:
    """Per-user burst detection: the peak event count inside ANY sliding
    ``window_seconds`` window, against the user's own steady-state rate —
    the velocity signal abuse/fraud screens lead with (a scraper's
    60-events-in-5-minutes looks nothing like its daily average).

    Exact sliding peak via a RANGE window on epoch seconds: each event
    counts the events in its trailing window, so the max over events IS
    the max over all window placements ending at an event — no window
    grid, no self-join.  One user-keyed shuffle shared by the range
    window and the per-user aggregate; users below ``min_events`` are
    noise and dropped.  burst_ratio divides the peak by the expected
    count per window at the user's average rate over their active span
    (span floored at one window so drive-by users don't divide by ~0)."""
    ev = events.select(
        "user_id", F.col("ts").cast("long").alias("epoch")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-(window_seconds - 1), 0)
    )
    counted = ev.withColumn("in_window", F.count(F.lit(1)).over(w))
    per_user = counted.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("in_window").alias("peak_window"),
        (F.max("epoch") - F.min("epoch")).alias("span_s"),
    )
    span = F.greatest(F.col("span_s"), F.lit(window_seconds))
    expected = F.col("n_events") * window_seconds / span
    return (
        per_user.filter(F.col("n_events") >= min_events)
        .select(
            "user_id",
            "n_events",
            "peak_window",
            # floor-quantized: engines' round(double, 4) can differ one ULP
            # at .5 boundaries; floor over identical doubles cannot
            (F.floor(expected * 10_000 + 0.5) / 10_000).alias(
                "expected_per_window"
            ),
            (
                F.floor(F.col("peak_window") / expected * 10_000 + 0.5)
                / 10_000
            ).alias("burst_ratio"),
        )
        .orderBy("user_id")
    )


def daily_anomaly_mad(events: DataFrame, k: float = 3.5) -> DataFrame:
    """Robust daily anomaly flags per type: deviation from the per-type
    MEDIAN in units of the median absolute deviation (MAD) — the
    break-down-resistant twin of :func:`daily_anomaly_zscore` (one wild
    day inflates a trailing stddev and masks later anomalies; it barely
    moves the median).  ``k=3.5`` is the conventional Iglewicz-Hoaglin
    cutoff on the modified z-score 0.6745*(x-med)/MAD.

    Scale shape: the daily aggregate collapses events to #days x #types
    rows FIRST (map-side combined); both medians are exact percentiles
    over that bounded frame grouped by type — never over raw events.  The
    day-level frame joins back on event_type (bounded broadcast)."""
    daily = events.groupBy(
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    med = daily.groupBy("event_type").agg(
        F.expr("percentile(n, 0.5)").alias("med")
    )
    abs_dev = daily.join(F.broadcast(med), "event_type").select(
        "day",
        "event_type",
        "n",
        "med",
        F.abs(F.col("n") - F.col("med")).alias("adev"),
    )
    mad = abs_dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    scored = abs_dev.join(F.broadcast(mad), "event_type")
    mz = F.when(
        F.col("mad") > 0, 0.6745 * (F.col("n") - F.col("med")) / F.col("mad")
    ).otherwise(F.lit(0.0))
    return scored.select(
        "day",
        "event_type",
        "n",
        F.round("med", 1).alias("median_n"),
        F.round("mad", 1).alias("mad"),
        F.round(mz, 4).alias("modified_z"),
        (F.abs(mz) > k).cast("int").alias("is_anomaly"),
    ).orderBy("day", "event_type")


def daily_anomaly_zscore(events: DataFrame, trailing_days: int = 7) -> DataFrame:
    """Daily event-count anomaly score per type: z-score of each day's
    count against its own trailing window (previous ``trailing_days`` days,
    current day excluded).

    The variance is derived from EXACT integer window sums
    (count/sum/sum-of-squares) so both engines perform the identical final
    double divisions — numerically stable cross-engine, unlike streaming
    stddev implementations (Welford vs naive) which differ in the last ulp.
    Daily counts per type are a tiny aggregate regardless of input size;
    the window partitions by type (bounded cardinality)."""
    daily = (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-trailing_days, -1)
    )
    cnt_w = F.count("n").over(w)
    sum_w = F.sum("n").over(w)
    sumsq_w = F.sum(F.col("n") * F.col("n")).over(w)
    mean = sum_w / cnt_w
    var = (sumsq_w - sum_w * sum_w / cnt_w) / (cnt_w - 1)
    # CASE guards keep every division's divisor provably nonzero — ANSI
    # mode (the Spark-4 default, and what the driver's vanilla session
    # runs) raises DIVIDE_BY_ZERO instead of returning NULL.
    mean_out = F.when(cnt_w >= 1, F.round(mean, 4))
    z_out = F.when(
        cnt_w >= 2,
        F.when(var > 0, F.round((F.col("n") - mean) / F.sqrt(var), 4)),
    )
    return (
        daily.select(
            "day",
            "event_type",
            "n",
            cnt_w.alias("n_trailing"),
            mean_out.alias("trailing_mean"),
            z_out.alias("zscore"),
        )
        .orderBy("day", "event_type")
    )


def weekly_distinct_rollup(events: DataFrame, lg_config_k: int = 12) -> DataFrame:
    """Re-aggregatable distinct-user rollup via HLL sketches: daily
    sketches union into weekly estimates.

    THE 100 TB distinct-count pattern: exact `countDistinct` results can't
    be merged upward (distinct isn't additive), so a day->week->month
    rollup would rescan raw events per grain.  Datasketches HLL states DO
    union losslessly — each grain aggregates the previous grain's
    sketches, the raw table is read exactly once, and the sketch column
    can be persisted in the daily rollup table for any future re-slice.
    (`approx_count_distinct` gives an estimate but not a mergeable state
    column; `hll_sketch_agg`/`hll_union_agg` are the Spark 3.5+ primitives
    for this.)  Estimator-specific output — verified against exact weekly
    distincts with an error gate in pytest, not a SQL oracle."""
    daily = events.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(lg_config_k)).alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        daily.groupBy(F.date_trunc("week", F.col("day")).alias("week"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("sk"), F.lit(False))
            ).alias("est_users"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("week")
    )


def type_transitions(events: DataFrame) -> DataFrame:
    """Per-user event-type transition matrix (Markov bigrams): for every
    consecutive pair of events by the same user, count ``from_type ->
    to_type`` and the share of each outgoing edge.

    The user-journey primitive the reference's per-type windows can't
    express (its state is keyed by (window, type) only —
    ``processor/src/domain/aggregation.py:44``).  Plan: one shuffle on
    user_id, ``lag`` within the sorted partition (ts, event_id tiebreak so
    equal timestamps order identically everywhere), then a tiny
    (|types| x |types|)-row aggregate; ``share`` divides two exact counts
    so the result is engine-stable."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    edges = steps.groupBy(
        F.col("prev_type").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    out_w = Window.partitionBy("from_type")
    return (
        edges.withColumn(
            "share", F.round(F.col("n") / F.sum("n").over(out_w), 6)
        )
        .orderBy("from_type", "to_type")
    )


def value_percentiles(
    events: DataFrame,
    method: str = "auto",
    exact_max_rows: int = 50_000_000,
) -> DataFrame:
    """Quartiles of ``value`` per event type (the latency/size-
    distribution readout every ops dashboard wants next to the mean).

    ``percentile`` is Spark's exact interpolated kernel — a per-group
    sort of the VALUES ONLY (nulls skipped), but with a handful of event
    types one group's buffer holds a large share of ALL rows, so past
    ``exact_max_rows`` total events ``method="auto"`` flips to the GK
    sketch (``percentile_approx``: bounded memory, mergeable partials —
    same machinery as ``etl.price_quantiles_sketch``); exact below
    anchors the oracle."""
    if method == "auto":
        method = "exact" if events.count() <= exact_max_rows else "approx"
    if method == "exact":
        q = lambda p: F.expr(f"percentile(value, {p})")  # noqa: E731
    elif method == "approx":
        q = lambda p: F.percentile_approx("value", p, 10_000)  # noqa: E731
    else:
        raise ValueError(f"unknown method: {method!r}")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("value").alias("n_values"),
            F.round(q(0.25), 6).alias("p25"),
            F.round(q(0.5), 6).alias("p50"),
            F.round(q(0.75), 6).alias("p75"),
        )
        .orderBy("event_type")
    )


def _window_touches(events: DataFrame, window_hours: int) -> DataFrame:
    """Shared attribution kernel: the verified (p_id, user_id, ts, c_ts,
    c_id) click-touch candidates for every purchase, via the bucketed
    range-join shape — clicks key on their DAY bucket, each purchase
    probes every day bucket its window can touch (a superset costs
    nothing: an empty bucket joins to nothing), the join is EQUALITY on
    (user, bucket), and the exact range predicate verifies after.  Both
    attribution modes consume this frame."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        F.date_trunc("day", F.col("ts")).alias("bucket"),
    )
    w = F.expr(f"INTERVAL {window_hours} HOURS")
    probes = purchases.select(
        "p_id",
        "user_id",
        "ts",
        F.explode(
            F.array_distinct(
                F.array(
                    *[
                        F.date_trunc(
                            "day", F.col("ts") - F.expr(f"INTERVAL {d} DAYS")
                        )
                        for d in range(window_hours // 24 + 2)
                    ]
                )
            )
        ).alias("bucket"),
    )
    return (
        probes.join(
            clicks,
            (probes["user_id"] == clicks["c_user"])
            & (probes["bucket"] == clicks["bucket"]),
        )
        .filter((F.col("c_ts") >= F.col("ts") - w) & (F.col("c_ts") <= F.col("ts")))
        .select("p_id", "user_id", "ts", "c_ts", "c_id")
    )


def first_touch_attribution(events: DataFrame, window_hours: int = 24) -> DataFrame:
    """Marketing first-touch attribution: for each purchase, the EARLIEST
    click by the same user within the preceding ``window_hours`` (ties on
    click time broken by event_id).  Complements the as-of join's
    last-touch semantics (`operators/asof.py`).  Candidates come from the
    shared :func:`_window_touches` kernel (bucketed range join, no
    inequality join); one map-side-combined ``min_by(struct)`` picks the
    first touch, and unattributed purchases survive the left join."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    attributed = (
        _window_touches(events, window_hours)
        .groupBy("p_id")
        .agg(
            F.min_by(
                F.struct("c_ts", "c_id"), F.struct("c_ts", "c_id")
            ).alias("first")
        )
        .select(
            F.col("p_id").alias("event_id"),
            F.col("first.c_ts").alias("first_click_ts"),
            F.col("first.c_id").alias("first_click_id"),
        )
    )
    return purchases.join(attributed, "event_id", "left").orderBy("event_id")


def daily_trend(events: DataFrame) -> DataFrame:
    """Per-type linear trend of daily event counts: slope and intercept of
    an OLS fit over (day_index, daily_count), plus the correlation — the
    "is this event type growing" readout behind capacity dashboards.

    Two aggregations, no window: one to daily counts (shuffle bounded by
    days x types), one computing the closed-form OLS moments
    (``covar_pop`` / ``var_pop`` / ``corr`` are single-pass mergeable
    aggregates, so the fit costs the same as a sum at any scale)."""
    daily = events.groupBy(
        F.col("event_type"),
        F.date_trunc("day", F.col("ts")).alias("day"),
    ).agg(F.count(F.lit(1)).alias("n"))
    x = F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")).cast("double")
    moments = (
        daily.select("event_type", x.alias("x"), F.col("n").cast("double").alias("y"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.covar_pop("x", "y").alias("sxy"),
            F.var_pop("x").alias("sxx"),
            F.avg("x").alias("mx"),
            F.avg("y").alias("my"),
            F.corr("x", "y").alias("r"),
        )
    )
    slope = F.when(F.col("sxx") == 0, F.lit(0.0)).otherwise(
        F.col("sxy") / F.col("sxx")
    )
    return moments.select(
        "event_type",
        F.col("n_days").cast("long").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("intercept"),
        F.round(F.coalesce(F.col("r"), F.lit(0.0)), 6).alias("correlation"),
    ).orderBy("event_type")


def linear_attribution(events: DataFrame, window_hours: int = 24) -> DataFrame:
    """Linear multi-touch attribution: every click in the lookback window
    before a purchase shares the credit equally (credit = 1/n_touches),
    aggregated to per-user credited touch counts and credit mass — the
    multi-touch counterpart of :func:`first_touch_attribution`, built on
    the same :func:`_window_touches` kernel.

    Output is one row per user who has at least one attributed purchase:
    purchases touched, distinct credited clicks, and total credit mass
    (equals the number of attributed purchases by construction — pinned
    in the oracle)."""
    touches = (
        _window_touches(events, window_hours)
        .select("p_id", "user_id", "c_id")
        .distinct()
    )
    per_purchase = touches.groupBy("p_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    credited = touches.join(per_purchase, ["p_id", "user_id"]).select(
        "p_id", "user_id", "c_id", (F.lit(1.0) / F.col("n_touches")).alias("credit")
    )
    return (
        credited.groupBy("user_id")
        .agg(
            F.countDistinct("p_id").alias("n_purchases_attributed"),
            F.countDistinct("c_id").alias("n_clicks_credited"),
            F.round(F.sum("credit"), 6).alias("credit_mass"),
        )
        .orderBy("user_id")
    )


def time_decay_attribution(
    events: DataFrame, window_hours: int = 24, half_life_hours: float = 6.0
) -> DataFrame:
    """Time-decay multi-touch attribution: every click in the lookback
    window before a purchase gets weight 0.5^(age / half_life) and the
    purchase's credit splits proportionally — recency-weighted, the third
    member of the first/linear/decay attribution trio, on the same
    bucketed range-join kernel (:func:`_window_touches`).

    Per-purchase normalization is a window sum under the SAME
    (purchase, user) shuffle that the credit projection uses — no second
    aggregate, no join back.  Credit mass per user still equals the
    number of attributed purchases (shares sum to 1 by construction);
    ``decay_weight_mass`` carries the un-normalized recency signal.
    Ages are whole-second (unix-timestamp) differences so the weights
    are bit-stable across engines."""
    touches = (
        _window_touches(events, window_hours)
        .select("p_id", "user_id", "ts", "c_ts", "c_id")
        .distinct()
    )
    age_h = (F.unix_timestamp("ts") - F.unix_timestamp("c_ts")) / 3600.0
    weighted = touches.withColumn(
        "w", F.pow(F.lit(0.5), age_h / F.lit(half_life_hours))
    )
    tot = F.sum("w").over(Window.partitionBy("p_id", "user_id"))
    credited = weighted.withColumn("credit", F.col("w") / tot)
    return (
        credited.groupBy("user_id")
        .agg(
            F.countDistinct("p_id").alias("n_purchases_attributed"),
            F.countDistinct("c_id").alias("n_clicks_credited"),
            F.round(F.sum("credit"), 6).alias("credit_mass"),
            F.round(F.sum("w"), 6).alias("decay_weight_mass"),
        )
        .orderBy("user_id")
    )


def hourly_gapfill(events: DataFrame, fill: str = "ffill") -> DataFrame:
    """Regularized per-type hourly series with gap filling — the
    timeseries-database resample: every (type, hour) cell of the full
    grid exists, empty hours carry a zero count, and the average value
    fills per ``fill``:

    * ``"ffill"`` — forward-fill from the last observed hour (NULL
      before the first observation); output column ``avg_value_ff``.
    * ``"interpolate"`` — linear interpolation between the surrounding
      observations (forward-fill after the last one, NULL before the
      first); output column ``avg_value_lerp``.

    Shape: one sparse hourly aggregate; the dense grid comes from a
    1-row min/max aggregate exploded through ``sequence()`` and
    cross-joined (broadcast) with the distinct types — grid size is
    #hours x #types, never proportional to events; the fills are
    ``last``/``first(ignorenulls)`` windows PARTITIONED by type over
    that bounded grid.  No global window, no driver loop."""
    h = F.date_trunc("hour", F.col("ts"))
    sparse = events.groupBy(F.col("event_type"), h.alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    # bounds and types derive from the TINY sparse frame, not from a
    # re-scan of events — and sparse is checkpointed ONCE because its
    # three consumers prune different columns, so declarative reuse does
    # not survive (no ReusedExchange; same lesson as boilerplate_profile).
    # One events scan total, materializing only #hours x #types rows.
    sparse = sparse.localCheckpoint(eager=True)
    bounds = sparse.agg(F.min("h").alias("h_min"), F.max("h").alias("h_max"))
    hours = bounds.select(
        F.explode(
            F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("h")
    )
    types = sparse.select("event_type").distinct()
    grid = F.broadcast(hours).crossJoin(F.broadcast(types))
    joined = grid.join(sparse, ["event_type", "h"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    if fill == "ffill":
        return joined.select(
            "event_type",
            "h",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("avg_value", ignorenulls=True).over(w_back).alias(
                "avg_value_ff"
            ),
        ).orderBy("event_type", "h")
    if fill != "interpolate":
        raise ValueError(f"unknown fill: {fill!r}")
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("avg_value").isNotNull(), F.col("h"))
    prev_v = F.last("avg_value", ignorenulls=True).over(w_back)
    prev_h = F.last(obs_h, ignorenulls=True).over(w_back)
    next_v = F.first("avg_value", ignorenulls=True).over(w_fwd)
    next_h = F.first(obs_h, ignorenulls=True).over(w_fwd)
    # exact-integer lerp: the endpoints are 6-dp values, so scale them to
    # integers and weight by integer hour offsets — the only float op left
    # is ONE exactly-rounded IEEE division, identical in any engine
    # (a naive prev + (next-prev)*frac differs in the last ulp between
    # engines and flips round-half boundaries)
    prev_i = F.round(prev_v * 1e6).cast("long")
    next_i = F.round(next_v * 1e6).cast("long")
    dh = ((F.col("h").cast("long") - prev_h.cast("long")) / 3600).cast("long")
    span = ((next_h.cast("long") - prev_h.cast("long")) / 3600).cast("long")
    lerp = F.when(F.col("avg_value").isNotNull(), F.col("avg_value")).otherwise(
        F.when(next_v.isNull(), prev_v).otherwise(
            F.when(prev_v.isNull(), F.lit(None)).otherwise(
                (prev_i * (span - dh) + next_i * dh) / (span * F.lit(1e6))
            )
        )
    )
    return joined.select(
        "event_type",
        "h",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.round(lerp, 6).alias("avg_value_lerp"),
    ).orderBy("event_type", "h")


def stickiness(events: DataFrame, window_days: int = 28) -> DataFrame:
    """DAU/MAU stickiness: per active day, the distinct users that day
    (DAU), the distinct users over the trailing ``window_days`` (MAU),
    and their ratio — the engagement-health metric every activity
    dashboard leads with.

    EXACT formulation via contribution explode: each distinct (day, user)
    pair is exploded to the ``window_days`` trailing windows it counts
    toward, then one distinct-count per target day — every join is
    equality, fan-out is a fixed window_days x |day-user pairs| (NOT a
    range self-join), and the output is only the days actually present.
    SCALE: the x28 fan-out is the price of exactness; the bounded-memory
    path at 100 TB is the mergeable-HLL rollup (see
    ``events_hll_weekly_users``) where per-day sketches union across the
    trailing window instead of re-counting users."""
    pairs = (
        events.select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        ).distinct()
    )
    contrib = pairs.select(
        "day",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("off"),
    ).select(
        F.to_timestamp(F.date_add(F.col("day").cast("date"), F.col("off"))).alias(
            "day"
        ),
        "user_id",
    )
    mau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("mau"))
    dau = pairs.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    return (
        dau.join(mau, "day")  # inner join keeps only days with activity
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


def inter_event_gaps(events: DataFrame) -> DataFrame:
    """Inter-arrival time distribution per event type: for each event, the
    gap to the SAME USER's previous event (any type), summarized per type
    of the later event — the burstiness/cadence profile behind rate
    limits, session-timeout tuning, and bot screening.

    One lag window under a single user-keyed shuffle, then a per-type
    aggregate with exact interpolated percentiles (the GK-sketch
    ``approx_percentile`` swap documented in ``price_quantiles_sketch``
    applies verbatim at 100 TB).  Gaps are whole-microsecond differences
    scaled to seconds, so values are engine-exact."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    ) / 1_000_000.0
    gaps = events.select("event_type", gap.alias("gap_s")).where(
        F.col("gap_s").isNotNull()
    )
    pct = lambda q: F.round(  # noqa: E731
        F.percentile(F.col("gap_s"), F.lit(q)), 4
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_s"), 4).alias("avg_gap_s"),
            pct(0.5).alias("p50_gap_s"),
            pct(0.9).alias("p90_gap_s"),
            F.round(F.max("gap_s"), 4).alias("max_gap_s"),
        )
        .orderBy("event_type")
    )


def hour_uniformity(events: DataFrame) -> DataFrame:
    """Diurnality test per event type: chi-square statistic of the
    hour-of-day histogram against the uniform distribution, plus the peak
    hour — "is this event type time-of-day dependent", the screening
    counterpart of the variance decomposition for categorical buckets.

    Missing hours contribute (0 - exp)^2/exp = exp each, so the empty
    24-bucket cells fold into the closed form ``(24 - k) * exp`` and no
    dense grid join is needed; everything is one hourly aggregate
    (<= types x 24 rows) plus a window total under the same type key."""
    hourly = events.groupBy(
        "event_type", F.hour(F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy("event_type"))
    exp = total / 24.0
    with_exp = hourly.select(
        "event_type", "h", "n", total.alias("total"), exp.alias("exp")
    )
    chi_obs = F.sum(
        (F.col("n") - F.col("exp")) * (F.col("n") - F.col("exp")) / F.col("exp")
    )
    return (
        with_exp.groupBy("event_type")
        .agg(
            F.max("total").alias("n_events"),
            F.count(F.lit(1)).alias("hours_active"),
            F.round(
                chi_obs + (24 - F.count(F.lit(1))) * F.max("exp"), 4
            ).alias("chi_square"),
            F.min_by(
                "h", F.struct((-F.col("n")).alias("a"), F.col("h").alias("b"))
            ).alias("peak_hour"),
        )
        .orderBy("event_type")
    )


def audience_overlap(events: DataFrame) -> DataFrame:
    """Audience overlap between every pair of event types: distinct-user
    counts per type, the pairwise intersection, and its Jaccard — the
    cross-feature reach matrix a growth dashboard renders as a heatmap.

    SCALE: one distinct projection to (event_type, user_id), one per-type
    count, then a user-keyed self-join — co-partitioned on user_id, so
    each user's type set meets itself locally; pair rows are bounded by
    sum over users of C(types_of_user, 2) ≤ |users| x C(|types|, 2), and
    the final aggregate has C(|types|, 2) output rows.  No collect, no
    cross join; |types| is small by construction (it is an enum)."""
    du = events.select("event_type", "user_id").distinct()
    per_type = du.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    ca = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("users_a")
    )
    cb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("users_b")
    )
    return (
        inter.join(ca, "type_a")
        .join(cb, "type_b")
        .select(
            "type_a",
            "type_b",
            "users_a",
            "users_b",
            "overlap",
            F.round(
                F.col("overlap")
                / (F.col("users_a") + F.col("users_b") - F.col("overlap")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def key_skew_profile(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Shuffle-key skew diagnosis per event type: the distribution of
    per-key row counts — hottest-key share, exact p50/p99 of the count
    distribution, and normalized Shannon evenness — the profile you run
    BEFORE deciding whether a groupBy/join key needs salting
    (``functions/skew.py``) or AQE skew-join handling.  Evenness near 1.0
    means hash partitioning balances; a top1_share near 1.0 means one key
    owns the partition and two-phase salting is mandatory.

    Scale shape: one map-side-combined count per (type, key), then one
    reduction per type.  Entropy uses the closed form
    ``log2(T) - sum(c*log2 c)/T`` so no per-row probability (and hence no
    window over all keys of a type, which would single-partition the
    hottest dimension) is ever materialized — both levels are plain
    partial-aggregated exchanges, O(|keys|) shuffle bytes total."""
    counts = events.where(F.col(key).isNotNull()).groupBy(
        "event_type", key
    ).agg(F.count(F.lit(1)).cast("double").alias("c"))
    t = F.sum("c")
    s = F.sum(F.col("c") * F.log2("c"))
    n_keys = F.count(F.lit(1))
    entropy = F.log2(t) - s / t
    return (
        counts.groupBy("event_type")
        .agg(
            n_keys.alias("n_keys"),
            t.cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("max_count"),
            F.round(F.max("c") / t, 4).alias("top1_share"),
            F.round(F.percentile(F.col("c"), F.lit(0.5)), 4).alias("p50_count"),
            F.round(F.percentile(F.col("c"), F.lit(0.99)), 4).alias("p99_count"),
            F.round(
                F.when(n_keys == 1, F.lit(0.0)).otherwise(
                    entropy / F.log2(n_keys)
                ),
                4,
            ).alias("evenness"),
        )
        .orderBy("event_type")
    )
