"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship hourly windowed aggregation at sf0.001.
``queries()``   — one entry per implemented operator (SURVEY.md §2 + [EXT]).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query.  Omitted only
for genuinely estimator-specific ops (sign-LSH / IVF / PQ top-k, HLL and
GK sketches, LSH survivor election) and the documented fake-decode
multimodal stubs — those get rows-only checks plus pytest error/recall
gates.  Deterministic hash-kernel ops are oracle-backed either portably
(simhash via md5) or via pinned constant tables (generator profile,
synth-media parsers — pure functions of ids, SF-independent).

Column-name and type parity notes:
* every computed column is aliased identically in Spark and SQL;
* double aggregates are rounded at the final projection in BOTH engines
  (2 dp money, 4 dp averages, 6 dp ratios/similarities) — both engines
  round doubles via shortest-decimal semantics, verified identical;
* integer SUMs are CAST to BIGINT in DuckDB (its SUM(BIGINT) widens to
  HUGEINT, Spark stays long).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import (
    api,
    asof,
    corpus,
    dedup,
    etl,
    events_ext,
    hourly,
    multimodal,
    relational,
    similarity,
    text,
)

# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------

_SIM_QUERY_IDS = list(range(10))

#: Per-language keep fractions for the stratified-sample query (chosen so
#: every stratum yields rows at sf0.001: en 193 docs, others 71-82).
_STRAT_FRACS = {"en": 0.1, "de": 0.5, "es": 0.25, "fr": 0.25, "zh": 0.5}

#: Same hex thresholds the Spark operator derives — embedded verbatim in
#: the DuckDB oracle so both engines compare against identical constants.
_strat_thr = corpus.frac_threshold


def _hourly_project(agg: DataFrame, with_value_count: bool = False) -> DataFrame:
    """Oracle-stable rounding projection of an aggregate_events frame."""
    return agg.select(
        "window_start",
        "window_end",
        "event_type",
        "event_count",
        "unique_user_count",
        F.round("total_value", 3).alias("total_value"),
        F.round(F.round("total_value", 3) / F.col("value_count"), 4).alias("avg_value"),
        *(["value_count"] if with_value_count else []),
    )


def _hourly(spark: SparkSession, sf_dir: str, with_value_count: bool = False) -> DataFrame:
    """Rounded hourly aggregate of the events table (reference A1-A6)."""
    agg = hourly.aggregate_events(load_table(spark, sf_dir, "events"))
    return _hourly_project(agg, with_value_count)


_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       count(*) AS event_count,
       count(DISTINCT user_id) AS unique_user_count,
       round(sum(value), 3) AS total_value,
       round(round(sum(value), 3) / count(value), 4) AS avg_value
FROM events
GROUP BY 1, 2, 3
"""

_HOURLY_SQL_VC = _HOURLY_SQL.replace(
    "AS avg_value\n",
    "AS avg_value,\n       count(value) AS value_count\n",
)
assert "value_count" in _HOURLY_SQL_VC


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core streaming aggregation, batch form,
    on /root/testdata/sf0.001 (driver checks rows > 0)."""
    return _hourly(spark, "/root/testdata/sf0.001", with_value_count=True)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- reference parity: streaming aggregation, batch form (A1-A6, A10) ---
    q["hourly_agg"] = lambda s, d: _hourly(s, d, with_value_count=True)

    # --- reference parity: API query surface (Q1-Q9) ---
    q["agg_filtered_page"] = lambda s, d: api.get_aggregations(
        _hourly(s, d),
        event_type="click",
        from_time="2024-01-05 00:00:00",
        to_time="2024-01-25 00:00:00",
        limit=50,
        offset=10,
    )
    q["agg_latest"] = lambda s, d: api.get_latest_aggregations(_hourly(s, d), limit=20)
    q["agg_stats"] = lambda s, d: api.get_stats(_hourly(s, d))
    q["agg_event_types"] = lambda s, d: api.get_event_types(_hourly(s, d))
    q["agg_rollup_by_type"] = lambda s, d: api.rollup_by_type(_hourly(s, d))

    # --- [EXT] batch ETL over the TPC-H-style schema ---
    q["tpch_q1_pricing_summary"] = lambda s, d: etl.pricing_summary(
        load_table(s, d, "lineitem")
    )
    q["tpch_q3_shipping_priority"] = lambda s, d: etl.shipping_priority(
        load_table(s, d, "customer"),
        load_table(s, d, "orders"),
        load_table(s, d, "lineitem"),
    )
    q["tpch_q5_local_supplier"] = lambda s, d: etl.local_supplier_volume(
        load_table(s, d, "region"),
        load_table(s, d, "nation"),
        load_table(s, d, "customer"),
        load_table(s, d, "supplier"),
        load_table(s, d, "orders"),
        load_table(s, d, "lineitem"),
    )
    q["tpch_q6_revenue_forecast"] = lambda s, d: etl.revenue_forecast(
        load_table(s, d, "lineitem")
    )
    q["top_orders_per_customer"] = lambda s, d: etl.top_orders_per_customer(
        load_table(s, d, "orders")
    )
    q["customer_order_stats"] = lambda s, d: etl.customer_order_stats(
        load_table(s, d, "customer"),
        load_table(s, d, "orders"),
        load_table(s, d, "nation"),
    )
    q["nations_without_suppliers"] = lambda s, d: etl.nations_customers_without_suppliers(
        load_table(s, d, "customer"), load_table(s, d, "supplier")
    )
    q["nations_with_both"] = lambda s, d: etl.nations_with_both(
        load_table(s, d, "customer"), load_table(s, d, "supplier")
    )
    q["order_priority_rollup"] = lambda s, d: etl.order_priority_rollup(
        load_table(s, d, "orders")
    )
    q["part_type_stats"] = lambda s, d: etl.part_type_stats(load_table(s, d, "part"))
    q["order_lineitem_detail"] = lambda s, d: etl.order_lineitem_detail(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )

    # --- [EXT] advanced relational: remaining TPC-H shapes + pivot + as-of ---
    q["tpch_q7_volume_shipping"] = lambda s, d: relational.volume_shipping(
        load_table(s, d, "supplier"),
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "customer"),
        load_table(s, d, "nation"),
    )
    q["tpch_q8_market_share"] = lambda s, d: relational.market_share(
        load_table(s, d, "part"),
        load_table(s, d, "supplier"),
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "customer"),
        load_table(s, d, "nation"),
        load_table(s, d, "region"),
    )
    q["tpch_q9_product_revenue"] = lambda s, d: relational.product_type_revenue(
        load_table(s, d, "part"),
        load_table(s, d, "supplier"),
        load_table(s, d, "lineitem"),
        load_table(s, d, "orders"),
        load_table(s, d, "nation"),
    )
    q["tpch_q13_order_distribution"] = (
        lambda s, d: relational.customer_order_distribution(
            load_table(s, d, "customer"), load_table(s, d, "orders")
        )
    )
    q["tpch_q15_top_suppliers"] = lambda s, d: relational.top_suppliers_by_revenue(
        load_table(s, d, "supplier"), load_table(s, d, "lineitem")
    )
    q["tpch_q16_part_variety"] = lambda s, d: relational.supplier_part_variety(
        load_table(s, d, "part"),
        load_table(s, d, "supplier"),
        load_table(s, d, "lineitem"),
    )
    q["tpch_q17_small_quantity"] = lambda s, d: relational.small_quantity_revenue(
        load_table(s, d, "part"), load_table(s, d, "lineitem")
    )
    q["tpch_q19_bracket_revenue"] = (
        lambda s, d: relational.disjunctive_bracket_revenue(
            load_table(s, d, "part"), load_table(s, d, "lineitem")
        )
    )
    q["tpch_q22_idle_customers"] = lambda s, d: relational.idle_rich_customers(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    )
    q["tpch_q2_min_cost_supplier"] = lambda s, d: relational.min_cost_supplier(
        load_table(s, d, "part"),
        load_table(s, d, "supplier"),
        load_table(s, d, "lineitem"),
        load_table(s, d, "nation"),
        load_table(s, d, "region"),
    )
    q["tpch_q11_important_parts"] = lambda s, d: relational.important_part_values(
        load_table(s, d, "lineitem"),
        load_table(s, d, "supplier"),
        load_table(s, d, "nation"),
    )
    q["tpch_q12_late_priority"] = lambda s, d: relational.late_shipment_priority(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )
    q["tpch_q20_promotion_suppliers"] = (
        lambda s, d: relational.promotion_part_suppliers(
            load_table(s, d, "part"),
            load_table(s, d, "supplier"),
            load_table(s, d, "lineitem"),
            load_table(s, d, "nation"),
        )
    )
    q["tpch_q21_waiting_orders"] = (
        lambda s, d: relational.waiting_orders_by_supplier(
            load_table(s, d, "supplier"),
            load_table(s, d, "lineitem"),
            load_table(s, d, "orders"),
            load_table(s, d, "nation"),
        )
    )
    q["tpch_q4_priority_check"] = lambda s, d: relational.late_order_priority_check(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )
    q["tpch_q10_returned_items"] = lambda s, d: relational.returned_item_revenue(
        load_table(s, d, "customer"),
        load_table(s, d, "orders"),
        load_table(s, d, "lineitem"),
        load_table(s, d, "nation"),
    )
    q["tpch_q18_large_volume"] = lambda s, d: relational.large_volume_customers(
        load_table(s, d, "customer"),
        load_table(s, d, "orders"),
        load_table(s, d, "lineitem"),
    )
    q["events_type_hour_pivot"] = lambda s, d: relational.type_hour_pivot(
        load_table(s, d, "events")
    )
    q["asof_events_last_order"] = lambda s, d: asof.events_last_order(
        load_table(s, d, "events"), load_table(s, d, "orders")
    )
    q["order_gaps"] = lambda s, d: relational.order_gaps(
        load_table(s, d, "orders")
    )

    # batch twin of the custom stateful streaming funnel operator
    from data_pipeline_zeal_spark.streaming.funnel import funnel_conversions_batch

    q["events_funnel"] = lambda s, d: funnel_conversions_batch(
        load_table(s, d, "events")
    )

    def _funnel_rates(s: SparkSession, d: str) -> DataFrame:
        from data_pipeline_zeal_spark.streaming.funnel import funnel_step_rates

        return funnel_step_rates(load_table(s, d, "events"))

    q["events_funnel_rates"] = _funnel_rates
    q["orders_pareto_share"] = lambda s, d: etl.top_customer_revenue_share(
        load_table(s, d, "orders"), ks=(10, 100)
    )
    q["range_error_context"] = lambda s, d: relational.error_event_context(
        load_table(s, d, "events")
    )
    # GK-sketch percentiles: estimator-specific → rows-only (pytest bounds
    # the error vs the exact price_quantiles)
    q["price_quantiles_sketch"] = lambda s, d: etl.price_quantiles_sketch(
        load_table(s, d, "lineitem")
    )
    # array<int> q serialized to CSV: the driver's canonicalizer sorts a
    # pandas frame over all columns and list cells are unhashable (the one
    # red row in CORRECTNESS_r02) — ints stringify identically in both
    # engines so the hash check stays exact.
    q["sim_quantized_embeddings"] = lambda s, d: similarity.quantize_embeddings(
        load_table(s, d, "embeddings")
    ).select(
        "vec_id",
        "scale",
        F.concat_ws(",", F.col("q").cast("array<string>")).alias("q_csv"),
    )

    q["sim_centroid_drift"] = lambda s, d: similarity.centroid_drift(
        load_table(s, d, "embeddings")
    )
    # rows-only: the PCA basis comes from a driver-side SVD (not SQL);
    # orthonormality/variance/determinism are pytest-gated
    q["sim_pca_project"] = lambda s, d: similarity.pca_project(
        load_table(s, d, "embeddings"), k=16
    ).select(
        "vec_id",
        F.concat_ws(",", F.col("proj").cast("array<string>")).alias("proj_csv"),
    )

    # --- [EXT] text analysis over documents ---
    q["text_stats"] = lambda s, d: text.text_stats(load_table(s, d, "documents"))
    q["text_readability"] = lambda s, d: text.readability(
        load_table(s, d, "documents")
    )
    q["text_quality_score"] = lambda s, d: text.quality_score(
        load_table(s, d, "documents")
    )
    q["text_language_id"] = lambda s, d: text.language_id(
        load_table(s, d, "documents")
    )
    q["text_lang_profile"] = lambda s, d: text.lang_profile(
        load_table(s, d, "documents")
    )
    q["text_fingerprint"] = lambda s, d: text.fingerprint(
        load_table(s, d, "documents")
    ).select("doc_id", "md5_fingerprint")
    q["text_source_token_totals"] = lambda s, d: text.source_token_totals(
        load_table(s, d, "documents")
    )
    q["text_token_frequencies"] = lambda s, d: text.token_frequencies(
        load_table(s, d, "documents")
    )
    q["text_top_terms_per_source"] = lambda s, d: text.top_terms_per_source(
        load_table(s, d, "documents"), k=5
    )
    q["text_feature_hash"] = lambda s, d: text.feature_hash(
        load_table(s, d, "documents"), dim=256
    )
    q["text_tfidf_top_terms"] = lambda s, d: text.tfidf_top_terms(
        load_table(s, d, "documents"), k=5
    )
    q["text_chunk_overlap"] = lambda s, d: text.chunk_overlap(
        load_table(s, d, "documents"), window=64, stride=48
    )
    q["text_ngram_novelty"] = lambda s, d: text.ngram_novelty(
        load_table(s, d, "documents"), n=3
    )
    q["text_doc_similarity"] = lambda s, d: text.doc_similarity_topk(
        load_table(s, d, "documents"), k=5
    )
    q["text_zipf_fit"] = lambda s, d: text.zipf_fit(
        load_table(s, d, "documents"), top_n=500
    )
    q["text_normalize"] = lambda s, d: text.normalize_text(
        load_table(s, d, "documents")
    )
    q["text_rare_tokens"] = lambda s, d: text.rare_token_profile(
        load_table(s, d, "documents")
    )
    q["text_scrub_pii"] = lambda s, d: text.scrub_pii(
        load_table(s, d, "documents")
    )

    # --- [EXT] dedup ---
    q["dedup_exact_groups"] = lambda s, d: dedup.exact_duplicates(
        load_table(s, d, "documents")
    )
    q["dedup_rate_by_source"] = lambda s, d: dedup.dup_rate_by_source(
        load_table(s, d, "documents")
    )
    q["dedup_exact_survivors"] = lambda s, d: dedup.exact_dedup(
        load_table(s, d, "documents")
    )
    q["dedup_jaccard_pairs"] = lambda s, d: dedup.jaccard_pairs(
        load_table(s, d, "documents"), threshold=0.2
    )
    q["dedup_minhash_lsh_pairs"] = lambda s, d: dedup.minhash_lsh_pairs(
        load_table(s, d, "documents"), threshold=0.2
    )
    q["dedup_simhash"] = lambda s, d: dedup.simhash(load_table(s, d, "documents"))
    q["dedup_normalized_groups"] = lambda s, d: text.normalized_duplicates(
        load_table(s, d, "documents")
    )
    q["dedup_levenshtein_pairs"] = lambda s, d: dedup.levenshtein_pairs(
        load_table(s, d, "documents"), max_dist=10
    )
    q["dedup_clusters"] = lambda s, d: dedup.duplicate_clusters(
        load_table(s, d, "documents"), threshold=0.2
    )
    # exact pinned: the oracle anchor (auto would flip to LSH at larger SFs
    # and break hash-parity)
    q["dedup_embedding_near"] = lambda s, d: dedup.embedding_near_dup_pairs(
        load_table(s, d, "embeddings"), threshold=0.4, method="exact"
    )
    # The 100 TB path: banded sign-LSH candidates, exact verify, no theta
    # join.  Fixture near-dups sit at cosine ~0.45 (weak contrast), so the
    # band layout is 8 bands x 3 planes (recall ≈ 0.92 there); production
    # thresholds ≥ 0.9 use the leaner 4 x 6 default.  Rows-only (bucket
    # membership isn't SQL-expressible).
    q["dedup_embedding_near_lsh"] = lambda s, d: dedup.embedding_near_dup_pairs(
        load_table(s, d, "embeddings"),
        threshold=0.4,
        method="lsh",
        bands=8,
        planes_per_band=3,
    )

    # --- [EXT] corpus curation (training-data pipeline surface) ---
    q["corpus_hash_split"] = lambda s, d: corpus.hash_split(
        load_table(s, d, "documents"), test_frac=0.1
    )
    q["corpus_split_leakage"] = lambda s, d: corpus.split_leakage(
        load_table(s, d, "documents"), test_frac=0.1
    )
    q["corpus_stratified_sample"] = lambda s, d: corpus.stratified_sample(
        load_table(s, d, "documents"), fractions=_STRAT_FRACS
    )
    q["corpus_source_cap"] = lambda s, d: corpus.source_cap(
        load_table(s, d, "documents"), k=10
    )
    q["corpus_pack_chunks"] = lambda s, d: corpus.pack_chunks(
        load_table(s, d, "documents"), target_tokens=256
    )
    q["corpus_quality_filter"] = lambda s, d: corpus.quality_filter_chain(
        load_table(s, d, "documents")
    )
    q["corpus_mixture_weights"] = lambda s, d: corpus.mixture_weights(
        load_table(s, d, "documents"), by="lang"
    )
    q["corpus_contamination"] = lambda s, d: corpus.ngram_contamination(
        load_table(s, d, "documents"), n=8, benchmark_mod=7
    )
    # method="auto": exact at the driver's oracle scale (sf0.01 = 200 vecs,
    # under the 1k flip) — so hash-parity holds — and banded sign-LSH pair
    # generation beyond it (the 100 TB path; was pinned "exact" through r4,
    # which made the sf0.1 bench run the O(n^2) theta join: 20.8 s -> LSH)
    q["semdedup_survivors"] = lambda s, d: corpus.semantic_dedup(
        load_table(s, d, "embeddings"), threshold=0.4, method="auto"
    )
    q["corpus_length_histogram"] = lambda s, d: corpus.token_length_histogram(
        load_table(s, d, "documents")
    )
    q["corpus_curation_summary"] = lambda s, d: corpus.curation_summary(
        load_table(s, d, "documents"), test_frac=0.1
    )

    # --- [EXT] extended event analytics ---
    q["events_props_profile"] = lambda s, d: events_ext.props_profile(
        load_table(s, d, "events")
    )
    q["events_daily_cube"] = lambda s, d: events_ext.daily_type_cube(
        load_table(s, d, "events")
    )
    q["events_daily_moving_avg"] = lambda s, d: events_ext.daily_moving_average(
        load_table(s, d, "events")
    )
    q["events_sessionize"] = lambda s, d: events_ext.sessionize(
        load_table(s, d, "events")
    )
    q["events_top_paths"] = lambda s, d: events_ext.top_paths(
        load_table(s, d, "events")
    )
    q["events_type_share"] = lambda s, d: events_ext.type_share(
        load_table(s, d, "events")
    )
    q["events_top_users"] = lambda s, d: events_ext.top_users_by_activity(
        load_table(s, d, "events")
    )
    q["events_hour_profile"] = lambda s, d: events_ext.hour_of_day_profile(
        load_table(s, d, "events")
    )
    q["events_cohort_retention"] = lambda s, d: events_ext.weekly_cohort_retention(
        load_table(s, d, "events")
    )
    q["events_approx_distinct"] = lambda s, d: events_ext.approx_distinct_users(
        load_table(s, d, "events")
    )
    q["events_value_histogram"] = lambda s, d: events_ext.value_histogram(
        load_table(s, d, "events"), bin_width=10.0
    )
    # mergeable HLL sketch rollup: estimator-specific -> rows-only (pytest
    # gates the estimate against exact weekly distincts)
    q["events_hll_weekly_users"] = lambda s, d: events_ext.weekly_distinct_rollup(
        load_table(s, d, "events")
    )
    q["events_daily_anomaly"] = lambda s, d: events_ext.daily_anomaly_zscore(
        load_table(s, d, "events")
    )
    q["events_daily_anomaly_mad"] = lambda s, d: events_ext.daily_anomaly_mad(
        load_table(s, d, "events")
    )
    q["events_user_bursts"] = lambda s, d: events_ext.user_burst_profile(
        load_table(s, d, "events")
    )
    q["events_key_skew_profile"] = lambda s, d: events_ext.key_skew_profile(
        load_table(s, d, "events")
    )
    q["orders_rfm"] = lambda s, d: etl.rfm_segments(load_table(s, d, "orders"))

    # the ad-hoc ANSI-SQL entry path (io.sql → temp views → spark.sql),
    # exercised end-to-end with a CTE + window query
    from data_pipeline_zeal_spark import io as engine_io

    q["sql_entry_revenue_rank"] = lambda s, d: engine_io.sql(
        s,
        d,
        """
        WITH nation_rev AS (
          SELECT n.n_name AS nation,
                 round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
          FROM lineitem l
          JOIN supplier sp ON l.l_suppkey = sp.s_suppkey
          JOIN nation n ON sp.s_nationkey = n.n_nationkey
          GROUP BY n.n_name
        )
        SELECT nation, revenue,
               CAST(rank() OVER (ORDER BY revenue DESC, nation) AS INT) AS rnk
        FROM nation_rev
        ORDER BY rnk
        """,
    )

    # skew-safe two-phase aggregation (hot-key mitigation); identical
    # results to a plain GROUP BY, so the plain SQL is the oracle
    from data_pipeline_zeal_spark.functions.skew import salted_aggregate

    q["events_user_counts_salted"] = lambda s, d: salted_aggregate(
        load_table(s, d, "events"),
        keys=["user_id"],
        aggs={"n": "count(*)", "n_valued": "count(value)"},
        salt=8,
    ).orderBy("user_id")

    q["events_session_window"] = lambda s, d: events_ext.session_window_stats(
        load_table(s, d, "events")
    )
    q["events_sliding_window"] = lambda s, d: events_ext.sliding_window_counts(
        load_table(s, d, "events")
    )
    q["inactive_customers"] = lambda s, d: etl.inactive_customers(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    )
    q["part_search"] = lambda s, d: etl.part_search(load_table(s, d, "part"))
    q["priority_with_returns"] = lambda s, d: etl.priority_with_returns(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )
    q["returned_item_revenue"] = lambda s, d: etl.returned_item_revenue(
        load_table(s, d, "customer"),
        load_table(s, d, "orders"),
        load_table(s, d, "lineitem"),
        load_table(s, d, "nation"),
    )
    # ≡ TPC-H Q14 (promo revenue %) — registered under its business name
    # since round 1; with q4/q10/q18 added in round 5 every TPC-H query
    # shape (q1-q22) has a registered, oracle-backed counterpart.
    q["promo_revenue_share"] = lambda s, d: etl.promo_revenue_share(
        load_table(s, d, "lineitem"), load_table(s, d, "part")
    )
    q["large_volume_customers"] = lambda s, d: etl.large_volume_customers(
        load_table(s, d, "customer"),
        load_table(s, d, "orders"),
        load_table(s, d, "lineitem"),
    )
    q["price_quantiles"] = lambda s, d: etl.price_quantiles(
        load_table(s, d, "lineitem")
    )

    # --- [EXT] multimodal plumbing (stubbed decode kernel; rows-only) ---
    q["multimodal_decode"] = lambda s, d: multimodal.decode_image(
        multimodal.synth_media(s, 256)
    )
    q["multimodal_resize"] = lambda s, d: multimodal.resize_images(
        multimodal.synth_media(s, 256)
    ).select("media_id", "width", "height", F.length("payload").alias("n_bytes"))
    q["multimodal_scene_detect"] = lambda s, d: multimodal.detect_scenes(
        multimodal.synth_video(s, 64)
    )

    # --- [EXT] synthetic generator (hash-kernel; rows-only) ---
    from data_pipeline_zeal_spark.sources.generator import generate_events

    q["generator_profile"] = lambda s, d: (
        generate_events(s, 10_000, num_users=100)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
            F.countDistinct("session_id").alias("sessions"),
        )
        .orderBy("event_type")
    )

    # --- [EXT] similarity search ---
    q["sim_cosine_topk"] = lambda s, d: similarity.cosine_topk(
        load_table(s, d, "embeddings"), _SIM_QUERY_IDS, k=10
    )
    q["sim_lsh_topk"] = lambda s, d: similarity.lsh_topk(
        load_table(s, d, "embeddings"), _SIM_QUERY_IDS, k=10
    )
    # two-stage (coarse-prefix → exact rerank) retrieval: approximate yet
    # fully deterministic, so oracle-backed end-to-end — unlike IVF/LSH
    q["sim_matryoshka_topk"] = lambda s, d: similarity.matryoshka_topk(
        load_table(s, d, "embeddings"), _SIM_QUERY_IDS, k=10
    )
    # exploded to (label, pos, m) scalar rows: the centroid array column
    # would hit the same driver-canonicalizer list crash as q above
    q["sim_label_centroids"] = lambda s, d: similarity.label_centroids(
        load_table(s, d, "embeddings")
    ).select(
        "label", F.posexplode("centroid").alias("pos", "m")
    ).orderBy("label", "pos")
    q["sim_embedding_norms"] = lambda s, d: similarity.embedding_norms(
        load_table(s, d, "embeddings")
    )
    q["sim_ivf_topk"] = lambda s, d: similarity.ivf_topk(
        load_table(s, d, "embeddings"), _SIM_QUERY_IDS, k=10
    )
    q["sim_filtered_topk"] = lambda s, d: similarity.filtered_topk(
        load_table(s, d, "embeddings"), _SIM_QUERY_IDS, labels=[0, 1, 2], k=10
    )
    q["sim_centroid_pairs"] = lambda s, d: similarity.centroid_pairs(
        load_table(s, d, "embeddings")
    )
    q["sim_knn_label"] = lambda s, d: similarity.knn_label(
        load_table(s, d, "embeddings"), _SIM_QUERY_IDS, k=10
    )
    # rows-only like sim_ivf_topk: PQ is approximate by construction and
    # has no SQL expression; recall is pytest-gated vs the exact kernel.
    q["sim_pq_topk"] = lambda s, d: similarity.pq_topk(
        load_table(s, d, "embeddings"), _SIM_QUERY_IDS, k=10
    )

    # --- [EXT] round-3 additions: journeys, baskets, LM scoring, sets ---
    q["events_type_transitions"] = lambda s, d: events_ext.type_transitions(
        load_table(s, d, "events")
    )
    q["basket_part_pairs"] = lambda s, d: etl.part_basket_pairs(
        load_table(s, d, "lineitem"), min_support=2
    )
    q["basket_rules"] = lambda s, d: etl.basket_association_rules(
        load_table(s, d, "lineitem"), min_support=2
    )
    q["orders_cohort_ltv"] = lambda s, d: etl.cohort_ltv(
        load_table(s, d, "orders")
    )
    q["orders_seasonality"] = lambda s, d: etl.revenue_seasonality(
        load_table(s, d, "orders")
    )
    q["text_repetition_profile"] = lambda s, d: text.repetition_profile(
        load_table(s, d, "documents")
    )
    q["text_unigram_logprob"] = lambda s, d: text.unigram_logprob(
        load_table(s, d, "documents")
    )
    q["text_source_fair_quality"] = lambda s, d: text.source_fair_quality(
        load_table(s, d, "documents")
    )
    # zlib kernel: deterministic but not SQL-expressible -> rows-only;
    # closed-form pins in tests/test_corpus.py (repetition compresses,
    # noise doesn't)
    q["text_compression_ratio"] = lambda s, d: text.compression_ratio(
        load_table(s, d, "documents")
    )
    q["orders_grouping_sets"] = lambda s, d: relational.priority_year_grouping_sets(
        load_table(s, d, "orders")
    )
    q["orders_priority_anova"] = lambda s, d: relational.variance_decomposition(
        load_table(s, d, "orders"), "o_orderpriority", "o_totalprice"
    )
    q["part_supplier_hhi"] = lambda s, d: etl.supplier_concentration(
        load_table(s, d, "lineitem")
    )
    q["events_stickiness_28d"] = lambda s, d: events_ext.stickiness(
        load_table(s, d, "events"), window_days=28
    )
    q["events_gap_distribution"] = lambda s, d: events_ext.inter_event_gaps(
        load_table(s, d, "events")
    )

    def _markov_steady(s: SparkSession, d: str) -> DataFrame:
        """Stationary event-type mix: power iteration over the per-user
        type-transition matrix — the PageRank kernel at damping=1.0 (zero
        teleport) IS the Markov steady-state iteration, so the graph
        operator composes directly with the journey bigrams."""
        from data_pipeline_zeal_spark.operators import graph

        from pyspark.sql import Window

        t = events_ext.type_transitions(load_table(s, d, "events"))
        ranks = graph.pagerank(
            t, iterations=6, damping=1.0,
            src="from_type", dst="to_type", weight="n",
        )
        # renormalize: with a dangling type (appears only as a stream's
        # last event) damping=1.0 leaks mass each step; dividing by the
        # total reports the quasi-stationary distribution (a no-op on a
        # closed chain like this fixture's)
        total = F.sum("rank").over(Window.partitionBy())
        return ranks.select(
            F.col("node").alias("event_type"),
            F.round(F.col("rank") / total, 9).alias("pi"),
        ).orderBy("event_type")

    q["events_markov_steady"] = _markov_steady

    q["events_hour_uniformity"] = lambda s, d: events_ext.hour_uniformity(
        load_table(s, d, "events")
    )
    q["corpus_weighted_sample"] = lambda s, d: corpus.weighted_sample(
        load_table(s, d, "documents"), k=50
    )
    q["customer_spend_deciles"] = lambda s, d: etl.customer_spend_deciles(
        load_table(s, d, "customer"), load_table(s, d, "orders")
    )
    q["events_hour_unpivot"] = lambda s, d: relational.hour_pivot_unpivot(
        load_table(s, d, "events"), hours=8
    )
    # REAL decode kernel (raw PCM needs no codec): frame RMS/peak over
    # synthesized sine payloads; binary inputs -> rows-only check (pytest
    # asserts rms == amplitude/sqrt(2) on known tones)
    q["multimodal_pcm_energy"] = lambda s, d: multimodal.pcm_frame_energy(
        multimodal.synth_pcm_audio(s, 64)
    )
    # perceptual hashes over the deterministic synthetic media table
    # (binary kernel -> rows-only; locality + banded pair recovery are
    # pinned in tests/test_multimodal.py)
    q["multimodal_image_phash"] = lambda s, d: multimodal.image_phash(
        multimodal.synth_media(s, 64)
    ).orderBy("media_id")
    # real RIFF/WAVE container parse over a deterministic mixed fixture
    # (48 valid WAVs + 16 junk payloads -> rows-only; parser correctness
    # is closed-form-pinned in tests/test_multimodal.py)
    q["multimodal_wav_headers"] = lambda s, d: multimodal.wav_header_stats(
        multimodal.synth_wav_media(s, 64)
    ).orderBy("media_id")
    # real PNG container parse (signature + CRC-checked chunk walk) over a
    # deterministic mixed fixture (48 valid PNGs + 16 corrupt in rotating
    # ways -> rows-only; parser correctness closed-form-pinned in tests)
    q["multimodal_png_headers"] = lambda s, d: multimodal.png_header_stats(
        multimodal.synth_png_media(s, 64)
    ).orderBy("media_id")
    q["multimodal_jpeg_headers"] = lambda s, d: multimodal.jpeg_header_stats(
        multimodal.synth_jpeg_media(s, 64)
    ).orderBy("media_id")

    # --- [EXT] CDC merge, graph rank, cross-doc boilerplate ---
    from data_pipeline_zeal_spark.operators import cdc, graph

    def _cdc_merge(s: SparkSession, d: str) -> DataFrame:
        ev = load_table(s, d, "events")
        cut = F.lit("2024-01-24 00:00:00").cast("timestamp")
        merged = cdc.merge_latest(
            ev.filter(F.col("ts") < cut),
            ev.filter(F.col("ts") >= cut),
            keys=["user_id", "event_type"],
            order_col="ts",
            tiebreak="event_id",
        )
        return merged.select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.round("value", 3).alias("last_value"),
        ).orderBy("user_id", "event_type")

    q["events_cdc_merge"] = _cdc_merge

    def _part_pagerank(s: SparkSession, d: str) -> DataFrame:
        pairs = etl.part_basket_pairs(load_table(s, d, "lineitem"), min_support=2)
        fwd = pairs.select(
            F.col("part_a").alias("src"),
            F.col("part_b").alias("dst"),
            F.col("n_orders").cast("double").alias("weight"),
        )
        rev = pairs.select(
            F.col("part_b").alias("src"),
            F.col("part_a").alias("dst"),
            F.col("n_orders").cast("double").alias("weight"),
        )
        return (
            graph.pagerank(fwd.unionByName(rev), iterations=3, damping=0.85)
            .select(F.col("node").alias("part"), F.round("rank", 9).alias("rank"))
            .orderBy("part")
        )

    q["part_pagerank"] = _part_pagerank

    q["corpus_boilerplate_profile"] = lambda s, d: corpus.boilerplate_profile(
        load_table(s, d, "documents"), n=3, min_docs=3
    )
    q["corpus_source_divergence"] = lambda s, d: corpus.source_divergence(
        load_table(s, d, "documents")
    )
    q["events_value_percentiles"] = lambda s, d: events_ext.value_percentiles(
        load_table(s, d, "events")
    )

    def _scd2(s: SparkSession, d: str) -> DataFrame:
        hist = cdc.scd2_intervals(
            load_table(s, d, "events"),
            keys=["user_id", "event_type"],
            order_col="ts",
            tiebreak="event_id",
        )
        return hist.select(
            "user_id",
            "event_type",
            "event_id",
            "valid_from",
            "valid_to",
            "is_current",
            F.round("value", 3).alias("value"),
        ).orderBy("user_id", "event_type", "valid_from", "event_id")

    q["events_scd2_history"] = _scd2

    def _dq_audit(s: SparkSession, d: str) -> DataFrame:
        from data_pipeline_zeal_spark.operators import quality as dq

        ev = load_table(s, d, "events")
        orders = load_table(s, d, "orders")
        return dq.audit(
            [
                dq.unique_key(ev, ["event_id"]),
                dq.not_null(ev, "value"),
                dq.in_range(ev, "value", 0.0, 100.0),
                dq.accepted_values(
                    ev, "event_type",
                    ["click", "error", "purchase", "signup", "view"],
                ),
                dq.foreign_key(
                    orders, "o_custkey", load_table(s, d, "customer"), "c_custkey"
                ),
                dq.foreign_key(
                    load_table(s, d, "lineitem"), "l_orderkey", orders, "o_orderkey"
                ),
            ]
        )

    q["dq_audit"] = _dq_audit

    def _dq_fds(s: SparkSession, d: str) -> DataFrame:
        """Functional-dependency audit: one FD that holds by construction
        (orders: o_orderkey -> o_custkey), one cross-table FD after a join
        (lineitem x orders: l_orderkey -> o_orderdate), and one that real
        corpora violate (documents: source -> lang)."""
        from data_pipeline_zeal_spark.operators import quality as dq

        orders = load_table(s, d, "orders")
        li = load_table(s, d, "lineitem").join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        return dq.audit(
            [
                dq.functional_dependency(orders, ["o_orderkey"], "o_custkey"),
                dq.functional_dependency(li, ["l_orderkey"], "o_orderdate"),
                dq.functional_dependency(
                    load_table(s, d, "documents"), ["source"], "lang"
                ),
            ]
        )

    q["dq_functional_deps"] = _dq_fds

    def _profile_drift(s: SparkSession, d: str) -> DataFrame:
        """Column-profile drift between the first and second half of the
        events table (cutoff 2024-01-16) — the promote-gate DQ report."""
        from data_pipeline_zeal_spark.operators import quality as dq

        ev = load_table(s, d, "events")
        cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
        return dq.profile_drift(
            ev.filter(F.col("ts") < cut),
            ev.filter(F.col("ts") >= cut),
            ["user_id", "event_type", "value"],
        )

    q["events_profile_drift"] = _profile_drift

    def _hourly_incremental(s: SparkSession, d: str) -> DataFrame:
        """Incremental-view-maintenance form of hourly_agg: aggregate rows
        for events before 2024-01-25 are 'existing', later events arrive
        as the new batch, and incremental_update's touched-window
        recompute must reproduce the full recompute bit-for-bit (the
        oracle IS the full hourly_agg SQL)."""
        ev = load_table(s, d, "events")
        cut = F.lit("2024-01-25 00:00:00").cast("timestamp")
        existing = hourly.aggregate_events(ev.filter(F.col("ts") < cut))
        merged = hourly.incremental_update(
            existing, ev, ev.filter(F.col("ts") >= cut)
        )
        return _hourly_project(merged, with_value_count=True)

    q["hourly_agg_incremental"] = _hourly_incremental

    def _asof_tolerance(s: SparkSession, d: str) -> DataFrame:
        ev = load_table(s, d, "events")
        errors = ev.filter(F.col("event_type") == "error").select(
            "event_id", "ts", "user_id"
        )
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .groupBy("user_id", F.col("ts").alias("click_ts"))
            .agg(F.max("event_id").alias("last_click_id"))
        )
        joined = asof.asof_join(
            errors,
            clicks,
            on="user_id",
            left_ts="ts",
            right_ts="click_ts",
            right_values=["last_click_id"],
            tolerance="30 minutes",
        )
        return joined.select("event_id", "user_id", "last_click_id").orderBy(
            "event_id"
        )

    q["asof_error_last_click_30m"] = _asof_tolerance

    def _asof_nearest(s: SparkSession, d: str) -> DataFrame:
        """Nearest-mode as-of: each error matched to the CLOSER of the
        last click before / first click after (ties prefer backward),
        within +-30 minutes."""
        ev = load_table(s, d, "events")
        errors = ev.filter(F.col("event_type") == "error").select(
            "event_id", "ts", "user_id"
        )
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .groupBy("user_id", F.col("ts").alias("click_ts"))
            .agg(F.max("event_id").alias("nearest_click_id"))
        )
        joined = asof.asof_join(
            errors,
            clicks,
            on="user_id",
            left_ts="ts",
            right_ts="click_ts",
            right_values=["nearest_click_id"],
            tolerance="30 minutes",
            direction="nearest",
        )
        return joined.select("event_id", "user_id", "nearest_click_id").orderBy(
            "event_id"
        )

    q["asof_error_nearest_click_30m"] = _asof_nearest

    def _scd2_pit(s: SparkSession, d: str) -> DataFrame:
        """Point-in-time join: each click attaches the purchase-version
        state its user was in AT click time (SCD2 interval consumer)."""
        ev = load_table(s, d, "events")
        hist = cdc.scd2_intervals(
            ev.filter(F.col("event_type") == "purchase"),
            keys=["user_id"],
            order_col="ts",
            tiebreak="event_id",
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "ts"
        )
        out = cdc.scd2_point_in_time_join(
            clicks, hist, keys=["user_id"], fact_ts="ts",
            dim_values=["value", "valid_from"],
        )
        return out.select(
            "event_id",
            "user_id",
            "ts",
            F.round("value", 3).alias("purchase_value"),
            "valid_from",
        ).orderBy("event_id")

    q["events_scd2_pit_join"] = _scd2_pit

    def _snapshot_diff(s: SparkSession, d: str) -> DataFrame:
        """Snapshot diff between two deterministic views of orders:
        keys %5==0 exist only in new (inserts), %7==0 only in old
        (deletes), %3==0 carry a changed status (updates)."""
        orders = load_table(s, d, "orders")
        base = orders.select("o_orderkey", "o_orderstatus")
        old = base.filter(F.col("o_orderkey") % 5 != 0)
        new = base.filter(F.col("o_orderkey") % 7 != 0).select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
        )
        diff = cdc.table_diff(old, new, keys=["o_orderkey"])
        return diff.select(
            "o_orderkey",
            "change",
            F.col("old_values.o_orderstatus").alias("old_status"),
            F.col("new_values.o_orderstatus").alias("new_status"),
        ).orderBy("o_orderkey")

    q["orders_snapshot_diff"] = _snapshot_diff

    def _snapshot_rebuild(s: SparkSession, d: str) -> DataFrame:
        """Change-feed roundtrip: applying table_diff(old, new) onto old
        must rebuild new exactly — oracle is the new view itself."""
        orders = load_table(s, d, "orders")
        base = orders.select("o_orderkey", "o_orderstatus")
        old = base.filter(F.col("o_orderkey") % 5 != 0)
        new = base.filter(F.col("o_orderkey") % 7 != 0).select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
        )
        diff = cdc.table_diff(old, new, keys=["o_orderkey"])
        return cdc.apply_diff(old, diff, keys=["o_orderkey"]).orderBy(
            "o_orderkey"
        )

    q["orders_snapshot_rebuild"] = _snapshot_rebuild

    def _incremental_dedup(s: SparkSession, d: str) -> DataFrame:
        """Cross-batch admission filter: odd doc_ids are the incoming
        batch, even doc_ids the existing corpus; survivors are the novel
        new docs (recall 1.0 at the fixture band layout — same layout the
        minhash_lsh_pairs oracle note pins)."""
        docs = load_table(s, d, "documents")
        out = dedup.incremental_dedup(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
            threshold=0.2,
        )
        return out.select("doc_id", "lang", "source").orderBy("doc_id")

    q["dedup_incremental_survivors"] = _incremental_dedup

    q["events_first_touch"] = lambda s, d: events_ext.first_touch_attribution(
        load_table(s, d, "events"), window_hours=24
    )

    q["events_linear_attribution"] = lambda s, d: events_ext.linear_attribution(
        load_table(s, d, "events"), window_hours=24
    )
    q["events_decay_attribution"] = lambda s, d: events_ext.time_decay_attribution(
        load_table(s, d, "events"), window_hours=24, half_life_hours=6.0
    )

    q["events_hourly_gapfill"] = lambda s, d: events_ext.hourly_gapfill(
        load_table(s, d, "events")
    )

    q["events_hourly_interpolate"] = lambda s, d: events_ext.hourly_gapfill(
        load_table(s, d, "events"), fill="interpolate"
    )

    def _cms_user_counts(s: SparkSession, d: str) -> DataFrame:
        """Count-min estimates for every user — at fixture cardinality the
        65k-bucket sketch is collision-free, so the exact per-user counts
        are a sound oracle (the law est >= exact is pytest-pinned)."""
        from data_pipeline_zeal_spark.operators import sketch

        ev = load_table(s, d, "events")
        cms = sketch.cms_build(ev, "user_id")
        return (
            sketch.cms_estimate(cms, ev, "user_id")
            .select(F.col("item").alias("user_id"), F.col("est").alias("n_events"))
            .orderBy("user_id")
        )

    q["events_user_cms_counts"] = _cms_user_counts

    q["events_daily_trend"] = lambda s, d: events_ext.daily_trend(
        load_table(s, d, "events")
    )

    q["order_ship_latency"] = lambda s, d: etl.order_ship_latency(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )

    q["supplier_scorecard"] = lambda s, d: etl.supplier_fulfillment_scorecard(
        load_table(s, d, "lineitem")
    )

    q["corpus_effective_tokens"] = lambda s, d: corpus.effective_tokens_by_source(
        load_table(s, d, "documents")
    )

    q["corpus_shuffle_shards"] = lambda s, d: corpus.shuffle_shards(
        load_table(s, d, "documents"), n_shards=8
    )

    def _degree_hist(s: SparkSession, d: str) -> DataFrame:
        """Degree distribution of the part co-occurrence graph (same edge
        list the pagerank query ranks)."""
        pairs = etl.part_basket_pairs(load_table(s, d, "lineitem"), min_support=2)
        return graph.degree_histogram(
            pairs.select(F.col("part_a").alias("src"), F.col("part_b").alias("dst"))
        )

    q["part_degree_histogram"] = _degree_hist

    def _triangle_census(s: SparkSession, d: str) -> DataFrame:
        """Triangle census of the part co-occurrence graph (same edge list
        the pagerank query ranks) via degree-oriented wedge joins."""
        pairs = etl.part_basket_pairs(load_table(s, d, "lineitem"), min_support=2)
        return graph.triangle_stats(pairs, src="part_a", dst="part_b")

    q["part_triangle_census"] = _triangle_census

    q["orders_backlog_timeline"] = lambda s, d: etl.order_backlog_timeline(
        load_table(s, d, "orders"), load_table(s, d, "lineitem")
    )

    q["text_duplicated_spans"] = lambda s, d: text.duplicated_spans(
        load_table(s, d, "documents"), n=20
    )
    q["text_gopher_flags"] = lambda s, d: text.gopher_flags(
        load_table(s, d, "documents")
    )
    q["text_bpe_token_estimate"] = lambda s, d: text.bpe_token_estimate(
        load_table(s, d, "documents")
    )
    # exact pair generation pinned (oracle anchor; auto flips to LSH at scale)
    q["dedup_best_quality"] = lambda s, d: dedup.best_quality_survivors(
        load_table(s, d, "documents"), threshold=0.2, method="exact"
    )
    # the 100 TB path (banded LSH candidates), rows-only: benched at sf0.1
    # where the exact kernel is deliberately excluded like dedup_jaccard
    q["dedup_best_quality_lsh"] = lambda s, d: dedup.best_quality_survivors(
        load_table(s, d, "documents"), threshold=0.2, method="lsh"
    )
    q["text_bigram_logprob"] = lambda s, d: text.bigram_logprob(
        load_table(s, d, "documents"), alpha=0.5
    )
    q["corpus_decontaminate"] = lambda s, d: corpus.decontaminate(
        load_table(s, d, "documents"), n=8, benchmark_mod=7
    )
    q["events_audience_overlap"] = lambda s, d: events_ext.audience_overlap(
        load_table(s, d, "events")
    )

    def _heavy_hitters(s: SparkSession, d: str) -> DataFrame:
        from data_pipeline_zeal_spark.streaming.heavy_hitters import (
            heavy_hitters_batch,
        )

        # project away the shard label: xxhash64 is not reproducible in
        # the DuckDB oracle; the top-k contract is on (user, count)
        return heavy_hitters_batch(load_table(s, d, "events"), k=10).select(
            "user_id", "n"
        )

    q["events_heavy_hitters"] = _heavy_hitters
    q["corpus_temperature_mix"] = lambda s, d: corpus.temperature_mixture(
        load_table(s, d, "documents"), by="lang", alpha=0.3
    )
    q["corpus_epoch_plan"] = lambda s, d: corpus.epoch_plan(
        load_table(s, d, "documents"), target_tokens=1_000_000
    )

    # The driver verifies the FIRST 50 entries of this dict in insertion
    # order.  Rounds 1-3 established green evidence for the 50 queries that
    # historically sat at the front, so rotate the never-driver-verified
    # queries (plus the events_* queries whose only driver rows predate the
    # r1 nanos fix) into the first-50 window; the already-green queries move
    # behind position 50.  Names are unchanged — only insertion order.
    missing = set(_DRIVER_FIRST) - set(q)
    assert not missing, f"_DRIVER_FIRST names not in registry: {missing}"
    assert len(_DRIVER_FIRST) == 50, len(_DRIVER_FIRST)
    ordered = {k: q[k] for k in _DRIVER_FIRST}
    ordered.update((k, v) for k, v in q.items() if k not in ordered)
    assert len(ordered) == len(q)
    return ordered


#: queries to pin at the front of the registry (driver checks queries()[:50]).
#: ROUND-5 WINDOW: 50 oracle-backed queries with no (or stale) driver row —
#: the 47 never-sampled oracle-backed r3/r4 additions,
#: dedup_minhash_lsh_pairs (its only driver row is a stale r2 no_oracle;
#: it now has an exact-Jaccard pair-count oracle), and 2 round-5 additions
#: (sim_matryoshka_topk: deterministic two-stage retrieval;
#: tpch_q4_priority_check: EXISTS semi-join).  Generated by
#: `python tools/rotate_registry.py` and verified with
#: `python tools/driver_sim.py <names>` before commit.
#:
#: NEXT ROTATION (round 6): rerun `python tools/rotate_registry.py` — it
#: now ranks oracle-UPGRADED queries (stale no_oracle rows whose oracle
#: was added later) right behind never-sampled ones.  Pool after this
#: window: round-5 oracle-backed additions with no driver row
#: (tpch_q10_returned_items, tpch_q18_large_volume, dq_functional_deps,
#: basket_rules, text_readability, events_top_paths, orders_cohort_ltv,
#: corpus_epoch_plan, text_source_fair_quality, orders_seasonality,
#: events_daily_anomaly_mad, events_user_bursts, events_key_skew_profile),
#: the oracle-upgraded set (dedup_simhash, generator_profile,
#: multimodal_{wav,png,jpeg}_headers, multimodal_pcm_energy,
#: multimodal_image_phash), and the genuinely rows-only stragglers
#: (sim_pq_topk, sim_pca_project, dedup_best_quality_lsh,
#: text_compression_ratio, multimodal_resize/decode/scene_detect).
#: All of the above are parity-green via tools/driver_sim.py this round
#: (full sweep: 175/175).
_DRIVER_FIRST = [
    "events_funnel_rates",
    "orders_pareto_share",
    "sim_centroid_drift",
    "text_top_terms_per_source",
    "text_feature_hash",
    "text_chunk_overlap",
    "text_ngram_novelty",
    "text_doc_similarity",
    "text_zipf_fit",
    "dedup_rate_by_source",
    "corpus_split_leakage",
    "orders_priority_anova",
    "part_supplier_hhi",
    "events_stickiness_28d",
    "events_gap_distribution",
    "events_markov_steady",
    "events_hour_uniformity",
    "events_profile_drift",
    "hourly_agg_incremental",
    "asof_error_nearest_click_30m",
    "events_scd2_pit_join",
    "orders_snapshot_diff",
    "orders_snapshot_rebuild",
    "dedup_incremental_survivors",
    "events_first_touch",
    "events_linear_attribution",
    "events_decay_attribution",
    "events_hourly_gapfill",
    "events_hourly_interpolate",
    "events_user_cms_counts",
    "events_daily_trend",
    "order_ship_latency",
    "supplier_scorecard",
    "corpus_effective_tokens",
    "corpus_shuffle_shards",
    "part_degree_histogram",
    "part_triangle_census",
    "orders_backlog_timeline",
    "text_duplicated_spans",
    "text_gopher_flags",
    "text_bpe_token_estimate",
    "dedup_best_quality",
    "text_bigram_logprob",
    "corpus_decontaminate",
    "events_audience_overlap",
    "events_heavy_hitters",
    "corpus_temperature_mix",
    "sim_matryoshka_topk",
    "tpch_q4_priority_check",
    "dedup_minhash_lsh_pairs",
]


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

#: tokenization / shingling shared fragments (must mirror functions/textfn.py)
_TOK = r"CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END"

_SHINGLES = f"""
CASE WHEN len({_TOK}) <= 3 THEN [array_to_string({_TOK}, ' ')]
     ELSE list_transform(range(1, len({_TOK}) - 1),
                         i -> array_to_string(({_TOK})[i:i+2], ' '))
END
"""

#: word-bigram shingles (mirrors textfn.word_shingles(tok, 2))
_BIGRAMS = f"""
CASE WHEN len({_TOK}) <= 2 THEN [array_to_string({_TOK}, ' ')]
     ELSE list_transform(range(1, len({_TOK})),
                         i -> array_to_string(({_TOK})[i:i+1], ' '))
END
"""

_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"],
}


def _marker_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_intersect(list_distinct(toks), [{lst}]))"


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["hourly_agg"] = _HOURLY_SQL_VC
    # IVM correctness claim: the merged incremental result must equal the
    # full recompute, so the oracle is the full-recompute SQL verbatim.
    o["hourly_agg_incremental"] = _HOURLY_SQL_VC
    o["agg_filtered_page"] = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT window_start, window_end, event_type, event_count, unique_user_count,
       total_value, avg_value
FROM hourly
WHERE event_type = 'click'
  AND window_start >= TIMESTAMP '2024-01-05 00:00:00'
  AND window_end <= TIMESTAMP '2024-01-25 00:00:00'
ORDER BY window_start DESC, event_type ASC
LIMIT 50 OFFSET 10
"""
    o["agg_latest"] = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT * FROM hourly ORDER BY window_start DESC, event_type ASC LIMIT 20
"""
    o["agg_stats"] = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT event_type,
       CAST(sum(event_count) AS BIGINT) AS total_events,
       CAST(sum(unique_user_count) AS BIGINT) AS total_unique_users,
       round(avg(event_count), 4) AS avg_events_per_window,
       count(*) AS window_count
FROM hourly GROUP BY event_type
ORDER BY total_events DESC, event_type ASC
"""
    o["agg_event_types"] = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT DISTINCT event_type FROM hourly ORDER BY event_type
"""
    o["agg_rollup_by_type"] = f"""
WITH hourly AS ({_HOURLY_SQL})
SELECT event_type, CAST(sum(event_count) AS BIGINT) AS total_events
FROM hourly GROUP BY event_type ORDER BY event_type
"""

    o["tpch_q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6) AS sum_charge,
       round(round(sum(l_quantity), 2) / count(*), 4) AS avg_qty,
       round(round(sum(l_extendedprice), 2) / count(*), 4) AS avg_price,
       round(round(sum(l_discount), 2) / count(*), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
    o["tpch_q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""
    o["tpch_q5_local_supplier"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""
    o["tpch_q6_revenue_forecast"] = """
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_quantity < 24
"""
    o["top_orders_per_customer"] = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank
  FROM orders
) t WHERE rank <= 3
"""
    o["customer_order_stats"] = """
SELECT n_name,
       count(*) AS order_count,
       count(DISTINCT o_custkey) AS customer_count,
       round(sum(o_totalprice), 2) AS total_revenue,
       round(round(sum(o_totalprice), 2) / count(*), 4) AS avg_order_value
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""
    o["nations_without_suppliers"] = """
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey AS nationkey FROM supplier
) ORDER BY nationkey
"""
    o["nations_with_both"] = """
SELECT nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey AS nationkey FROM supplier
) ORDER BY nationkey
"""
    o["order_priority_rollup"] = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS order_count,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""
    o["part_type_stats"] = """
SELECT p_brand, p_type,
       count(*) AS part_count,
       round(avg(p_size), 4) AS avg_size,
       round(round(sum(p_retailprice), 2) / count(*), 4) AS avg_retail
FROM part GROUP BY p_brand, p_type ORDER BY p_brand, p_type
"""
    o["order_lineitem_detail"] = """
SELECT o_orderkey, l_linenumber, o_orderdate,
       round(l_extendedprice, 2) AS l_extendedprice, l_returnflag
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'F'
ORDER BY o_orderkey, l_linenumber
LIMIT 100
"""
    o["tpch_q7_volume_shipping"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""
    o["tpch_q8_market_share"] = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(CASE WHEN n1.n_name = 'NATION_3'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 4)
         AS target_revenue,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
       round(round(sum(CASE WHEN n1.n_name = 'NATION_3'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 4)
             / round(sum(l_extendedprice * (1 - l_discount)), 4), 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA')
GROUP BY 1
ORDER BY 1
"""
    o["tpch_q9_product_revenue"] = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""
    o["tpch_q13_order_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""
    o["tpch_q15_top_suppliers"] = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""
    o["tpch_q16_part_variety"] = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (1, 4, 7, 15, 19, 23, 36, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""
    o["tpch_q17_small_quantity"] = """
SELECT round(round(sum(l_extendedprice), 2) / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (SELECT l_partkey AS aq_partkey, avg(l_quantity) * 0.5 AS qty_cut
      FROM lineitem GROUP BY l_partkey) ON l_partkey = aq_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_cut
"""
    o["tpch_q19_bracket_revenue"] = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""
    o["tpch_q22_idle_customers"] = """
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE')
  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                   WHERE c_acctbal > 0
                     AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE'))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""
    o["tpch_q2_min_cost_supplier"] = """
WITH costs AS (
  -- fixed-point 1e-4 unit cost: floor of the IEEE quotient is identical
  -- across engines (round() on a .xxxx5 boundary is not)
  SELECT l_partkey, l_suppkey,
         CAST(min(floor(l_extendedprice / l_quantity * 10000))
              AS BIGINT) AS unit_cost_e4
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
qualified AS (
  SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name, unit_cost_e4
  FROM costs
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND p_name LIKE '%widget%' AND r_name = 'EUROPE'
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, nation, p_partkey, p_name,
       unit_cost_e4
FROM qualified q
WHERE unit_cost_e4 = (SELECT min(unit_cost_e4) FROM qualified
                      WHERE p_partkey = q.p_partkey)
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
"""
    o["tpch_q11_important_parts"] = """
WITH vals AS (
  SELECT l_partkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_value
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7')
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM vals
WHERE part_value > (SELECT sum(part_value) * 0.001 FROM vals)
ORDER BY part_value DESC, l_partkey
"""
    o["tpch_q12_late_priority"] = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', o_orderdate, l_shipdate) > 365
GROUP BY l_returnflag
ORDER BY l_returnflag
"""
    o["tpch_q20_promotion_suppliers"] = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE year(l_shipdate) = 1998
      AND l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE '%bolt%')
    GROUP BY l_partkey, l_suppkey
    HAVING sum(l_quantity) > 25.0)
ORDER BY s_name
"""
    o["tpch_q4_priority_check"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= '1995-07-01' AND o_orderdate < '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND date_diff('day', o.o_orderdate, l.l_shipdate) > 1400)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
    o["tpch_q10_returned_items"] = """
WITH per_cust AS (
  SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= '1995-07-01' AND o_orderdate < '1995-10-01'
  GROUP BY o_custkey)
SELECT c_custkey, c_name, revenue, c_acctbal, n_name
FROM per_cust
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey LIMIT 20
"""
    o["tpch_q18_large_volume"] = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300.0)
SELECT c_name, c_custkey, o_orderkey, o_orderdate AS orderdate,
       o_totalprice, total_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""
    o["tpch_q21_waiting_orders"] = """
WITH lo AS (
  SELECT o_orderkey, l_suppkey,
         date_diff('day', o_orderdate, l_shipdate) > 365 AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
),
per_order AS (
  SELECT o_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
  FROM lo GROUP BY o_orderkey
),
sole_late AS (
  SELECT DISTINCT lo.o_orderkey, l_suppkey
  FROM lo JOIN per_order ON lo.o_orderkey = per_order.o_orderkey
  WHERE is_late AND n_supp > 1 AND n_late_supp = 1
)
SELECT s_name, count(*) AS numwait
FROM sole_late
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_5'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""
    hour_cols = ",\n       ".join(
        f"count(*) FILTER (WHERE hour(ts) = {h}) AS h{h}" for h in range(24)
    )
    o["events_type_hour_pivot"] = f"""
SELECT event_type,
       {hour_cols}
FROM events
GROUP BY event_type
ORDER BY event_type
"""
    o["text_tfidf_top_terms"] = f"""
WITH tok AS (
  SELECT doc_id, source, unnest({_TOK}) AS token FROM documents
),
tf AS (SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents)
SELECT source, token, tf, df, tfidf, rnk FROM (
  SELECT source, token, tf, df,
         round(tf * (ln((n_docs + 1) / (df + 1)) + 1), 6) AS tfidf,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY round(tf * (ln((n_docs + 1) / (df + 1)) + 1), 6) DESC,
                    token ASC) AS INTEGER) AS rnk
  FROM tf JOIN df USING (token), n
) WHERE rnk <= 5
ORDER BY source, rnk
"""
    o["order_gaps"] = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice,
       CAST(date_diff('day',
            lag(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey),
            o_orderdate) AS INTEGER) AS days_since_prev,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey ASC)
            AS INTEGER) AS spend_quartile,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW), 2) AS running_spend
FROM orders
ORDER BY o_custkey, o_orderdate, o_orderkey
"""
    o["range_error_context"] = """
SELECT e.event_id, e.user_id, e.ts, count(*) AS nearby_events
FROM events e JOIN events r
  ON e.user_id = r.user_id
 AND r.ts >= e.ts - INTERVAL 30 MINUTES
 AND r.ts <= e.ts + INTERVAL 30 MINUTES
 AND r.event_id <> e.event_id
WHERE e.event_type = 'error'
GROUP BY 1, 2, 3
ORDER BY e.event_id
"""
    o["sim_quantized_embeddings"] = """
SELECT vec_id,
       round(CASE WHEN amax = 0 THEN 0.0 ELSE 127.0 / amax END, 6) AS scale,
       array_to_string(list_transform(embedding,
         x -> CAST(round(x::DOUBLE * (CASE WHEN amax = 0 THEN 0.0
                                           ELSE 127.0 / amax END)) AS INTEGER)), ',')
         AS q_csv
FROM (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS amax
  FROM embeddings
)
"""
    o["sql_entry_revenue_rank"] = """
WITH nation_rev AS (
  SELECT n.n_name AS nation,
         round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
  FROM lineitem l
  JOIN supplier sp ON l.l_suppkey = sp.s_suppkey
  JOIN nation n ON sp.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
SELECT nation, revenue,
       CAST(rank() OVER (ORDER BY revenue DESC, nation) AS INTEGER) AS rnk
FROM nation_rev
ORDER BY rnk
"""
    o["events_user_counts_salted"] = """
SELECT user_id, count(*) AS n, count(value) AS n_valued
FROM events GROUP BY user_id ORDER BY user_id
"""
    o["events_funnel"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, t1, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE event_type = 'click' AND ts >= t1 GROUP BY 1, 2),
s3 AS (
  SELECT e.user_id, t1, t2, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1, 2, 3)
SELECT user_id, t1, t2, t3,
       round(epoch(t3) - epoch(t1), 3) AS duration_s
FROM s3 ORDER BY user_id
"""
    o["asof_events_last_order"] = """
SELECT e.event_id, e.user_id, r.last_orderkey
FROM (SELECT event_id, ts, user_id FROM events) e
ASOF LEFT JOIN (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_orderkey) AS last_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
) r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
ORDER BY e.event_id
"""

    # --- text ---
    o["text_readability"] = f"""
WITH c AS (
  SELECT doc_id,
         greatest(len({_TOK}), 1) AS n_words,
         greatest(len(regexp_split_to_array(text, '[.!?]+')) - 1, 1)
           AS n_sentences,
         greatest(len(regexp_split_to_array(lower(text), '[aeiouy]+')) - 1, 1)
           AS n_syllables
  FROM documents)
SELECT doc_id,
       CAST(n_words AS INTEGER) AS n_words,
       CAST(n_sentences AS INTEGER) AS n_sentences,
       CAST(n_syllables AS INTEGER) AS n_syllables,
       round(206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                     - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 4)
         AS flesch_ease,
       round(0.39 * (n_words / CAST(n_sentences AS DOUBLE))
             + 11.8 * (n_syllables / CAST(n_words AS DOUBLE)) - 15.59, 4)
         AS fk_grade
FROM c ORDER BY doc_id
"""
    o["text_stats"] = f"""
SELECT doc_id, lang,
       length(text) AS char_count,
       len({_TOK}) AS n_tokens,
       round(CASE WHEN len({_TOK}) = 0 THEN 0.0
                  ELSE list_sum(list_transform({_TOK}, t -> length(t)::DOUBLE))
                       / len({_TOK}) END, 4) AS avg_token_len,
       round((length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))::DOUBLE
             / greatest(length(text), 1), 6) AS punct_ratio
FROM documents
"""
    stop_hits = " + ".join(_marker_sql(lg) for lg in _MARKERS)
    o["text_quality_score"] = f"""
WITH t AS (SELECT doc_id, text, {_TOK} AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(toks) AS n_tokens,
         CASE WHEN len(toks) >= 16 THEN 1 ELSE 0 END
         + CASE WHEN (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))::DOUBLE
                      / greatest(length(text), 1) < 0.2 THEN 1 ELSE 0 END
         + CASE WHEN ({stop_hits}) > 0 THEN 1 ELSE 0 END AS pts
  FROM t
)
SELECT doc_id, n_tokens,
       round(pts / 3.0, 4) AS quality_score,
       CASE WHEN round(pts / 3.0, 4) >= 0.67 THEN 1 ELSE 0 END AS keep
FROM s
"""
    langs = sorted(_MARKERS)
    score_cols = ",\n         ".join(f"{_marker_sql(lg)} AS score_{lg}" for lg in langs)
    best = f"greatest({', '.join('score_' + lg for lg in langs)})"
    pred = "CASE WHEN best = 0 THEN 'und' " + " ".join(
        f"WHEN score_{lg} = best THEN '{lg}'" for lg in langs
    ) + " END"
    o["text_language_id"] = f"""
WITH t AS (SELECT doc_id, lang, {_TOK} AS toks FROM documents),
s AS (SELECT doc_id, lang,
         {score_cols}
      FROM t),
b AS (SELECT *, {best} AS best FROM s)
SELECT doc_id, lang, {pred} AS predicted_lang, best AS marker_hits FROM b
"""
    o["text_lang_profile"] = f"""
SELECT lang,
       count(*) AS doc_count,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 4) AS avg_chars,
       round(avg(len({_TOK})), 4) AS avg_tokens
FROM documents GROUP BY lang ORDER BY lang
"""
    o["text_fingerprint"] = "SELECT doc_id, md5(text) AS md5_fingerprint FROM documents"
    o["text_source_token_totals"] = f"""
SELECT source,
       count(*) AS doc_count,
       CAST(sum(len({_TOK})) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source ORDER BY source
"""

    # --- extended event analytics ---
    o["events_props_profile"] = """
SELECT event_type,
       count(*) AS n,
       count(k) AS k_present,
       min(k) AS k_min,
       max(k) AS k_max,
       round(avg(k), 4) AS k_avg
FROM (SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      FROM events)
GROUP BY event_type ORDER BY event_type
"""
    o["events_daily_cube"] = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n
FROM events
GROUP BY CUBE (CAST(date_trunc('day', ts) AS TIMESTAMP), event_type)
ORDER BY day NULLS FIRST, event_type NULLS FIRST
"""
    o["events_daily_moving_avg"] = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n
  FROM events GROUP BY 1
)
SELECT day, n,
       round(avg(n) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
         AS ma_7d
FROM daily ORDER BY day
"""
    o["events_top_paths"] = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_num
  FROM ordered),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, session_num
                               ORDER BY ts, event_id) AS rn
  FROM sess),
paths AS (
  SELECT user_id, session_num,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 3 GROUP BY 1, 2)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path LIMIT 20
"""
    o["events_sessionize"] = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
numbered AS (
  SELECT user_id, ts, event_id,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_num
  FROM g
)
SELECT user_id, session_num,
       min(ts) AS session_start,
       max(ts) AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_num
ORDER BY user_id, session_num
"""
    o["events_type_share"] = """
WITH counts AS (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
SELECT event_type, n,
       round(n / CAST(sum(n) OVER () AS DOUBLE), 6) AS share
FROM counts ORDER BY event_type
"""
    o["events_top_users"] = """
WITH counts AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT user_id, n,
       CAST(dense_rank() OVER (ORDER BY n DESC, user_id ASC) AS INTEGER)
         AS activity_rank
FROM counts ORDER BY n DESC, user_id ASC LIMIT 100
"""
    o["events_hour_profile"] = """
SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day, event_type,
       count(*) AS n,
       count(DISTINCT user_id) AS unique_users
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""
    o["events_cohort_retention"] = """
WITH first AS (
  SELECT user_id,
         CAST(min(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events)
SELECT cohort_week,
       CAST((CAST(epoch(week) AS BIGINT) - CAST(epoch(cohort_week) AS BIGINT))
            // 604800 AS INTEGER) AS week_offset,
       count(*) AS active_users
FROM activity JOIN first USING (user_id)
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""
    # events_approx_distinct: estimator-specific (HLL++), rows-only check.
    # multimodal_decode: hash-kernel op, rows-only.
    # multimodal_pcm_energy / image_phash: same determinism argument as
    # the header gates below — synth_pcm_audio / synth_media are pure
    # functions of media_id, so the REAL kernels' outputs (Goertzel-free
    # frame RMS/peak over synthesized tones; 64-bit DCT-free difference
    # pHash) are fixed constants, pinned and hash-checked per round.  The
    # closed-form laws (rms == amplitude/sqrt(2), pHash locality) stay in
    # tests/test_multimodal.py.  multimodal_{decode,resize,scene_detect}
    # remain rows-only: their kernels are the DOCUMENTED fake-decode stubs
    # (no codec libs in-sandbox), and pinning a stub's fake output would
    # manufacture evidence without testing anything real.
    o["multimodal_pcm_energy"] = """
SELECT CAST(media_id AS BIGINT) AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx, CAST(n_samples AS INTEGER) AS n_samples, CAST(rms AS DOUBLE) AS rms, CAST(peak AS INTEGER) AS peak FROM (VALUES
  (0, 0, 200, 0.423172, 19660),
  (0, 1, 200, 0.425293, 19660),
  (0, 2, 200, 0.423172, 19660),
  (0, 3, 200, 0.425293, 19660),
  (0, 4, 200, 0.423172, 19660),
  (0, 5, 200, 0.425293, 19660),
  (0, 6, 200, 0.423172, 19660),
  (0, 7, 200, 0.425293, 19660),
  (1, 0, 200, 0.070691, 3276),
  (1, 1, 200, 0.070691, 3276),
  (1, 2, 200, 0.070691, 3276),
  (1, 3, 200, 0.070691, 3276),
  (1, 4, 200, 0.070691, 3276),
  (1, 5, 200, 0.070691, 3276),
  (1, 6, 200, 0.070691, 3276),
  (1, 7, 200, 0.070691, 3276),
  (2, 0, 200, 0.28211, 13106),
  (2, 1, 200, 0.283524, 13106),
  (2, 2, 200, 0.28211, 13106),
  (2, 3, 200, 0.283524, 13106),
  (2, 4, 200, 0.28211, 13106),
  (2, 5, 200, 0.283524, 13106),
  (2, 6, 200, 0.28211, 13106),
  (2, 7, 200, 0.283524, 13106),
  (3, 0, 200, 0.494945, 22936),
  (3, 1, 200, 0.494945, 22936),
  (3, 2, 200, 0.494945, 22936),
  (3, 3, 200, 0.494945, 22936),
  (3, 4, 200, 0.494945, 22936),
  (3, 5, 200, 0.494945, 22936),
  (3, 6, 200, 0.494945, 22936),
  (3, 7, 200, 0.494945, 22936),
  (4, 0, 200, 0.141049, 6553),
  (4, 1, 200, 0.141756, 6553),
  (4, 2, 200, 0.141049, 6553),
  (4, 3, 200, 0.141756, 6553),
  (4, 4, 200, 0.141049, 6553),
  (4, 5, 200, 0.141756, 6553),
  (4, 6, 200, 0.141049, 6553),
  (4, 7, 200, 0.141756, 6553),
  (5, 0, 200, 0.353524, 16383),
  (5, 1, 200, 0.353524, 16383),
  (5, 2, 200, 0.353524, 16383),
  (5, 3, 200, 0.353524, 16383),
  (5, 4, 200, 0.353524, 16383),
  (5, 5, 200, 0.353524, 16383),
  (5, 6, 200, 0.353524, 16383),
  (5, 7, 200, 0.353524, 16383),
  (6, 0, 200, 0.564236, 26213),
  (6, 1, 200, 0.567064, 26213),
  (6, 2, 200, 0.564236, 26213),
  (6, 3, 200, 0.567064, 26213),
  (6, 4, 200, 0.564236, 26213),
  (6, 5, 200, 0.567064, 26213),
  (6, 6, 200, 0.564236, 26213),
  (6, 7, 200, 0.567064, 26213),
  (7, 0, 200, 0.212108, 9830),
  (7, 1, 200, 0.212108, 9830),
  (7, 2, 200, 0.212108, 9830),
  (7, 3, 200, 0.212108, 9830),
  (7, 4, 200, 0.212108, 9830),
  (7, 5, 200, 0.212108, 9830),
  (7, 6, 200, 0.212108, 9830),
  (7, 7, 200, 0.212108, 9830),
  (8, 0, 200, 0.423175, 19660),
  (8, 1, 200, 0.425296, 19660),
  (8, 2, 200, 0.423175, 19660),
  (8, 3, 200, 0.425296, 19660),
  (8, 4, 200, 0.423175, 19660),
  (8, 5, 200, 0.425296, 19660),
  (8, 6, 200, 0.423175, 19660),
  (8, 7, 200, 0.425296, 19660),
  (9, 0, 200, 0.070691, 3276),
  (9, 1, 200, 0.070691, 3276),
  (9, 2, 200, 0.070691, 3276),
  (9, 3, 200, 0.070691, 3276),
  (9, 4, 200, 0.070691, 3276),
  (9, 5, 200, 0.070691, 3276),
  (9, 6, 200, 0.070691, 3276),
  (9, 7, 200, 0.070691, 3276),
  (10, 0, 200, 0.28211, 13106),
  (10, 1, 200, 0.283524, 13106),
  (10, 2, 200, 0.28211, 13106),
  (10, 3, 200, 0.283524, 13106),
  (10, 4, 200, 0.28211, 13106),
  (10, 5, 200, 0.283524, 13106),
  (10, 6, 200, 0.28211, 13106),
  (10, 7, 200, 0.283524, 13106),
  (11, 0, 200, 0.494945, 22936),
  (11, 1, 200, 0.494945, 22936),
  (11, 2, 200, 0.494945, 22936),
  (11, 3, 200, 0.494945, 22936),
  (11, 4, 200, 0.494945, 22936),
  (11, 5, 200, 0.494945, 22936),
  (11, 6, 200, 0.494945, 22936),
  (11, 7, 200, 0.494945, 22936),
  (12, 0, 200, 0.141049, 6553),
  (12, 1, 200, 0.141756, 6553),
  (12, 2, 200, 0.141049, 6553),
  (12, 3, 200, 0.141756, 6553),
  (12, 4, 200, 0.141049, 6553),
  (12, 5, 200, 0.141756, 6553),
  (12, 6, 200, 0.141049, 6553),
  (12, 7, 200, 0.141756, 6553),
  (13, 0, 200, 0.353522, 15581),
  (13, 1, 200, 0.353522, 15581),
  (13, 2, 200, 0.353522, 15581),
  (13, 3, 200, 0.353522, 15581),
  (13, 4, 200, 0.353522, 15581),
  (13, 5, 200, 0.353522, 15581),
  (13, 6, 200, 0.353522, 15581),
  (13, 7, 200, 0.353522, 15581),
  (14, 0, 200, 0.564235, 26213),
  (14, 1, 200, 0.567064, 26213),
  (14, 2, 200, 0.564235, 26213),
  (14, 3, 200, 0.567064, 26213),
  (14, 4, 200, 0.564235, 26213),
  (14, 5, 200, 0.567064, 26213),
  (14, 6, 200, 0.564235, 26213),
  (14, 7, 200, 0.567064, 26213),
  (15, 0, 200, 0.212106, 9830),
  (15, 1, 200, 0.212106, 9830),
  (15, 2, 200, 0.212106, 9830),
  (15, 3, 200, 0.212106, 9830),
  (15, 4, 200, 0.212106, 9830),
  (15, 5, 200, 0.212106, 9830),
  (15, 6, 200, 0.212106, 9830),
  (15, 7, 200, 0.212106, 9830),
  (16, 0, 200, 0.423172, 19660),
  (16, 1, 200, 0.425293, 19660),
  (16, 2, 200, 0.423172, 19660),
  (16, 3, 200, 0.425293, 19660),
  (16, 4, 200, 0.423172, 19660),
  (16, 5, 200, 0.425293, 19660),
  (16, 6, 200, 0.423172, 19660),
  (16, 7, 200, 0.425293, 19660),
  (17, 0, 200, 0.070691, 3276),
  (17, 1, 200, 0.070691, 3276),
  (17, 2, 200, 0.070691, 3276),
  (17, 3, 200, 0.070691, 3276),
  (17, 4, 200, 0.070691, 3276),
  (17, 5, 200, 0.070691, 3276),
  (17, 6, 200, 0.070691, 3276),
  (17, 7, 200, 0.070691, 3276),
  (18, 0, 200, 0.28211, 13106),
  (18, 1, 200, 0.283524, 13106),
  (18, 2, 200, 0.28211, 13106),
  (18, 3, 200, 0.283524, 13106),
  (18, 4, 200, 0.28211, 13106),
  (18, 5, 200, 0.283524, 13106),
  (18, 6, 200, 0.28211, 13106),
  (18, 7, 200, 0.283524, 13106),
  (19, 0, 200, 0.494945, 22936),
  (19, 1, 200, 0.494945, 22936),
  (19, 2, 200, 0.494945, 22936),
  (19, 3, 200, 0.494945, 22936),
  (19, 4, 200, 0.494945, 22936),
  (19, 5, 200, 0.494945, 22936),
  (19, 6, 200, 0.494945, 22936),
  (19, 7, 200, 0.494945, 22936),
  (20, 0, 200, 0.141049, 6553),
  (20, 1, 200, 0.141756, 6553),
  (20, 2, 200, 0.141049, 6553),
  (20, 3, 200, 0.141756, 6553),
  (20, 4, 200, 0.141049, 6553),
  (20, 5, 200, 0.141756, 6553),
  (20, 6, 200, 0.141049, 6553),
  (20, 7, 200, 0.141756, 6553),
  (21, 0, 200, 0.353524, 16383),
  (21, 1, 200, 0.353524, 16383),
  (21, 2, 200, 0.353524, 16383),
  (21, 3, 200, 0.353524, 16383),
  (21, 4, 200, 0.353524, 16383),
  (21, 5, 200, 0.353524, 16383),
  (21, 6, 200, 0.353524, 16383),
  (21, 7, 200, 0.353524, 16383),
  (22, 0, 200, 0.564236, 26213),
  (22, 1, 200, 0.567064, 26213),
  (22, 2, 200, 0.564236, 26213),
  (22, 3, 200, 0.567064, 26213),
  (22, 4, 200, 0.564236, 26213),
  (22, 5, 200, 0.567064, 26213),
  (22, 6, 200, 0.564236, 26213),
  (22, 7, 200, 0.567064, 26213),
  (23, 0, 200, 0.212108, 9830),
  (23, 1, 200, 0.212108, 9830),
  (23, 2, 200, 0.212108, 9830),
  (23, 3, 200, 0.212108, 9830),
  (23, 4, 200, 0.212108, 9830),
  (23, 5, 200, 0.212108, 9830),
  (23, 6, 200, 0.212108, 9830),
  (23, 7, 200, 0.212108, 9830),
  (24, 0, 200, 0.423175, 19660),
  (24, 1, 200, 0.425296, 19660),
  (24, 2, 200, 0.423175, 19660),
  (24, 3, 200, 0.425296, 19660),
  (24, 4, 200, 0.423175, 19660),
  (24, 5, 200, 0.425296, 19660),
  (24, 6, 200, 0.423175, 19660),
  (24, 7, 200, 0.425296, 19660),
  (25, 0, 200, 0.070691, 3276),
  (25, 1, 200, 0.070691, 3276),
  (25, 2, 200, 0.070691, 3276),
  (25, 3, 200, 0.070691, 3276),
  (25, 4, 200, 0.070691, 3276),
  (25, 5, 200, 0.070691, 3276),
  (25, 6, 200, 0.070691, 3276),
  (25, 7, 200, 0.070691, 3276),
  (26, 0, 200, 0.28211, 13106),
  (26, 1, 200, 0.283524, 13106),
  (26, 2, 200, 0.28211, 13106),
  (26, 3, 200, 0.283524, 13106),
  (26, 4, 200, 0.28211, 13106),
  (26, 5, 200, 0.283524, 13106),
  (26, 6, 200, 0.28211, 13106),
  (26, 7, 200, 0.283524, 13106),
  (27, 0, 200, 0.494945, 22936),
  (27, 1, 200, 0.494945, 22936),
  (27, 2, 200, 0.494945, 22936),
  (27, 3, 200, 0.494945, 22936),
  (27, 4, 200, 0.494945, 22936),
  (27, 5, 200, 0.494945, 22936),
  (27, 6, 200, 0.494945, 22936),
  (27, 7, 200, 0.494945, 22936),
  (28, 0, 200, 0.141049, 6553),
  (28, 1, 200, 0.141756, 6553),
  (28, 2, 200, 0.141049, 6553),
  (28, 3, 200, 0.141756, 6553),
  (28, 4, 200, 0.141049, 6553),
  (28, 5, 200, 0.141756, 6553),
  (28, 6, 200, 0.141049, 6553),
  (28, 7, 200, 0.141756, 6553),
  (29, 0, 200, 0.353522, 15581),
  (29, 1, 200, 0.353522, 15581),
  (29, 2, 200, 0.353522, 15581),
  (29, 3, 200, 0.353522, 15581),
  (29, 4, 200, 0.353522, 15581),
  (29, 5, 200, 0.353522, 15581),
  (29, 6, 200, 0.353522, 15581),
  (29, 7, 200, 0.353522, 15581),
  (30, 0, 200, 0.564235, 26213),
  (30, 1, 200, 0.567064, 26213),
  (30, 2, 200, 0.564235, 26213),
  (30, 3, 200, 0.567064, 26213),
  (30, 4, 200, 0.564235, 26213),
  (30, 5, 200, 0.567064, 26213),
  (30, 6, 200, 0.564235, 26213),
  (30, 7, 200, 0.567064, 26213),
  (31, 0, 200, 0.212106, 9830),
  (31, 1, 200, 0.212106, 9830),
  (31, 2, 200, 0.212106, 9830),
  (31, 3, 200, 0.212106, 9830),
  (31, 4, 200, 0.212106, 9830),
  (31, 5, 200, 0.212106, 9830),
  (31, 6, 200, 0.212106, 9830),
  (31, 7, 200, 0.212106, 9830),
  (32, 0, 200, 0.423172, 19660),
  (32, 1, 200, 0.425293, 19660),
  (32, 2, 200, 0.423172, 19660),
  (32, 3, 200, 0.425293, 19660),
  (32, 4, 200, 0.423172, 19660),
  (32, 5, 200, 0.425293, 19660),
  (32, 6, 200, 0.423172, 19660),
  (32, 7, 200, 0.425293, 19660),
  (33, 0, 200, 0.070691, 3276),
  (33, 1, 200, 0.070691, 3276),
  (33, 2, 200, 0.070691, 3276),
  (33, 3, 200, 0.070691, 3276),
  (33, 4, 200, 0.070691, 3276),
  (33, 5, 200, 0.070691, 3276),
  (33, 6, 200, 0.070691, 3276),
  (33, 7, 200, 0.070691, 3276),
  (34, 0, 200, 0.28211, 13106),
  (34, 1, 200, 0.283524, 13106),
  (34, 2, 200, 0.28211, 13106),
  (34, 3, 200, 0.283524, 13106),
  (34, 4, 200, 0.28211, 13106),
  (34, 5, 200, 0.283524, 13106),
  (34, 6, 200, 0.28211, 13106),
  (34, 7, 200, 0.283524, 13106),
  (35, 0, 200, 0.494945, 22936),
  (35, 1, 200, 0.494945, 22936),
  (35, 2, 200, 0.494945, 22936),
  (35, 3, 200, 0.494945, 22936),
  (35, 4, 200, 0.494945, 22936),
  (35, 5, 200, 0.494945, 22936),
  (35, 6, 200, 0.494945, 22936),
  (35, 7, 200, 0.494945, 22936),
  (36, 0, 200, 0.141049, 6553),
  (36, 1, 200, 0.141756, 6553),
  (36, 2, 200, 0.141049, 6553),
  (36, 3, 200, 0.141756, 6553),
  (36, 4, 200, 0.141049, 6553),
  (36, 5, 200, 0.141756, 6553),
  (36, 6, 200, 0.141049, 6553),
  (36, 7, 200, 0.141756, 6553),
  (37, 0, 200, 0.353524, 16383),
  (37, 1, 200, 0.353524, 16383),
  (37, 2, 200, 0.353524, 16383),
  (37, 3, 200, 0.353524, 16383),
  (37, 4, 200, 0.353524, 16383),
  (37, 5, 200, 0.353524, 16383),
  (37, 6, 200, 0.353524, 16383),
  (37, 7, 200, 0.353524, 16383),
  (38, 0, 200, 0.564236, 26213),
  (38, 1, 200, 0.567064, 26213),
  (38, 2, 200, 0.564236, 26213),
  (38, 3, 200, 0.567064, 26213),
  (38, 4, 200, 0.564236, 26213),
  (38, 5, 200, 0.567064, 26213),
  (38, 6, 200, 0.564236, 26213),
  (38, 7, 200, 0.567064, 26213),
  (39, 0, 200, 0.212108, 9830),
  (39, 1, 200, 0.212108, 9830),
  (39, 2, 200, 0.212108, 9830),
  (39, 3, 200, 0.212108, 9830),
  (39, 4, 200, 0.212108, 9830),
  (39, 5, 200, 0.212108, 9830),
  (39, 6, 200, 0.212108, 9830),
  (39, 7, 200, 0.212108, 9830),
  (40, 0, 200, 0.423175, 19660),
  (40, 1, 200, 0.425296, 19660),
  (40, 2, 200, 0.423175, 19660),
  (40, 3, 200, 0.425296, 19660),
  (40, 4, 200, 0.423175, 19660),
  (40, 5, 200, 0.425296, 19660),
  (40, 6, 200, 0.423175, 19660),
  (40, 7, 200, 0.425296, 19660),
  (41, 0, 200, 0.070691, 3276),
  (41, 1, 200, 0.070691, 3276),
  (41, 2, 200, 0.070691, 3276),
  (41, 3, 200, 0.070691, 3276),
  (41, 4, 200, 0.070691, 3276),
  (41, 5, 200, 0.070691, 3276),
  (41, 6, 200, 0.070691, 3276),
  (41, 7, 200, 0.070691, 3276),
  (42, 0, 200, 0.28211, 13106),
  (42, 1, 200, 0.283524, 13106),
  (42, 2, 200, 0.28211, 13106),
  (42, 3, 200, 0.283524, 13106),
  (42, 4, 200, 0.28211, 13106),
  (42, 5, 200, 0.283524, 13106),
  (42, 6, 200, 0.28211, 13106),
  (42, 7, 200, 0.283524, 13106),
  (43, 0, 200, 0.494945, 22936),
  (43, 1, 200, 0.494945, 22936),
  (43, 2, 200, 0.494945, 22936),
  (43, 3, 200, 0.494945, 22936),
  (43, 4, 200, 0.494945, 22936),
  (43, 5, 200, 0.494945, 22936),
  (43, 6, 200, 0.494945, 22936),
  (43, 7, 200, 0.494945, 22936),
  (44, 0, 200, 0.141049, 6553),
  (44, 1, 200, 0.141756, 6553),
  (44, 2, 200, 0.141049, 6553),
  (44, 3, 200, 0.141756, 6553),
  (44, 4, 200, 0.141049, 6553),
  (44, 5, 200, 0.141756, 6553),
  (44, 6, 200, 0.141049, 6553),
  (44, 7, 200, 0.141756, 6553),
  (45, 0, 200, 0.353522, 15581),
  (45, 1, 200, 0.353522, 15581),
  (45, 2, 200, 0.353522, 15581),
  (45, 3, 200, 0.353522, 15581),
  (45, 4, 200, 0.353522, 15581),
  (45, 5, 200, 0.353522, 15581),
  (45, 6, 200, 0.353522, 15581),
  (45, 7, 200, 0.353522, 15581),
  (46, 0, 200, 0.564235, 26213),
  (46, 1, 200, 0.567064, 26213),
  (46, 2, 200, 0.564235, 26213),
  (46, 3, 200, 0.567064, 26213),
  (46, 4, 200, 0.564235, 26213),
  (46, 5, 200, 0.567064, 26213),
  (46, 6, 200, 0.564235, 26213),
  (46, 7, 200, 0.567064, 26213),
  (47, 0, 200, 0.212106, 9830),
  (47, 1, 200, 0.212106, 9830),
  (47, 2, 200, 0.212106, 9830),
  (47, 3, 200, 0.212106, 9830),
  (47, 4, 200, 0.212106, 9830),
  (47, 5, 200, 0.212106, 9830),
  (47, 6, 200, 0.212106, 9830),
  (47, 7, 200, 0.212106, 9830),
  (48, 0, 200, 0.423172, 19660),
  (48, 1, 200, 0.425293, 19660),
  (48, 2, 200, 0.423172, 19660),
  (48, 3, 200, 0.425293, 19660),
  (48, 4, 200, 0.423172, 19660),
  (48, 5, 200, 0.425293, 19660),
  (48, 6, 200, 0.423172, 19660),
  (48, 7, 200, 0.425293, 19660),
  (49, 0, 200, 0.070691, 3276),
  (49, 1, 200, 0.070691, 3276),
  (49, 2, 200, 0.070691, 3276),
  (49, 3, 200, 0.070691, 3276),
  (49, 4, 200, 0.070691, 3276),
  (49, 5, 200, 0.070691, 3276),
  (49, 6, 200, 0.070691, 3276),
  (49, 7, 200, 0.070691, 3276),
  (50, 0, 200, 0.28211, 13106),
  (50, 1, 200, 0.283524, 13106),
  (50, 2, 200, 0.28211, 13106),
  (50, 3, 200, 0.283524, 13106),
  (50, 4, 200, 0.28211, 13106),
  (50, 5, 200, 0.283524, 13106),
  (50, 6, 200, 0.28211, 13106),
  (50, 7, 200, 0.283524, 13106),
  (51, 0, 200, 0.494945, 22936),
  (51, 1, 200, 0.494945, 22936),
  (51, 2, 200, 0.494945, 22936),
  (51, 3, 200, 0.494945, 22936),
  (51, 4, 200, 0.494945, 22936),
  (51, 5, 200, 0.494945, 22936),
  (51, 6, 200, 0.494945, 22936),
  (51, 7, 200, 0.494945, 22936),
  (52, 0, 200, 0.141049, 6553),
  (52, 1, 200, 0.141756, 6553),
  (52, 2, 200, 0.141049, 6553),
  (52, 3, 200, 0.141756, 6553),
  (52, 4, 200, 0.141049, 6553),
  (52, 5, 200, 0.141756, 6553),
  (52, 6, 200, 0.141049, 6553),
  (52, 7, 200, 0.141756, 6553),
  (53, 0, 200, 0.353524, 16383),
  (53, 1, 200, 0.353524, 16383),
  (53, 2, 200, 0.353524, 16383),
  (53, 3, 200, 0.353524, 16383),
  (53, 4, 200, 0.353524, 16383),
  (53, 5, 200, 0.353524, 16383),
  (53, 6, 200, 0.353524, 16383),
  (53, 7, 200, 0.353524, 16383),
  (54, 0, 200, 0.564236, 26213),
  (54, 1, 200, 0.567064, 26213),
  (54, 2, 200, 0.564236, 26213),
  (54, 3, 200, 0.567064, 26213),
  (54, 4, 200, 0.564236, 26213),
  (54, 5, 200, 0.567064, 26213),
  (54, 6, 200, 0.564236, 26213),
  (54, 7, 200, 0.567064, 26213),
  (55, 0, 200, 0.212108, 9830),
  (55, 1, 200, 0.212108, 9830),
  (55, 2, 200, 0.212108, 9830),
  (55, 3, 200, 0.212108, 9830),
  (55, 4, 200, 0.212108, 9830),
  (55, 5, 200, 0.212108, 9830),
  (55, 6, 200, 0.212108, 9830),
  (55, 7, 200, 0.212108, 9830),
  (56, 0, 200, 0.423175, 19660),
  (56, 1, 200, 0.425296, 19660),
  (56, 2, 200, 0.423175, 19660),
  (56, 3, 200, 0.425296, 19660),
  (56, 4, 200, 0.423175, 19660),
  (56, 5, 200, 0.425296, 19660),
  (56, 6, 200, 0.423175, 19660),
  (56, 7, 200, 0.425296, 19660),
  (57, 0, 200, 0.070691, 3276),
  (57, 1, 200, 0.070691, 3276),
  (57, 2, 200, 0.070691, 3276),
  (57, 3, 200, 0.070691, 3276),
  (57, 4, 200, 0.070691, 3276),
  (57, 5, 200, 0.070691, 3276),
  (57, 6, 200, 0.070691, 3276),
  (57, 7, 200, 0.070691, 3276),
  (58, 0, 200, 0.28211, 13106),
  (58, 1, 200, 0.283524, 13106),
  (58, 2, 200, 0.28211, 13106),
  (58, 3, 200, 0.283524, 13106),
  (58, 4, 200, 0.28211, 13106),
  (58, 5, 200, 0.283524, 13106),
  (58, 6, 200, 0.28211, 13106),
  (58, 7, 200, 0.283524, 13106),
  (59, 0, 200, 0.494945, 22936),
  (59, 1, 200, 0.494945, 22936),
  (59, 2, 200, 0.494945, 22936),
  (59, 3, 200, 0.494945, 22936),
  (59, 4, 200, 0.494945, 22936),
  (59, 5, 200, 0.494945, 22936),
  (59, 6, 200, 0.494945, 22936),
  (59, 7, 200, 0.494945, 22936),
  (60, 0, 200, 0.141049, 6553),
  (60, 1, 200, 0.141756, 6553),
  (60, 2, 200, 0.141049, 6553),
  (60, 3, 200, 0.141756, 6553),
  (60, 4, 200, 0.141049, 6553),
  (60, 5, 200, 0.141756, 6553),
  (60, 6, 200, 0.141049, 6553),
  (60, 7, 200, 0.141756, 6553),
  (61, 0, 200, 0.353522, 15581),
  (61, 1, 200, 0.353522, 15581),
  (61, 2, 200, 0.353522, 15581),
  (61, 3, 200, 0.353522, 15581),
  (61, 4, 200, 0.353522, 15581),
  (61, 5, 200, 0.353522, 15581),
  (61, 6, 200, 0.353522, 15581),
  (61, 7, 200, 0.353522, 15581),
  (62, 0, 200, 0.564235, 26213),
  (62, 1, 200, 0.567064, 26213),
  (62, 2, 200, 0.564235, 26213),
  (62, 3, 200, 0.567064, 26213),
  (62, 4, 200, 0.564235, 26213),
  (62, 5, 200, 0.567064, 26213),
  (62, 6, 200, 0.564235, 26213),
  (62, 7, 200, 0.567064, 26213),
  (63, 0, 200, 0.212106, 9830),
  (63, 1, 200, 0.212106, 9830),
  (63, 2, 200, 0.212106, 9830),
  (63, 3, 200, 0.212106, 9830),
  (63, 4, 200, 0.212106, 9830),
  (63, 5, 200, 0.212106, 9830),
  (63, 6, 200, 0.212106, 9830),
  (63, 7, 200, 0.212106, 9830)
) AS t(media_id, frame_idx, n_samples, rms, peak)
ORDER BY media_id, frame_idx
"""
    o["multimodal_image_phash"] = """
SELECT CAST(media_id AS BIGINT) AS media_id, CAST(phash AS BIGINT) AS phash FROM (VALUES
  (0, -8780484748371731349),
  (1, 7607028816478507330),
  (2, -637583103981133824),
  (3, 1107413000465672480),
  (4, -9061073289685562141),
  (5, -3845395237086158031),
  (6, 304204209522809337),
  (7, 3315986985407683337),
  (8, 7514347416116539912),
  (9, -8924593495846803276),
  (10, 596878342918077094),
  (11, 4983352423480670224),
  (12, -1245904750197133230),
  (13, 6986599936022295124),
  (14, 165171478387460281),
  (15, 1641580755910657892),
  (16, -8222230009837550318),
  (17, 3486984665271744593),
  (18, 3119048887686545418),
  (19, 3712131138609848352),
  (20, 1515212832363454849),
  (21, 239249456803035276),
  (22, 1163701120129860878),
  (23, -6694155088566676732),
  (24, 3501991693669540692),
  (25, -5124811790335997942),
  (26, 3315214621958216286),
  (27, 290395790274487316),
  (28, 7134405999977662986),
  (29, -5380549445029981888),
  (30, -430705615820242912),
  (31, 4977050548218921257),
  (32, 7242606930391288508),
  (33, -7236611617034570944),
  (34, 5480881768232003653),
  (35, 381183297410584082),
  (36, -7806870010206221246),
  (37, 6564420939507974299),
  (38, 2280408184333427392),
  (39, 1481789848046405376),
  (40, -3803736974102735808),
  (41, 602083870334984324),
  (42, 1496357743402672735),
  (43, -5569949842432422266),
  (44, 4775188206045964985),
  (45, 51040705560510468),
  (46, 142574244552560910),
  (47, 2342857292303106386),
  (48, -7914218022800045726),
  (49, 7785080334404667536),
  (50, 6206831402556358468),
  (51, 1914356200751764933),
  (52, 6003870653987381650),
  (53, 1370945392425873565),
  (54, -5441306504172045904),
  (55, 4715205001448960236),
  (56, 5220876041102149013),
  (57, 6000490446024560781),
  (58, -2157637620346253887),
  (59, 1390891872965456177),
  (60, -8159035691571172065),
  (61, 9027488363623633217),
  (62, 5801551293579333962),
  (63, 337005163247272499)
) AS t(media_id, phash)
ORDER BY media_id
"""
    # multimodal_{wav,png,jpeg}_headers: the synth_*_media fixtures are
    # PURE FUNCTIONS of media_id (deterministic byte construction), so the
    # parsed header tables are fixed constants — pinned below exactly like
    # generator_profile.  The oracles hash-check the full parser output
    # (valid gates, dims, chunk counts) every round; any drift in the
    # container parsers or fixture construction breaks the match.  The
    # parsers' closed-form correctness (CRC walk, fmt gates, EOI search)
    # remains pinned in tests/test_multimodal.py.
    o["multimodal_wav_headers"] = """
SELECT CAST(media_id AS BIGINT) AS media_id, CAST(valid AS BOOLEAN) AS valid, CAST(audio_format AS INTEGER) AS audio_format, CAST(channels AS INTEGER) AS channels, CAST(sample_rate AS INTEGER) AS sample_rate, CAST(bits_per_sample AS INTEGER) AS bits_per_sample, CAST(data_bytes AS BIGINT) AS data_bytes, CAST(duration_s AS DOUBLE) AS duration_s FROM (VALUES
  (0, true, 1, 1, 8000, 16, 800, 0.05),
  (1, true, 1, 2, 16000, 16, 2000, 0.03125),
  (2, true, 1, 1, 24000, 16, 1200, 0.025),
  (3, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (4, true, 1, 1, 16000, 16, 1600, 0.05),
  (5, true, 1, 2, 24000, 16, 1600, 0.016667),
  (6, true, 1, 1, 8000, 16, 1000, 0.0625),
  (7, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (8, true, 1, 1, 24000, 16, 1400, 0.029167),
  (9, true, 1, 2, 8000, 16, 3200, 0.1),
  (10, true, 1, 1, 16000, 16, 800, 0.025),
  (11, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (12, true, 1, 1, 8000, 16, 1200, 0.075),
  (13, true, 1, 2, 16000, 16, 2800, 0.04375),
  (14, true, 1, 1, 24000, 16, 1600, 0.033333),
  (15, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (16, true, 1, 1, 16000, 16, 1000, 0.03125),
  (17, true, 1, 2, 24000, 16, 2400, 0.025),
  (18, true, 1, 1, 8000, 16, 1400, 0.0875),
  (19, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (20, true, 1, 1, 24000, 16, 800, 0.016667),
  (21, true, 1, 2, 8000, 16, 2000, 0.0625),
  (22, true, 1, 1, 16000, 16, 1200, 0.0375),
  (23, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (24, true, 1, 1, 8000, 16, 1600, 0.1),
  (25, true, 1, 2, 16000, 16, 1600, 0.025),
  (26, true, 1, 1, 24000, 16, 1000, 0.020833),
  (27, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (28, true, 1, 1, 16000, 16, 1400, 0.04375),
  (29, true, 1, 2, 24000, 16, 3200, 0.033333),
  (30, true, 1, 1, 8000, 16, 800, 0.05),
  (31, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (32, true, 1, 1, 24000, 16, 1200, 0.025),
  (33, true, 1, 2, 8000, 16, 2800, 0.0875),
  (34, true, 1, 1, 16000, 16, 1600, 0.05),
  (35, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (36, true, 1, 1, 8000, 16, 1000, 0.0625),
  (37, true, 1, 2, 16000, 16, 2400, 0.0375),
  (38, true, 1, 1, 24000, 16, 1400, 0.029167),
  (39, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (40, true, 1, 1, 16000, 16, 800, 0.025),
  (41, true, 1, 2, 24000, 16, 2000, 0.020833),
  (42, true, 1, 1, 8000, 16, 1200, 0.075),
  (43, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (44, true, 1, 1, 24000, 16, 1600, 0.033333),
  (45, true, 1, 2, 8000, 16, 1600, 0.05),
  (46, true, 1, 1, 16000, 16, 1000, 0.03125),
  (47, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (48, true, 1, 1, 8000, 16, 1400, 0.0875),
  (49, true, 1, 2, 16000, 16, 3200, 0.05),
  (50, true, 1, 1, 24000, 16, 800, 0.016667),
  (51, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (52, true, 1, 1, 16000, 16, 1200, 0.0375),
  (53, true, 1, 2, 24000, 16, 2800, 0.029167),
  (54, true, 1, 1, 8000, 16, 1600, 0.1),
  (55, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (56, true, 1, 1, 24000, 16, 1000, 0.020833),
  (57, true, 1, 2, 8000, 16, 2400, 0.075),
  (58, true, 1, 1, 16000, 16, 1400, 0.04375),
  (59, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (60, true, 1, 1, 8000, 16, 800, 0.05),
  (61, true, 1, 2, 16000, 16, 2000, 0.03125),
  (62, true, 1, 1, 24000, 16, 1200, 0.025),
  (63, false, NULL, NULL, NULL, NULL, NULL, NULL)
) AS t(media_id, valid, audio_format, channels, sample_rate, bits_per_sample, data_bytes, duration_s)
ORDER BY media_id
"""
    o["multimodal_png_headers"] = """
SELECT CAST(media_id AS BIGINT) AS media_id, CAST(valid AS BOOLEAN) AS valid, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height, CAST(bit_depth AS INTEGER) AS bit_depth, CAST(color_type AS INTEGER) AS color_type, CAST(interlaced AS BOOLEAN) AS interlaced, CAST(has_alpha AS BOOLEAN) AS has_alpha, CAST(n_chunks AS INTEGER) AS n_chunks, CAST(n_pixels AS BIGINT) AS n_pixels FROM (VALUES
  (0, true, 4, 3, 8, 0, false, false, 3, 12),
  (1, true, 5, 4, 8, 2, false, false, 3, 20),
  (2, true, 6, 5, 8, 6, false, true, 3, 30),
  (3, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (4, true, 8, 7, 8, 2, false, false, 3, 56),
  (5, true, 9, 3, 8, 6, false, true, 3, 27),
  (6, true, 10, 4, 8, 0, false, false, 3, 40),
  (7, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (8, true, 5, 6, 8, 6, false, true, 3, 30),
  (9, true, 6, 7, 8, 0, false, false, 3, 42),
  (10, true, 7, 3, 8, 2, false, false, 3, 21),
  (11, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (12, true, 9, 5, 8, 0, false, false, 3, 45),
  (13, true, 10, 6, 8, 2, false, false, 3, 60),
  (14, true, 4, 7, 8, 6, false, true, 3, 28),
  (15, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (16, true, 6, 4, 8, 2, false, false, 3, 24),
  (17, true, 7, 5, 8, 6, false, true, 3, 35),
  (18, true, 8, 6, 8, 0, false, false, 3, 48),
  (19, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (20, true, 10, 3, 8, 6, false, true, 3, 30),
  (21, true, 4, 4, 8, 0, false, false, 3, 16),
  (22, true, 5, 5, 8, 2, false, false, 3, 25),
  (23, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (24, true, 7, 7, 8, 0, false, false, 3, 49),
  (25, true, 8, 3, 8, 2, false, false, 3, 24),
  (26, true, 9, 4, 8, 6, false, true, 3, 36),
  (27, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (28, true, 4, 6, 8, 2, false, false, 3, 24),
  (29, true, 5, 7, 8, 6, false, true, 3, 35),
  (30, true, 6, 3, 8, 0, false, false, 3, 18),
  (31, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (32, true, 8, 5, 8, 6, false, true, 3, 40),
  (33, true, 9, 6, 8, 0, false, false, 3, 54),
  (34, true, 10, 7, 8, 2, false, false, 3, 70),
  (35, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (36, true, 5, 4, 8, 0, false, false, 3, 20),
  (37, true, 6, 5, 8, 2, false, false, 3, 30),
  (38, true, 7, 6, 8, 6, false, true, 3, 42),
  (39, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (40, true, 9, 3, 8, 2, false, false, 3, 27),
  (41, true, 10, 4, 8, 6, false, true, 3, 40),
  (42, true, 4, 5, 8, 0, false, false, 3, 20),
  (43, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (44, true, 6, 7, 8, 6, false, true, 3, 42),
  (45, true, 7, 3, 8, 0, false, false, 3, 21),
  (46, true, 8, 4, 8, 2, false, false, 3, 32),
  (47, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (48, true, 10, 6, 8, 0, false, false, 3, 60),
  (49, true, 4, 7, 8, 2, false, false, 3, 28),
  (50, true, 5, 3, 8, 6, false, true, 3, 15),
  (51, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (52, true, 7, 5, 8, 2, false, false, 3, 35),
  (53, true, 8, 6, 8, 6, false, true, 3, 48),
  (54, true, 9, 7, 8, 0, false, false, 3, 63),
  (55, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (56, true, 4, 4, 8, 6, false, true, 3, 16),
  (57, true, 5, 5, 8, 0, false, false, 3, 25),
  (58, true, 6, 6, 8, 2, false, false, 3, 36),
  (59, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL),
  (60, true, 8, 3, 8, 0, false, false, 3, 24),
  (61, true, 9, 4, 8, 2, false, false, 3, 36),
  (62, true, 10, 5, 8, 6, false, true, 3, 50),
  (63, false, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL)
) AS t(media_id, valid, width, height, bit_depth, color_type, interlaced, has_alpha, n_chunks, n_pixels)
ORDER BY media_id
"""
    o["multimodal_jpeg_headers"] = """
SELECT CAST(media_id AS BIGINT) AS media_id, CAST(valid AS BOOLEAN) AS valid, CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height, CAST(precision AS INTEGER) AS precision, CAST(n_components AS INTEGER) AS n_components, CAST(progressive AS BOOLEAN) AS progressive, CAST(n_segments AS INTEGER) AS n_segments FROM (VALUES
  (0, true, 16, 9, 8, 1, true, 7),
  (1, true, 17, 10, 8, 3, false, 7),
  (2, true, 18, 11, 8, 3, false, 7),
  (3, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (4, true, 20, 13, 8, 3, false, 7),
  (5, true, 21, 14, 8, 3, true, 7),
  (6, true, 22, 15, 8, 1, false, 7),
  (7, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (8, true, 24, 10, 8, 3, false, 7),
  (9, true, 16, 11, 8, 1, false, 7),
  (10, true, 17, 12, 8, 3, true, 7),
  (11, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (12, true, 19, 14, 8, 1, false, 7),
  (13, true, 20, 15, 8, 3, false, 7),
  (14, true, 21, 9, 8, 3, false, 7),
  (15, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (16, true, 23, 11, 8, 3, false, 7),
  (17, true, 24, 12, 8, 3, false, 7),
  (18, true, 16, 13, 8, 1, false, 7),
  (19, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (20, true, 18, 15, 8, 3, true, 7),
  (21, true, 19, 9, 8, 1, false, 7),
  (22, true, 20, 10, 8, 3, false, 7),
  (23, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (24, true, 22, 12, 8, 1, false, 7),
  (25, true, 23, 13, 8, 3, true, 7),
  (26, true, 24, 14, 8, 3, false, 7),
  (27, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (28, true, 17, 9, 8, 3, false, 7),
  (29, true, 18, 10, 8, 3, false, 7),
  (30, true, 19, 11, 8, 1, true, 7),
  (31, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (32, true, 21, 13, 8, 3, false, 7),
  (33, true, 22, 14, 8, 1, false, 7),
  (34, true, 23, 15, 8, 3, false, 7),
  (35, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (36, true, 16, 10, 8, 1, false, 7),
  (37, true, 17, 11, 8, 3, false, 7),
  (38, true, 18, 12, 8, 3, false, 7),
  (39, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (40, true, 20, 14, 8, 3, true, 7),
  (41, true, 21, 15, 8, 3, false, 7),
  (42, true, 22, 9, 8, 1, false, 7),
  (43, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (44, true, 24, 11, 8, 3, false, 7),
  (45, true, 16, 12, 8, 1, true, 7),
  (46, true, 17, 13, 8, 3, false, 7),
  (47, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (48, true, 19, 15, 8, 1, false, 7),
  (49, true, 20, 9, 8, 3, false, 7),
  (50, true, 21, 10, 8, 3, true, 7),
  (51, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (52, true, 23, 12, 8, 3, false, 7),
  (53, true, 24, 13, 8, 3, false, 7),
  (54, true, 16, 14, 8, 1, false, 7),
  (55, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (56, true, 18, 9, 8, 3, false, 7),
  (57, true, 19, 10, 8, 1, false, 7),
  (58, true, 20, 11, 8, 3, false, 7),
  (59, false, NULL, NULL, NULL, NULL, NULL, NULL),
  (60, true, 22, 13, 8, 1, true, 7),
  (61, true, 23, 14, 8, 3, false, 7),
  (62, true, 24, 15, 8, 3, false, 7),
  (63, false, NULL, NULL, NULL, NULL, NULL, NULL)
) AS t(media_id, valid, width, height, precision, n_components, progressive, n_segments)
ORDER BY media_id
"""

    # generator_profile: the generator is a PURE FUNCTION of the row id
    # (seeded xxhash64 draws — sources/generator.py:34-43), so its profile
    # at (count=10000, num_users=100, seed=42) is a fixed constant table
    # independent of partitioning and session config.  The oracle pins
    # those constants (captured from an independent session, stable across
    # reruns): it verifies determinism + distribution shape every round —
    # any drift in the hash kernel, type table, or session-rotation rule
    # breaks the hash match.  Invariants baked into the constants: all 10
    # REFERENCE_EVENT_TYPES present, sum(n)=10000, users=100 everywhere,
    # sessions<=n with ~n/10 expected run length.
    o["generator_profile"] = """
SELECT * FROM (VALUES
  ('add_to_cart', 976, 100, 974),
  ('click', 1039, 100, 1035),
  ('form_submit', 977, 100, 972),
  ('logout', 1011, 100, 1004),
  ('page_view', 1027, 100, 1019),
  ('purchase', 1047, 100, 1043),
  ('scroll', 975, 100, 973),
  ('search', 936, 100, 934),
  ('video_pause', 1001, 100, 997),
  ('video_play', 1011, 100, 1005)
) AS t(event_type, n, users, sessions)
ORDER BY event_type
"""
    o["events_session_window"] = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(epoch(ts) AS BIGINT) - CAST(epoch(lag(ts) OVER w) AS BIGINT) >= 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
),
numbered AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_num
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_num
ORDER BY user_id, session_start
"""
    o["events_sliding_window"] = """
SELECT ws AS window_start,
       ws + INTERVAL 2 HOUR AS window_end,
       event_type,
       count(*) AS n
FROM (
  SELECT date_trunc('hour', ts) - to_hours(o) AS ws, event_type
  FROM events, unnest([0, 1]) t(o)
)
GROUP BY ws, event_type
ORDER BY window_start, event_type
"""
    o["inactive_customers"] = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
)
ORDER BY c_custkey
"""
    o["part_search"] = r"""
SELECT p_partkey, p_name, p_type,
       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
       upper(p_brand) AS brand_upper
FROM part
WHERE p_name LIKE 'red %' OR p_type LIKE '%STANDARD%'
ORDER BY p_partkey
"""
    o["priority_with_returns"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
    o["returned_item_revenue"] = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""
    o["promo_revenue_share"] = """
SELECT round(sum(CASE WHEN p_type LIKE 'PROMO%'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4)
         AS promo_revenue,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue,
       round(round(sum(CASE WHEN p_type LIKE 'PROMO%'
                            THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 4)
             / round(sum(l_extendedprice * (1 - l_discount)), 4) * 100.0, 6)
         AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""
    o["large_volume_customers"] = """
WITH big AS (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING round(sum(l_quantity), 2) > 200
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""
    # sim_ivf_topk: approximate (probed cells), rows-only check.
    o["price_quantiles"] = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

    o["text_token_frequencies"] = f"""
SELECT token, count(*) AS freq
FROM (SELECT unnest({_TOK}) AS token FROM documents)
GROUP BY token ORDER BY freq DESC, token ASC LIMIT 100
"""
    o["text_feature_hash"] = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS token FROM documents
), b AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substr(md5(token), 1, 4)) AS INTEGER) % 256
              AS INT) AS bucket
  FROM tok
), c AS (
  SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY doc_id, bucket
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_buckets,
       string_agg(bucket || ':' || c, ',' ORDER BY bucket) AS features
FROM c GROUP BY doc_id ORDER BY doc_id
"""
    o["text_top_terms_per_source"] = f"""
WITH c AS (
  SELECT source, token, count(*) AS freq
  FROM (SELECT source, unnest({_TOK}) AS token FROM documents)
  GROUP BY source, token
), r AS (
  SELECT source, token, freq,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY freq DESC, token ASC) AS INT) AS rank
  FROM c
)
SELECT source, token, freq, rank FROM r WHERE rank <= 5
ORDER BY source, rank
"""
    o["text_chunk_overlap"] = f"""
WITH t AS (
  SELECT doc_id, source, {_TOK} AS toks, len({_TOK}) AS n_tok FROM documents
), nz AS (
  SELECT *, CASE WHEN n_tok <= 64 THEN 1
                 ELSE (n_tok - 64 + 47) // 48 + 1 END AS n_chunks
  FROM t WHERE n_tok > 0
), x AS (
  SELECT doc_id, source, toks, unnest(range(0, n_chunks)) AS k FROM nz
)
SELECT doc_id, source,
       CAST(k AS INT) AS chunk_index,
       md5(doc_id || ':' || k) AS chunk_key,
       CAST(k * 48 + 1 AS INT) AS start_token,
       CAST(len(toks[k*48+1 : k*48+64]) AS INT) AS n_chunk_tokens,
       array_to_string(toks[k*48+1 : k*48+64], ' ') AS chunk_text
FROM x
"""
    o["text_zipf_fit"] = f"""
WITH freq AS (
  SELECT token, count(*) AS freq
  FROM (SELECT unnest({_TOK}) AS token FROM documents)
  GROUP BY token ORDER BY freq DESC, token ASC LIMIT 500
), pts AS (
  SELECT ln(CAST(row_number() OVER (ORDER BY freq DESC, token ASC)
               AS DOUBLE)) AS x,
         ln(CAST(freq AS DOUBLE)) AS y
  FROM freq
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_tokens_fit,
         covar_pop(x, y) AS sxy, var_pop(x) AS sxx, corr(x, y) AS r
  FROM pts
)
SELECT n_tokens_fit,
       round(CASE WHEN sxx = 0 THEN 0.0 ELSE sxy / sxx END, 6) AS zipf_slope,
       round(CASE WHEN r IS NULL THEN 0.0 ELSE r * r END, 6) AS r_squared
FROM m
"""
    o["text_doc_similarity"] = f"""
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM (SELECT doc_id, unnest({_TOK}) AS token FROM documents)
  GROUP BY doc_id, token
), dfreq AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
w AS (
  SELECT t.doc_id, t.token,
         t.tf * (ln((n.n_docs + 1) / (d.df + 1)) + 1) AS w
  FROM tf t JOIN dfreq d USING (token) CROSS JOIN n
  WHERE d.df >= 2 AND d.df <= 0.5 * n.n_docs
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY doc_id
), postings AS (
  SELECT w.doc_id, w.token, w.w / nrm.nrm AS wn
  FROM w JOIN nrm USING (doc_id)
), sims AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(sum(a.wn * b.wn), 6) AS sim
  FROM postings a JOIN postings b
    ON a.token = b.token AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
), ranked AS (
  SELECT doc_a, doc_b, sim,
         CAST(row_number() OVER (PARTITION BY doc_a
                                 ORDER BY sim DESC, doc_b ASC) AS INT) AS rank
  FROM sims
)
SELECT doc_a, doc_b, sim, rank FROM ranked WHERE rank <= 5
ORDER BY doc_a, rank
"""
    o["text_ngram_novelty"] = f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM documents)
  WHERE length(shingle) > 0
), first AS (
  SELECT shingle, min(doc_id) AS first_doc FROM pairs GROUP BY shingle
)
SELECT p.doc_id,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       round(sum(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)
             / count(*), 6) AS novelty
FROM pairs p JOIN first f USING (shingle)
GROUP BY p.doc_id ORDER BY p.doc_id
"""
    o["sim_embedding_norms"] = """
WITH n AS (
  SELECT label, sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm
  FROM embeddings
)
SELECT label,
       count(*) AS n_vectors,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm,
       CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_vectors
FROM n GROUP BY label ORDER BY label
"""

    # --- dedup ---
    o["dedup_exact_groups"] = """
SELECT md5(text) AS text_hash,
       min(doc_id) AS rep_doc_id,
       count(*) AS dup_count
FROM documents GROUP BY md5(text) ORDER BY rep_doc_id
"""
    o["dedup_rate_by_source"] = """
WITH sized AS (
  SELECT doc_id, source,
         count(*) OVER (PARTITION BY md5(text)) AS group_size,
         min(doc_id) OVER (PARTITION BY md5(text)) AS rep_doc_id
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_duplicated,
       CAST(sum(CASE WHEN doc_id <> rep_doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redundant,
       round(sum(CASE WHEN group_size > 1 THEN 1 ELSE 0 END) / count(*), 6)
         AS dup_rate
FROM sized GROUP BY source ORDER BY source
"""
    o["dedup_exact_survivors"] = """
SELECT * FROM documents
WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
ORDER BY doc_id
"""
    o["dedup_jaccard_pairs"] = f"""
WITH sh AS (SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.s, b.s))::DOUBLE
             / nullif(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 0), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
            / nullif(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 0), 6) >= 0.2
ORDER BY doc_a, doc_b
"""
    o["dedup_clusters"] = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
        / nullif(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 0), 6) >= 0.2
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, min(lab) AS cluster_id
FROM reach GROUP BY node ORDER BY doc_id
"""
    o["dedup_embedding_near"] = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
ORDER BY vec_a, vec_b
"""
    # dedup_minhash_lsh_pairs: the banding is not SQL-expressible, but the
    # VERIFIED output (exact shingle Jaccard on surviving candidates) is
    # deterministic and — at the fixture threshold/band layout — recall is
    # measurably 1.0 at sf0.001 AND sf0.01 (checked byte-equal to the exact
    # kernel), so the exact-Jaccard SQL is a sound oracle here.  If the
    # band layout or threshold changes, re-verify recall before keeping it.
    o["dedup_minhash_lsh_pairs"] = o["dedup_jaccard_pairs"]
    # dedup_simhash: the md5-based portable hash (operators/dedup.py simhash
    # hash_fn="md5") makes the fingerprint engine-reproducible — DuckDB
    # re-derives the identical 64-bit token hashes from md5 hex and replays
    # the per-bit majority vote.  Bit 63 packs as the sign term -(2^63),
    # mirroring the Spark long.
    o["dedup_simhash"] = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_TOK})) AS tok
  FROM documents
  WHERE len({_TOK}) > 0),
h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h
  FROM toks),
n AS (SELECT doc_id, count(*) AS n FROM h GROUP BY 1),
votes AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE 0 END) AS ones
  FROM h CROSS JOIN (SELECT unnest(range(64)) AS b)
  GROUP BY 1, 2),
majority AS (
  SELECT v.doc_id, v.b
  FROM votes v JOIN n USING (doc_id)
  WHERE 2 * v.ones > n.n)
SELECT n.doc_id,
       coalesce(sum(CASE WHEN m.b = 63 THEN -9223372036854775808
                         ELSE (1::BIGINT << m.b) END), 0)::BIGINT AS simhash
FROM n LEFT JOIN majority m USING (doc_id)
GROUP BY 1 ORDER BY doc_id
"""

    # --- corpus curation ---
    o["corpus_hash_split"] = """
SELECT doc_id, lang, source,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
            THEN 'test' ELSE 'train' END AS split
FROM documents ORDER BY doc_id
"""
    o["corpus_split_leakage"] = """
WITH tagged AS (
  SELECT doc_id, md5(text) AS text_hash,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
              THEN 'test' ELSE 'train' END AS split
  FROM documents
), marked AS (
  SELECT split,
         sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
           OVER (PARTITION BY text_hash) > 0 AS in_train
  FROM tagged
)
SELECT CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_test,
       CAST(sum(CASE WHEN split = 'test' AND in_train THEN 1 ELSE 0 END)
            AS BIGINT) AS n_leaked,
       round(sum(CASE WHEN split = 'test' AND in_train THEN 1 ELSE 0 END)
             / greatest(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END), 1),
             6) AS leak_rate
FROM marked
"""
    strat_cases = " ".join(
        f"WHEN '{lg}' THEN '{_strat_thr(fr)}'"
        for lg, fr in sorted(_STRAT_FRACS.items())
    )
    o["corpus_stratified_sample"] = f"""
SELECT doc_id, lang, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE lang {strat_cases} ELSE '0000' END
ORDER BY doc_id
"""
    o["corpus_source_cap"] = """
WITH ranked AS (
  SELECT doc_id, source,
         CAST(row_number() OVER (
           PARTITION BY source
           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id
         ) AS INTEGER) AS sample_rank
  FROM documents)
SELECT doc_id, source, sample_rank FROM ranked
WHERE sample_rank <= 10 ORDER BY source, doc_id
"""
    o["corpus_pack_chunks"] = f"""
WITH per_doc AS (
  SELECT doc_id, source, len({_TOK}) AS n_tok
  FROM documents),
chunked AS (
  SELECT *,
    CAST(floor(coalesce(sum(n_tok) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 256.0)
    AS INTEGER) AS chunk_id
  FROM per_doc)
SELECT source, chunk_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS chunk_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM chunked GROUP BY source, chunk_id ORDER BY source, chunk_id
"""
    o["corpus_quality_filter"] = f"""
WITH m AS (
  SELECT doc_id,
    CAST(len({_TOK}) AS INTEGER) AS n_tokens,
    round(length(regexp_replace(text, '\\s+', '', 'g'))
          / greatest(len({_TOK}), 1), 6) AS mean_word_len,
    round(1 - len(list_distinct({_TOK}))
          / greatest(len({_TOK}), 1), 6) AS dup_token_ratio
  FROM documents)
SELECT doc_id, n_tokens, mean_word_len, dup_token_ratio,
  CAST(n_tokens BETWEEN 24 AND 10000 AS INTEGER) AS len_ok,
  CAST(mean_word_len BETWEEN 3.0 AND 8.0 AS INTEGER) AS mwl_ok,
  CAST(dup_token_ratio <= 0.6 AS INTEGER) AS rep_ok,
  CAST(n_tokens BETWEEN 24 AND 10000
       AND mean_word_len BETWEEN 3.0 AND 8.0
       AND dup_token_ratio <= 0.6 AS INTEGER) AS keep
FROM m ORDER BY doc_id
"""
    o["corpus_mixture_weights"] = """
WITH counts AS (
  SELECT lang, count(*) AS doc_count FROM documents GROUP BY lang),
totals AS (
  SELECT CAST(sum(doc_count) AS BIGINT) AS total_docs,
         count(*) AS n_groups FROM counts)
SELECT lang, doc_count,
       round(doc_count / total_docs, 6) AS share,
       round(total_docs / (n_groups * doc_count), 6) AS weight
FROM counts, totals ORDER BY lang
"""
    o["corpus_contamination"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents),
grams AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 6),
         i -> array_to_string(t[i:i+7], ' '))) AS gs
  FROM toks),
corpus_side AS (
  SELECT doc_id, unnest(gs) AS gram FROM grams WHERE doc_id % 7 <> 0),
bench AS (
  SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % 7 = 0)
SELECT c.doc_id, count(*) AS matched_grams
FROM corpus_side c JOIN bench b USING (gram)
GROUP BY c.doc_id ORDER BY c.doc_id
"""
    o["semdedup_survivors"] = """
WITH RECURSIVE e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4),
edges AS (
  SELECT va AS a, vb AS b FROM pairs
  UNION
  SELECT vb AS a, va AS b FROM pairs),
reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT ed.b, r.lab FROM reach r JOIN edges ed ON ed.a = r.node),
clusters AS (
  SELECT node AS vec_id, min(lab) AS cluster_id FROM reach GROUP BY node)
SELECT em.vec_id,
       coalesce(c.cluster_id, em.vec_id) AS cluster_id,
       CAST(coalesce(c.cluster_id, em.vec_id) = em.vec_id AS INTEGER)
         AS is_survivor
FROM embeddings em LEFT JOIN clusters c ON c.vec_id = em.vec_id
ORDER BY em.vec_id
"""

    # --- similarity ---
    ids = ", ".join(str(i) for i in _SIM_QUERY_IDS)
    o["sim_cosine_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id != q.query_id
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""
    # sim_lsh_topk: approximate (recall < 1), rows-only check.
    # sim_matryoshka_topk: approximate but DETERMINISTIC (rounded scores,
    # vec_id tiebreaks), so both stages replay exactly in SQL.
    o["sim_matryoshka_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id IN ({ids})),
coarse AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(q.qv[1:32],
                                      (e.embedding::DOUBLE[])[1:32]), 6)
           AS coarse_cosine
  FROM q JOIN embeddings e ON e.vec_id != q.query_id),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY coarse_cosine DESC, vec_id ASC)
              AS crank
    FROM coarse) WHERE crank <= 100),
rerank AS (
  SELECT s.query_id, s.vec_id,
         round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6)
           AS cosine
  FROM short s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN q ON q.query_id = s.query_id)
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC)
                 AS INTEGER) AS rank
  FROM rerank) WHERE rank <= 10
ORDER BY query_id, rank
"""
    o["sim_centroid_drift"] = """
WITH per_pos AS (
  SELECT label, p,
         avg(CASE WHEN vec_id % 2 = 0 THEN embedding[p]::DOUBLE END) AS ma,
         avg(CASE WHEN vec_id % 2 = 1 THEN embedding[p]::DOUBLE END) AS mb
  FROM embeddings, range(1, 65) t(p)
  GROUP BY label, p
), agg AS (
  SELECT label,
         sum(ma * mb) AS dot,
         sqrt(sum(ma * ma)) AS na,
         sqrt(sum(mb * mb)) AS nb,
         sqrt(sum((ma - mb) * (ma - mb))) AS l2
  FROM per_pos GROUP BY label
)
SELECT label,
       round(CASE WHEN na * nb = 0 THEN 0.0 ELSE dot / (na * nb) END, 6)
         AS centroid_cosine,
       round(l2, 6) AS centroid_l2_shift
FROM agg ORDER BY label
"""
    o["sim_label_centroids"] = """
SELECT label, CAST(p - 1 AS INTEGER) AS pos, round(avg(embedding[p]::DOUBLE), 6) AS m
FROM embeddings, range(1, 65) t(p)
GROUP BY label, p ORDER BY label, pos
"""
    o["sim_filtered_topk"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, e.vec_id, e.label,
         round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id != q.query_id
  WHERE e.label IN (0, 1, 2)
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY cosine DESC, vec_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT query_id, vec_id, label, cosine, rank FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""
    o["sim_centroid_pairs"] = """
WITH pos AS (
  SELECT label, p, round(avg(embedding[p]::DOUBLE), 6) AS m
  FROM embeddings, range(1, 65) t(p)
  GROUP BY label, p
),
cent AS (SELECT label, list(m ORDER BY p) AS c FROM pos GROUP BY label)
SELECT a.label AS label_a, b.label AS label_b,
       round(list_cosine_similarity(a.c, b.c), 6) AS cosine
FROM cent a JOIN cent b ON a.label < b.label
ORDER BY label_a, label_b
"""

    # --- text normalization + downstream dedup tiers ---
    norm_expr = (
        r"trim(regexp_replace(regexp_replace(lower(text),"
        r" '[!-/:-@\[-`{-~]', '', 'g'), '\s+', ' ', 'g'))"
    )
    o["text_normalize"] = f"""
WITH n AS (SELECT doc_id, lang, source, {norm_expr} AS norm_text FROM documents)
SELECT doc_id, lang, source, norm_text, length(norm_text) AS norm_chars
FROM n
"""
    o["text_rare_tokens"] = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
freq AS (SELECT token, count(*) AS tf FROM tok GROUP BY token),
j AS (SELECT doc_id, tf FROM tok JOIN freq USING (token))
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       round(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio,
       CAST(min(tf) AS BIGINT) AS min_tf,
       CAST(max(tf) AS BIGINT) AS max_tf
FROM j GROUP BY doc_id ORDER BY doc_id
"""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?\d[\d\- ]{7,}\d"
    o["text_scrub_pii"] = f"""
WITH s AS (
  SELECT doc_id, source, text,
         len(regexp_extract_all(text, '{email_re}')) AS n_emails,
         regexp_replace(text, '{email_re}', '<EMAIL>', 'g') AS t1
  FROM documents)
SELECT doc_id, source,
       CAST(n_emails AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t1, '{phone_re}')) AS INTEGER) AS n_phones,
       regexp_replace(t1, '{phone_re}', '<PHONE>', 'g') AS scrubbed_text,
       CAST(regexp_replace(t1, '{phone_re}', '<PHONE>', 'g') <> text
            AS INTEGER) AS changed
FROM s
"""
    o["dedup_normalized_groups"] = f"""
WITH n AS (SELECT doc_id, {norm_expr} AS norm_text FROM documents)
SELECT md5(norm_text) AS norm_hash,
       min(doc_id) AS rep_doc_id,
       count(*) AS dup_count
FROM n GROUP BY md5(norm_text) ORDER BY rep_doc_id
"""
    o["dedup_levenshtein_pairs"] = """
WITH b AS (
  SELECT doc_id, text, n_chars,
         unnest([CAST(floor(n_chars / 64.0) AS BIGINT),
                 CAST(floor(n_chars / 64.0) AS BIGINT) + 1]) AS bucket
  FROM documents)
SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
       CAST(levenshtein(a.text, c.text) AS INTEGER) AS edit_distance
FROM b a JOIN b c USING (bucket)
WHERE a.doc_id < c.doc_id
  AND abs(a.n_chars - c.n_chars) <= 10
  AND levenshtein(a.text, c.text) <= 10
ORDER BY doc_a, doc_b
"""

    # --- event profiling ---
    o["events_value_histogram"] = """
SELECT event_type,
       CAST(floor(value / 10.0) AS BIGINT) AS bin,
       round(CAST(floor(value / 10.0) AS BIGINT) * 10.0, 2) AS bin_lo,
       count(*) AS n
FROM events WHERE value IS NOT NULL
GROUP BY 1, 2 ORDER BY event_type, bin
"""
    o["events_user_bursts"] = """
WITH ev AS (
  -- floor, not cast: DuckDB double->BIGINT casts ROUND sub-second
  -- epochs while Spark's cast(long) truncates
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch FROM events),
counted AS (
  SELECT user_id, epoch,
         count(*) OVER (PARTITION BY user_id ORDER BY epoch
                        RANGE BETWEEN 299 PRECEDING AND CURRENT ROW)
           AS in_window
  FROM ev),
per_user AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(in_window) AS BIGINT) AS peak_window,
         max(epoch) - min(epoch) AS span_s
  FROM counted GROUP BY 1)
SELECT user_id, n_events, peak_window,
       floor(n_events * 300.0 / greatest(span_s, 300) * 10000 + 0.5) / 10000
         AS expected_per_window,
       floor(peak_window
             / (n_events * 300.0 / greatest(span_s, 300)) * 10000 + 0.5)
         / 10000 AS burst_ratio
FROM per_user WHERE n_events >= 10
ORDER BY user_id
"""
    o["events_key_skew_profile"] = """
WITH k AS (
  SELECT event_type, user_id, CAST(count(*) AS DOUBLE) AS c
  FROM events WHERE user_id IS NOT NULL
  GROUP BY 1, 2)
SELECT event_type,
       count(*) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_count,
       round(max(c) / sum(c), 4) AS top1_share,
       round(quantile_cont(c, 0.5), 4) AS p50_count,
       round(quantile_cont(c, 0.99), 4) AS p99_count,
       round(CASE WHEN count(*) = 1 THEN 0.0
             ELSE (log2(sum(c)) - sum(c * log2(c)) / sum(c))
                  / log2(count(*)) END, 4) AS evenness
FROM k GROUP BY event_type ORDER BY event_type
"""
    o["events_daily_anomaly_mad"] = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
med AS (
  SELECT event_type, quantile_cont(n, 0.5) AS med FROM daily GROUP BY 1),
adev AS (
  SELECT day, d.event_type, n, med, abs(n - med) AS adev
  FROM daily d JOIN med USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM adev GROUP BY 1)
SELECT day, a.event_type, CAST(n AS BIGINT) AS n,
       round(med, 1) AS median_n,
       round(mad, 1) AS mad,
       round(CASE WHEN mad > 0
                  THEN 0.6745 * (n - med) / mad ELSE 0.0 END, 4)
         AS modified_z,
       CAST(abs(CASE WHEN mad > 0
                     THEN 0.6745 * (n - med) / mad ELSE 0.0 END) > 3.5
            AS INTEGER) AS is_anomaly
FROM adev a JOIN mad USING (event_type)
ORDER BY day, a.event_type
"""
    o["events_daily_anomaly"] = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2),
w AS (
  SELECT day, event_type, n,
         count(n) OVER win AS cnt_w,
         CAST(sum(n) OVER win AS BIGINT) AS sum_w,
         CAST(sum(n * n) OVER win AS BIGINT) AS sumsq_w
  FROM daily
  WINDOW win AS (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
SELECT day, event_type, n,
       cnt_w AS n_trailing,
       round(CASE WHEN cnt_w >= 1
                  THEN sum_w / CAST(cnt_w AS DOUBLE) END, 4) AS trailing_mean,
       round(CASE WHEN cnt_w >= 2
                   AND (sumsq_w - sum_w * sum_w / CAST(cnt_w AS DOUBLE))
                       / (cnt_w - 1) > 0
                  THEN (n - sum_w / CAST(cnt_w AS DOUBLE))
                       / sqrt((sumsq_w - sum_w * sum_w / CAST(cnt_w AS DOUBLE))
                              / (cnt_w - 1)) END, 4) AS zscore
FROM w ORDER BY day, event_type
"""

    # --- RFM segmentation ---
    o["orders_rfm"] = """
WITH per_cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
                        DATE '2001-01-01') AS INTEGER) AS recency_days,
         count(*) AS frequency,
         round(sum(o_totalprice), 2) AS monetary
  FROM orders GROUP BY o_custkey),
quart AS (
  SELECT o_custkey, recency_days, frequency, monetary,
         CAST(ntile(4) OVER (ORDER BY recency_days ASC, o_custkey ASC)
              AS INTEGER) AS r_quartile,
         CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey ASC)
              AS INTEGER) AS f_quartile,
         CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey ASC)
              AS INTEGER) AS m_quartile
  FROM per_cust)
SELECT *, concat(r_quartile, f_quartile, m_quartile) AS rfm
FROM quart ORDER BY o_custkey
"""

    # --- corpus profiling + the end-to-end curation funnel ---
    o["corpus_length_histogram"] = f"""
WITH t AS (SELECT len({_TOK}) AS nt FROM documents)
SELECT CAST(floor(nt / 16.0) AS BIGINT) AS bin,
       CAST(floor(nt / 16.0) AS BIGINT) * 16 AS bin_lo,
       count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens
FROM t GROUP BY 1, 2 ORDER BY bin
"""
    o["corpus_curation_summary"] = f"""
WITH m AS (
  SELECT doc_id, text,
    CAST(len({_TOK}) AS INTEGER) AS n_tokens,
    round(length(regexp_replace(text, '\\s+', '', 'g'))
          / greatest(len({_TOK}), 1), 6) AS mwl,
    round(1 - len(list_distinct({_TOK}))
          / greatest(len({_TOK}), 1), 6) AS dtr
  FROM documents),
q AS (SELECT doc_id, text FROM m
      WHERE n_tokens BETWEEN 24 AND 10000
        AND mwl BETWEEN 3.0 AND 8.0 AND dtr <= 0.6),
surv AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
split AS (
  SELECT doc_id,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
              THEN 'test' ELSE 'train' END AS split
  FROM surv)
SELECT 1 AS stage_id, 'raw' AS stage, count(*) AS n_docs FROM documents
UNION ALL SELECT 2, 'quality', count(*) FROM q
UNION ALL SELECT 3, 'dedup', count(*) FROM surv
UNION ALL SELECT 4, 'train', count(*) FROM split WHERE split = 'train'
UNION ALL SELECT 5, 'test', count(*) FROM split WHERE split = 'test'
ORDER BY stage_id
"""

    # --- round-3 additions ---
    o["sim_knn_label"] = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, e.vec_id, e.label,
         round(list_cosine_similarity(q.qv, e.embedding::DOUBLE[]), 6) AS cosine
  FROM q JOIN embeddings e ON e.vec_id != q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id ASC) AS rnk
  FROM scored
),
votes AS (
  SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
  FROM ranked WHERE rnk <= 10 GROUP BY 1, 2
),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, label ASC) AS r
  FROM votes
)
SELECT query_id, label AS pred_label, votes FROM pick WHERE r = 1
ORDER BY query_id
"""
    o["events_type_transitions"] = """
WITH steps AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
edges AS (
  SELECT prev_type AS from_type, event_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT), 6)
         AS share
FROM edges
ORDER BY from_type, to_type
"""
    o["orders_seasonality"] = """
WITH series AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1),
t AS (
  SELECT month, revenue,
         CASE WHEN count(revenue) OVER w = 13
              THEN floor((sum(revenue) OVER w
                          - (first_value(revenue) OVER w
                             + last_value(revenue) OVER w) / 2) / 12
                         * 100 + 0.5) / 100
         END AS trend,
         substr(month, 6, 2) AS moy
  FROM series
  WINDOW w AS (ORDER BY month ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)),
idx AS (
  SELECT moy, avg(revenue / trend) AS seasonal_idx
  FROM t WHERE trend IS NOT NULL GROUP BY 1)
SELECT month, revenue, trend,
       floor(seasonal_idx * 1000000 + 0.5) / 1000000 AS seasonal_idx,
       floor(floor(revenue * 100 + 0.5) * 1000000
             / floor(seasonal_idx * 1000000 + 0.5) + 0.5) / 100
         AS deseasonalized
FROM t JOIN idx USING (moy)
ORDER BY month
"""
    o["orders_cohort_ltv"] = """
WITH first AS (
  SELECT o_custkey, min(strftime(o_orderdate, '%Y-%m')) AS cohort_month
  FROM orders GROUP BY 1),
pcm AS (
  SELECT o_custkey, strftime(o_orderdate, '%Y-%m') AS month,
         sum(o_totalprice) AS rev
  FROM orders GROUP BY 1, 2),
tri AS (
  SELECT cohort_month,
         CAST(12 * (CAST(substr(month, 1, 4) AS INTEGER)
                    - CAST(substr(cohort_month, 1, 4) AS INTEGER))
              + (CAST(substr(month, 6, 2) AS INTEGER)
                 - CAST(substr(cohort_month, 6, 2) AS INTEGER))
              AS INTEGER) AS month_offset,
         CAST(count(*) AS BIGINT) AS buyers,
         round(sum(rev), 2) AS revenue
  FROM pcm JOIN first USING (o_custkey)
  GROUP BY 1, 2)
SELECT cohort_month, month_offset, buyers, revenue,
       round(sum(revenue) OVER (PARTITION BY cohort_month
                                ORDER BY month_offset
                                ROWS UNBOUNDED PRECEDING), 2)
         AS cum_revenue
FROM tri ORDER BY cohort_month, month_offset
"""
    o["basket_rules"] = """
WITH baskets AS (
  SELECT l_orderkey, count(DISTINCT l_partkey) AS nparts
  FROM lineitem GROUP BY 1 HAVING count(DISTINCT l_partkey) >= 2),
i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_orderkey IN (SELECT l_orderkey FROM baskets)),
pair AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_orders
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
item AS (SELECT l_partkey AS part, count(*) AS item_orders FROM i GROUP BY 1),
nb AS (SELECT count(*) AS n_baskets FROM baskets),
rules AS (
  SELECT part_a AS antecedent, part_b AS consequent, n_orders FROM pair
  UNION ALL
  SELECT part_b, part_a, n_orders FROM pair)
SELECT antecedent, consequent,
       CAST(n_orders AS BIGINT) AS support,
       round(n_orders / ia.item_orders, 6) AS confidence,
       round((n_orders / ia.item_orders)
             / (ic.item_orders / CAST(n_baskets AS DOUBLE)), 6) AS lift
FROM rules
JOIN item ia ON ia.part = antecedent
JOIN item ic ON ic.part = consequent
CROSS JOIN nb
ORDER BY lift DESC, support DESC, antecedent, consequent
LIMIT 100
"""
    o["basket_part_pairs"] = """
WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
FROM p GROUP BY 1, 2 HAVING count(*) >= 2
ORDER BY n_orders DESC, part_a, part_b
"""
    o["text_repetition_profile"] = f"""
WITH toks AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
uni_c AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
uni AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(c) AS BIGINT) AS top_c
  FROM uni_c GROUP BY 1
),
bis AS (SELECT doc_id, unnest({_BIGRAMS}) AS term FROM documents),
bi_c AS (SELECT doc_id, term, count(*) AS c FROM bis GROUP BY 1, 2),
bi AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         CAST(max(c) AS BIGINT) AS top_bi_c
  FROM bi_c GROUP BY 1
)
SELECT u.doc_id, u.n_tokens, u.n_distinct,
       round(1 - u.n_distinct / u.n_tokens, 6) AS dup_token_ratio,
       round(u.top_c / u.n_tokens, 6) AS top_token_share,
       round(b.top_bi_c / b.n_bigrams, 6) AS top_bigram_share
FROM uni u JOIN bi b USING (doc_id)
ORDER BY u.doc_id
"""
    o["text_unigram_logprob"] = f"""
WITH toks AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
freq AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(avg(-log2(f.cnt / tt.total)), 6) AS bits_per_token
FROM toks t JOIN freq f USING (term) CROSS JOIN tot tt
GROUP BY t.doc_id
ORDER BY t.doc_id
"""
    o["text_source_fair_quality"] = """
WITH toks AS (SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\\s+') END) AS term FROM documents),
freq AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM freq),
scored AS (
  SELECT t.doc_id, round(avg(-log2(f.cnt / tt.total)), 6) AS bits_per_token
  FROM toks t JOIN freq f USING (term) CROSS JOIN tot tt
  GROUP BY t.doc_id)
SELECT s.doc_id, d.source, s.bits_per_token,
       round(percent_rank() OVER (PARTITION BY d.source
                                  ORDER BY s.bits_per_token, s.doc_id), 6)
         AS source_pct
FROM scored s JOIN documents d USING (doc_id)
ORDER BY s.doc_id
"""
    o["events_hour_uniformity"] = """
WITH hourly AS (
  SELECT event_type, extract(hour FROM ts) AS h, count(*) AS n
  FROM events GROUP BY event_type, h
), e AS (
  SELECT event_type, h, n,
         sum(n) OVER (PARTITION BY event_type) AS total,
         sum(n) OVER (PARTITION BY event_type) / 24.0 AS exp
  FROM hourly
)
SELECT event_type,
       CAST(max(total) AS BIGINT) AS n_events,
       count(*) AS hours_active,
       round(sum((n - exp) * (n - exp) / exp)
             + (24 - count(*)) * max(exp), 4) AS chi_square,
       CAST((list(h ORDER BY n DESC, h ASC))[1] AS INTEGER) AS peak_hour
FROM e GROUP BY event_type ORDER BY event_type
"""
    _MK_STEP = """
  SELECT n.node, coalesce(sum(r.rank * t.p), 0.0) AS rank
  FROM nodes n
  LEFT JOIN trans t ON t.dst = n.node
  LEFT JOIN {prev} r ON r.node = t.src
  GROUP BY n.node
"""
    o["events_markov_steady"] = f"""
WITH steps AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
edges AS (
  SELECT prev_type AS src, event_type AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION SELECT DISTINCT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
trans AS (
  SELECT e.src, e.dst, e.w / o.out_w AS p
  FROM edges e JOIN outw o ON e.src = o.src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
r1 AS ({_MK_STEP.format(prev="r0")}),
r2 AS ({_MK_STEP.format(prev="r1")}),
r3 AS ({_MK_STEP.format(prev="r2")}),
r4 AS ({_MK_STEP.format(prev="r3")}),
r5 AS ({_MK_STEP.format(prev="r4")}),
r6 AS ({_MK_STEP.format(prev="r5")})
SELECT node AS event_type,
       round(rank / sum(rank) OVER (), 9) AS pi
FROM r6 ORDER BY event_type
"""
    o["events_gap_distribution"] = """
WITH g AS (
  SELECT event_type,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                   ts) / 1000000.0 AS gap_s
  FROM events
)
SELECT event_type,
       count(*) AS n_gaps,
       round(avg(gap_s), 4) AS avg_gap_s,
       round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
       round(quantile_cont(gap_s, 0.9), 4) AS p90_gap_s,
       round(max(gap_s), 4) AS max_gap_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""
    o["events_stickiness_28d"] = """
WITH pairs AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
  FROM events
), contrib AS (
  SELECT day + (k * INTERVAL 1 DAY) AS day, user_id
  FROM pairs CROSS JOIN unnest(range(0, 28)) AS t(k)
), mau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
  FROM contrib GROUP BY day
), dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM pairs GROUP BY day
)
SELECT day, dau, mau,
       round(CAST(dau AS DOUBLE) / mau, 6) AS stickiness
FROM dau JOIN mau USING (day)
ORDER BY day
"""
    o["part_supplier_hhi"] = """
WITH per_supp AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
), shared AS (
  SELECT l_partkey, qty,
         sum(qty) OVER (PARTITION BY l_partkey) AS total
  FROM per_supp
)
SELECT l_partkey,
       count(*) AS n_suppliers,
       round(list_sum(list_sort(list((qty / total) * (qty / total)))), 6)
         AS hhi
FROM shared GROUP BY l_partkey ORDER BY l_partkey
"""
    o["orders_priority_anova"] = """
WITH g AS (
  SELECT o_orderpriority,
         count(*) AS n,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                  * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS ss
  FROM orders GROUP BY o_orderpriority
), t AS (
  SELECT n,
         CAST(CAST(s AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(ss AS VARCHAR) AS DOUBLE) AS ss,
         CAST(CAST(s AS VARCHAR) AS DOUBLE)
           * CAST(CAST(s AS VARCHAR) AS DOUBLE) / n AS s2n
  FROM g
), agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups,
         CAST(sum(n) AS BIGINT) AS n_rows,
         list_sum(list_sort(list(s))) AS S,
         list_sum(list_sort(list(ss))) AS SS,
         list_sum(list_sort(list(s2n))) AS S2N
  FROM t
), d AS (
  SELECT n_groups, n_rows,
         S2N - S * S / n_rows AS ssb,
         SS - S2N AS ssw
  FROM agg
)
SELECT n_groups, n_rows,
       round(ssb, 2) AS ss_between,
       round(ssw, 2) AS ss_within,
       round((ssb / (n_groups - 1)) / (ssw / (n_rows - n_groups)), 6)
         AS f_stat,
       round(ssb / (ssb + ssw), 6) AS eta_sq
FROM d
"""
    o["orders_grouping_sets"] = """
WITH o AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         o_orderpriority AS priority, o_totalprice
  FROM orders
)
SELECT CAST(grouping(o_year) AS INT) AS g_year,
       CAST(grouping(priority) AS INT) AS g_priority,
       o_year, priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM o
GROUP BY GROUPING SETS ((o_year, priority), (o_year), (priority), ())
ORDER BY g_year, g_priority, o_year NULLS FIRST, priority NULLS FIRST
"""
    o["corpus_weighted_sample"] = """
WITH s AS (
  SELECT doc_id, lang, source, n_chars AS weight,
         round(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT
                    + 1.0) / 4503599627370497.0) / n_chars, 9) AS sample_key
  FROM documents
)
SELECT * FROM s ORDER BY sample_key, doc_id LIMIT 50
"""
    o["customer_spend_deciles"] = """
WITH spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
  FROM orders GROUP BY 1
),
per_cust AS (
  SELECT c.c_custkey, coalesce(s.spend, 0.0) AS spend
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
),
dec AS (
  SELECT spend,
         CAST(ntile(10) OVER (ORDER BY spend DESC, c_custkey ASC) AS INT)
           AS decile
  FROM per_cust
)
SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
       round(sum(spend), 2) AS total_spend,
       round(max(spend), 2) AS max_spend,
       round(min(spend), 2) AS min_spend
FROM dec GROUP BY 1 ORDER BY decile
"""
    o["events_hour_unpivot"] = """
WITH grid AS (
  SELECT et.event_type, t.h
  FROM (SELECT DISTINCT event_type FROM events) et, range(0, 8) t(h)
),
c AS (
  SELECT event_type, hour(ts) AS h, CAST(count(*) AS BIGINT) AS n
  FROM events WHERE hour(ts) < 8 GROUP BY 1, 2
)
SELECT g.event_type, CAST(g.h AS INT) AS hour, coalesce(c.n, 0) AS n
FROM grid g LEFT JOIN c ON g.event_type = c.event_type AND g.h = c.h
ORDER BY g.event_type, g.h
"""

    # --- CDC merge, graph rank, cross-doc boilerplate ---
    o["events_cdc_merge"] = """
WITH ranked AS (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type,
       event_id AS last_event_id, ts AS last_ts,
       round(value, 3) AS last_value
FROM ranked WHERE rn = 1
ORDER BY user_id, event_type
"""
    # 3 unrolled power iterations, same uniform start / damping as the
    # Spark kernel (graph.pagerank); edge weights = basket co-occurrence.
    _PR_STEP = """
  SELECT n.node,
         (1 - 0.85) / nn.n + 0.85 * coalesce(sum(r.rank * t.p), 0.0) AS rank
  FROM nodes n CROSS JOIN nn
  LEFT JOIN trans t ON t.dst = n.node
  LEFT JOIN {prev} r ON r.node = t.src
  GROUP BY n.node, nn.n
"""
    o["part_pagerank"] = f"""
WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         count(*) AS n_orders
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
edges AS (
  SELECT part_a AS src, part_b AS dst, CAST(n_orders AS DOUBLE) AS w FROM pr
  UNION ALL
  SELECT part_b, part_a, CAST(n_orders AS DOUBLE) FROM pr),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src),
trans AS (
  SELECT e.src, e.dst, e.w / o.out_w AS p
  FROM edges e JOIN outw o ON e.src = o.src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
r1 AS ({_PR_STEP.format(prev="r0")}),
r2 AS ({_PR_STEP.format(prev="r1")}),
r3 AS ({_PR_STEP.format(prev="r2")})
SELECT node AS part, round(rank, 9) AS rank FROM r3 ORDER BY part
"""
    o["orders_backlog_timeline"] = """
WITH span AS (
  SELECT l.l_orderkey,
         CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) AS od,
         CAST(date_trunc('day', max(l.l_shipdate)) AS TIMESTAMP) AS ld
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, o.o_orderdate),
d AS (
  SELECT day, CAST(sum(opened) AS BIGINT) AS n_opened,
         CAST(sum(closed) AS BIGINT) AS n_closed
  FROM (SELECT od AS day, 1 AS opened, 0 AS closed FROM span
        UNION ALL
        SELECT ld, 0, 1 FROM span)
  GROUP BY day)
SELECT day, n_opened, n_closed,
       CAST(sum(n_opened - n_closed) OVER (ORDER BY day) AS BIGINT) AS backlog
FROM d ORDER BY day
"""
    o["part_triangle_census"] = """
WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
deg AS (
  SELECT node, count(*) AS degree
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
  GROUP BY node),
w AS (SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM e) AS n_edges,
       w.n_wedges,
       tri.n_triangles,
       round(CASE WHEN w.n_wedges = 0 THEN 0.0
                  ELSE 3.0 * tri.n_triangles / w.n_wedges END,
             6) AS clustering_coefficient
FROM w, tri
"""
    o["corpus_boilerplate_profile"] = f"""
WITH toks AS (SELECT doc_id, {_TOK} AS t FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(t) - 1),
         i -> array_to_string(t[i:i+2], ' ')))) AS gram
  FROM toks),
freq AS (SELECT gram, count(*) AS doc_count FROM grams GROUP BY gram),
per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         count(*) FILTER (WHERE f.doc_count >= 3) AS n_boilerplate
  FROM grams g JOIN freq f USING (gram) GROUP BY g.doc_id)
SELECT d.doc_id,
       CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(p.n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
       round(CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
                  ELSE coalesce(p.n_boilerplate, 0) / p.n_grams END,
             6) AS boilerplate_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""
    o["corpus_source_divergence"] = f"""
WITH tok AS (SELECT source, unnest({_TOK}) AS token FROM documents),
st AS (SELECT source, token, count(*) AS c FROM tok GROUP BY 1, 2),
marg AS (SELECT token, sum(c) AS ct FROM st GROUP BY 1),
tot_src AS (SELECT source, sum(c) AS n_src FROM st GROUP BY 1),
tot AS (SELECT sum(c) AS n_tot FROM st)
SELECT st.source,
       CAST(max(ts.n_src) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(sum((st.c / ts.n_src)
                 * ln((st.c / ts.n_src) / (m.ct / t.n_tot))), 6)
         AS kl_vs_corpus
FROM st
JOIN marg m USING (token)
JOIN tot_src ts USING (source)
CROSS JOIN tot t
GROUP BY st.source
ORDER BY st.source
"""
    o["events_value_percentiles"] = """
SELECT event_type,
       CAST(count(value) AS BIGINT) AS n_values,
       round(quantile_cont(value, 0.25), 6) AS p25,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.75), 6) AS p75
FROM events
GROUP BY event_type
ORDER BY event_type
"""
    o["events_scd2_history"] = """
SELECT user_id, event_type, event_id,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current,
       round(value, 3) AS value
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
ORDER BY user_id, event_type, valid_from, event_id
"""
    # column-profile side of the drift report (mirrors quality.column_profile)
    def _prof_side(pred: str) -> str:
        blocks = []
        for col, numeric in (("event_type", False), ("user_id", True), ("value", True)):
            mn = (
                f"round(CAST(min({col}) AS DOUBLE), 6)"
                if numeric
                else "CAST(NULL AS DOUBLE)"
            )
            mx = (
                f"round(CAST(max({col}) AS DOUBLE), 6)"
                if numeric
                else "CAST(NULL AS DOUBLE)"
            )
            blocks.append(f"""
  SELECT '{col}' AS col_name, count(*) AS n_rows,
         CAST(coalesce(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_null,
         CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
         {mn} AS min_value, {mx} AS max_value
  FROM events WHERE {pred}""")
        return " UNION ALL ".join(blocks)

    o["events_profile_drift"] = f"""
WITH b AS ({_prof_side("ts < TIMESTAMP '2024-01-16 00:00:00'")}),
a AS ({_prof_side("ts >= TIMESTAMP '2024-01-16 00:00:00'")}),
bb AS (SELECT col_name, n_rows AS n_rows_before,
              round(n_null / greatest(n_rows, 1), 6) AS null_rate_before,
              n_distinct AS n_distinct_before,
              min_value AS min_before, max_value AS max_before FROM b),
aa AS (SELECT col_name, n_rows AS n_rows_after,
              round(n_null / greatest(n_rows, 1), 6) AS null_rate_after,
              n_distinct AS n_distinct_after,
              min_value AS min_after, max_value AS max_after FROM a)
SELECT col_name, n_rows_before, n_rows_after,
       null_rate_before, null_rate_after,
       round(null_rate_after - null_rate_before, 6) AS null_rate_delta,
       n_distinct_before, n_distinct_after,
       round(n_distinct_after / greatest(n_distinct_before, 1), 6)
         AS distinct_ratio,
       min_before, min_after, max_before, max_after,
       CAST(CASE WHEN abs(round(null_rate_after - null_rate_before, 6)) > 0.05
                   OR (n_distinct_before <> n_distinct_after
                       AND (round(n_distinct_after / greatest(n_distinct_before, 1), 6) > 2.0
                            OR round(n_distinct_after / greatest(n_distinct_before, 1), 6) < 0.5))
             THEN 1 ELSE 0 END AS INT) AS drifted
FROM bb JOIN aa USING (col_name) ORDER BY col_name
"""
    o["dq_functional_deps"] = """
WITH checks AS (
  SELECT 'fd:o_orderkey->o_custkey' AS "check",
         count(*) AS n_checked,
         count(*) FILTER (WHERE n_dep > 1) AS n_violations
  FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS n_dep
        FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1)
  UNION ALL
  SELECT 'fd:l_orderkey->o_orderdate', count(*),
         count(*) FILTER (WHERE n_dep > 1)
  FROM (SELECT l_orderkey, count(DISTINCT o_orderdate) AS n_dep
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_orderkey IS NOT NULL GROUP BY 1)
  UNION ALL
  SELECT 'fd:source->lang', count(*),
         count(*) FILTER (WHERE n_dep > 1)
  FROM (SELECT source, count(DISTINCT lang) AS n_dep
        FROM documents WHERE source IS NOT NULL GROUP BY 1)
)
SELECT "check", CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM checks ORDER BY "check"
"""
    o["dq_audit"] = """
WITH checks AS (
  SELECT 'unique:event_id' AS check,
         count(*) AS n_checked,
         count(*) - count(DISTINCT event_id) AS n_violations
  FROM events
  UNION ALL
  SELECT 'not_null:value', count(*), count(*) - count(value) FROM events
  UNION ALL
  SELECT 'range:value', count(*),
         count(*) FILTER (WHERE value < 0.0 OR value > 100.0) FROM events
  UNION ALL
  SELECT 'accepted:event_type', count(*),
         count(*) FILTER (WHERE event_type IS NOT NULL AND event_type NOT IN
                          ('click', 'error', 'purchase', 'signup', 'view'))
  FROM events
  UNION ALL
  SELECT 'fk:o_custkey->c_custkey', count(*),
         count(*) FILTER (WHERE o_custkey IS NOT NULL AND NOT EXISTS
                          (SELECT 1 FROM customer c WHERE c.c_custkey = o_custkey))
  FROM orders
  UNION ALL
  SELECT 'fk:l_orderkey->o_orderkey', count(*),
         count(*) FILTER (WHERE l_orderkey IS NOT NULL AND NOT EXISTS
                          (SELECT 1 FROM orders o WHERE o.o_orderkey = l_orderkey))
  FROM lineitem
)
SELECT "check", CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS passed
FROM checks ORDER BY "check"
"""
    o["asof_error_last_click_30m"] = """
SELECT e.event_id, e.user_id,
       CASE WHEN r.click_ts >= e.ts - INTERVAL 30 MINUTE
            THEN r.last_click_id END AS last_click_id
FROM (SELECT event_id, ts, user_id FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (
  SELECT user_id, ts AS click_ts, max(event_id) AS last_click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
) r ON e.user_id = r.user_id AND e.ts >= r.click_ts
ORDER BY e.event_id
"""
    o["asof_error_nearest_click_30m"] = """
WITH e AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'error'
), c AS (
  SELECT user_id, ts AS click_ts, max(event_id) AS nearest_click_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT e.event_id, e.user_id,
       (SELECT r.nearest_click_id FROM c r
        WHERE r.user_id = e.user_id
          AND abs(date_diff('microsecond', r.click_ts, e.ts))
              <= 30 * 60 * 1000000
        ORDER BY abs(date_diff('microsecond', r.click_ts, e.ts)),
                 r.click_ts
        LIMIT 1) AS nearest_click_id
FROM e ORDER BY e.event_id
"""
    o["events_scd2_pit_join"] = """
WITH hist AS (
  SELECT user_id, ts AS valid_from, lead(ts) OVER w AS valid_to, value
  FROM events WHERE event_type = 'purchase'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, c.ts,
       round(h.value, 3) AS purchase_value, h.valid_from
FROM clicks c LEFT JOIN hist h
  ON h.user_id = c.user_id
 AND c.ts >= h.valid_from
 AND (h.valid_to IS NULL OR c.ts < h.valid_to)
ORDER BY c.event_id
"""
    o["orders_snapshot_diff"] = """
WITH old AS (
  SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 5 <> 0
), new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus
  FROM orders WHERE o_orderkey % 7 <> 0
), d AS (
  SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
         CASE WHEN o.o_orderkey IS NULL THEN 'insert'
              WHEN n.o_orderkey IS NULL THEN 'delete'
              WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                THEN 'update' END AS change,
         o.o_orderstatus AS old_status,
         n.o_orderstatus AS new_status
  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
)
SELECT * FROM d WHERE change IS NOT NULL ORDER BY o_orderkey
"""
    o["orders_snapshot_rebuild"] = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END
         AS o_orderstatus
FROM orders WHERE o_orderkey % 7 <> 0
ORDER BY o_orderkey
"""
    o["corpus_shuffle_shards"] = """
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
), s AS (
  SELECT doc_id, h,
         CAST(CAST(('0x' || substr(h, 1, 4)) AS INTEGER) % 8 AS INT) AS shard
  FROM h
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) - 1
            AS BIGINT) AS position
FROM s ORDER BY shard, position
"""
    o["corpus_effective_tokens"] = f"""
WITH tok AS (
  SELECT doc_id, source, md5(text) AS h, len({_TOK}) AS n_tok FROM documents
), surv AS (
  SELECT min(doc_id) AS doc_id FROM tok GROUP BY h
), raw AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS raw_tokens
  FROM tok GROUP BY source
), kept AS (
  SELECT t.source, CAST(count(*) AS BIGINT) AS n_surviving_docs,
         CAST(sum(t.n_tok) AS BIGINT) AS effective_tokens
  FROM tok t JOIN surv s ON t.doc_id = s.doc_id
  GROUP BY t.source
)
SELECT r.source, r.n_docs, r.raw_tokens,
       CAST(coalesce(k.n_surviving_docs, 0) AS BIGINT) AS n_surviving_docs,
       CAST(coalesce(k.effective_tokens, 0) AS BIGINT) AS effective_tokens,
       round(coalesce(k.effective_tokens, 0)::DOUBLE / r.raw_tokens, 6)
         AS effective_ratio
FROM raw r LEFT JOIN kept k ON r.source = k.source
ORDER BY r.source
"""
    o["part_degree_histogram"] = """
WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pr AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
  FROM i a JOIN i b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2),
ends AS (
  SELECT part_a AS node FROM pr UNION ALL SELECT part_b FROM pr
), deg AS (
  SELECT node, count(*) AS degree FROM ends GROUP BY node
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
FROM deg GROUP BY degree ORDER BY degree
"""
    o["order_ship_latency"] = """
WITH lat AS (
  SELECT o_orderpriority,
         datediff('day', o_orderdate, l_shipdate) AS ship_days
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(avg(ship_days), 4) AS avg_days,
       round(quantile_cont(ship_days, 0.5), 4) AS p50_days,
       round(quantile_cont(ship_days, 0.9), 4) AS p90_days,
       CAST(max(ship_days) AS INT) AS max_days
FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
"""
    o["supplier_scorecard"] = """
SELECT l_suppkey,
       CAST(count(*) AS BIGINT) AS n_lines,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returned,
       round(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS return_rate,
       round(sum(CASE WHEN l_returnflag = 'R'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6)
         AS returned_revenue_share
FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
"""
    o["events_daily_trend"] = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), xy AS (
  SELECT event_type,
         CAST(datediff('day', DATE '2024-01-01', day) AS DOUBLE) AS x,
         CAST(n AS DOUBLE) AS y
  FROM daily
), m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_days,
         covar_pop(x, y) AS sxy,
         var_pop(x) AS sxx,
         avg(x) AS mx,
         avg(y) AS my,
         corr(x, y) AS r
  FROM xy GROUP BY event_type
)
SELECT event_type, n_days,
       round(CASE WHEN sxx = 0 THEN 0.0 ELSE sxy / sxx END, 6) AS slope,
       round(my - (CASE WHEN sxx = 0 THEN 0.0 ELSE sxy / sxx END) * mx, 6)
         AS intercept,
       round(coalesce(r, 0.0), 6) AS correlation
FROM m ORDER BY event_type
"""
    o["events_user_cms_counts"] = """
SELECT user_id, count(*) AS n_events
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""
    o["events_hourly_gapfill"] = """
WITH sparse AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         count(*) AS n, round(avg(value), 6) AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(date_trunc('hour', ts)) AS h_min,
         max(date_trunc('hour', ts)) AS h_max
  FROM events
), hours AS (
  SELECT unnest(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS h
  FROM bounds
), grid AS (
  SELECT t.event_type, hours.h
  FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events) t
)
SELECT g.event_type, g.h,
       CAST(coalesce(s.n, 0) AS BIGINT) AS n,
       last_value(s.avg_value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.h
         ROWS UNBOUNDED PRECEDING
       ) AS avg_value_ff
FROM grid g LEFT JOIN sparse s
  ON g.event_type = s.event_type AND g.h = s.h
ORDER BY g.event_type, g.h
"""
    o["events_hourly_interpolate"] = """
WITH sparse AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         count(*) AS n, round(avg(value), 6) AS avg_value
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT min(date_trunc('hour', ts)) AS h_min,
         max(date_trunc('hour', ts)) AS h_max
  FROM events
), hours AS (
  SELECT unnest(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS h
  FROM bounds
), grid AS (
  SELECT t.event_type, hours.h
  FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), j AS (
  SELECT g.event_type, g.h, s.n, s.avg_value,
         CASE WHEN s.avg_value IS NOT NULL THEN g.h END AS obs_h
  FROM grid g LEFT JOIN sparse s
    ON g.event_type = s.event_type AND g.h = s.h
), w AS (
  SELECT event_type, h, n, avg_value,
         last_value(avg_value IGNORE NULLS) OVER back AS prev_v,
         last_value(obs_h IGNORE NULLS) OVER back AS prev_h,
         first_value(avg_value IGNORE NULLS) OVER fwd AS next_v,
         first_value(obs_h IGNORE NULLS) OVER fwd AS next_h
  FROM j
  WINDOW back AS (PARTITION BY event_type ORDER BY h
                  ROWS UNBOUNDED PRECEDING),
         fwd AS (PARTITION BY event_type ORDER BY h
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, h,
       CAST(coalesce(n, 0) AS BIGINT) AS n,
       round(CASE WHEN avg_value IS NOT NULL THEN avg_value
                  WHEN next_v IS NULL THEN prev_v
                  WHEN prev_v IS NULL THEN NULL
                  ELSE (CAST(round(prev_v * 1e6) AS BIGINT)
                        * (CAST((epoch(next_h) - epoch(prev_h)) / 3600 AS BIGINT)
                           - CAST((epoch(h) - epoch(prev_h)) / 3600 AS BIGINT))
                        + CAST(round(next_v * 1e6) AS BIGINT)
                          * CAST((epoch(h) - epoch(prev_h)) / 3600 AS BIGINT))
                       / (CAST((epoch(next_h) - epoch(prev_h)) / 3600 AS BIGINT)
                          * 1e6)
             END, 6) AS avg_value_lerp
FROM w ORDER BY event_type, h
"""
    o["events_linear_attribution"] = """
WITH p AS (
  SELECT event_id AS p_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts AS c_ts, event_id AS c_id
  FROM events WHERE event_type = 'click'
), touches AS (
  SELECT DISTINCT p.p_id, p.user_id, c.c_id
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.c_ts >= p.ts - INTERVAL 24 HOUR AND c.c_ts <= p.ts
), per_purchase AS (
  SELECT p_id, user_id, count(*) AS n_touches
  FROM touches GROUP BY p_id, user_id
), credited AS (
  SELECT t.p_id, t.user_id, t.c_id, 1.0 / pp.n_touches AS credit
  FROM touches t JOIN per_purchase pp
    ON t.p_id = pp.p_id AND t.user_id = pp.user_id
)
SELECT user_id,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases_attributed,
       CAST(count(DISTINCT c_id) AS BIGINT) AS n_clicks_credited,
       round(sum(credit), 6) AS credit_mass
FROM credited GROUP BY user_id ORDER BY user_id
"""
    o["events_decay_attribution"] = """
WITH p AS (
  SELECT event_id AS p_id, user_id, ts FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts AS c_ts, event_id AS c_id
  FROM events WHERE event_type = 'click'
), touches AS (
  SELECT DISTINCT p.p_id, p.user_id, p.ts, c.c_ts, c.c_id
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.c_ts >= p.ts - INTERVAL 24 HOUR AND c.c_ts <= p.ts
), wts AS (
  SELECT p_id, user_id, c_id,
         pow(0.5, (date_diff('second', c_ts, ts) / 3600.0) / 6.0) AS w
  FROM touches
), tot AS (
  SELECT p_id, user_id, sum(w) AS tw FROM wts GROUP BY p_id, user_id
), credited AS (
  SELECT w.p_id, w.user_id, w.c_id, w.w, w.w / t.tw AS credit
  FROM wts w JOIN tot t ON w.p_id = t.p_id AND w.user_id = t.user_id
)
SELECT user_id,
       CAST(count(DISTINCT p_id) AS BIGINT) AS n_purchases_attributed,
       CAST(count(DISTINCT c_id) AS BIGINT) AS n_clicks_credited,
       round(sum(credit), 6) AS credit_mass,
       round(sum(w), 6) AS decay_weight_mass
FROM credited GROUP BY user_id ORDER BY user_id
"""
    o["events_first_touch"] = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts AS c_ts, event_id AS c_id
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.event_id, c.c_ts, c.c_id
  FROM p JOIN c ON c.user_id = p.user_id
   AND c.c_ts >= p.ts - INTERVAL 24 HOUR AND c.c_ts <= p.ts
), m AS (
  SELECT event_id, min(c_ts) AS first_click_ts FROM j GROUP BY event_id
), a AS (
  SELECT j.event_id, m.first_click_ts, min(j.c_id) AS first_click_id
  FROM j JOIN m ON j.event_id = m.event_id AND j.c_ts = m.first_click_ts
  GROUP BY j.event_id, m.first_click_ts
)
SELECT p.event_id, p.user_id, p.ts, a.first_click_ts, a.first_click_id
FROM p LEFT JOIN a ON p.event_id = a.event_id
ORDER BY p.event_id
"""
    o["dedup_incremental_survivors"] = f"""
WITH sh AS (SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM documents),
b AS (SELECT * FROM sh WHERE doc_id % 2 = 1),
c AS (SELECT * FROM sh WHERE doc_id % 2 = 0),
dup AS (
  SELECT DISTINCT b.doc_id
  FROM b JOIN c
    ON round(len(list_intersect(b.s, c.s))::DOUBLE
       / nullif(len(b.s) + len(c.s) - len(list_intersect(b.s, c.s)), 0), 6)
       >= 0.2
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id % 2 = 1 AND d.doc_id NOT IN (SELECT doc_id FROM dup)
ORDER BY d.doc_id
"""
    # window text (not its hash) is the grouping key here — semantically
    # identical to the engine's xxhash64 key modulo 64-bit collisions
    o["text_duplicated_spans"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
w AS (SELECT doc_id,
        CASE WHEN len(toks) >= 20
             THEN list_transform(range(1, len(toks) - 18),
                                 i -> array_to_string(toks[i:i+19], ' '))
             ELSE []::VARCHAR[] END AS wins
      FROM t),
x AS (SELECT doc_id, unnest(wins) AS win FROM w),
g AS (SELECT win, count(*) AS n_occ FROM x GROUP BY win),
p AS (SELECT x.doc_id, count(*) AS n_windows,
             sum(CASE WHEN g.n_occ >= 2 THEN 1 ELSE 0 END) AS n_dup_windows
      FROM x JOIN g USING (win) GROUP BY x.doc_id)
SELECT d.doc_id,
       coalesce(p.n_windows, 0)::BIGINT AS n_windows,
       coalesce(p.n_dup_windows, 0)::BIGINT AS n_dup_windows,
       round(coalesce(p.n_dup_windows / p.n_windows, 0.0), 6)
         AS dup_span_frac
FROM documents d LEFT JOIN p USING (doc_id)
ORDER BY d.doc_id
"""
    o["text_gopher_flags"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
m AS (SELECT doc_id,
        len(toks)::BIGINT AS n_words,
        coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
          AS sum_len,
        len(list_filter(toks,
            x -> contains(x, '#') OR contains(x, '...'))) AS n_symbolic,
        len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
          AS n_alpha,
        len(list_intersect(
            list_distinct(list_transform(toks, x -> lower(x))),
            ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']))
          AS stop_hits
      FROM t),
f AS (SELECT doc_id, n_words,
        CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER)
          AS word_count_ok,
        CAST(CASE WHEN n_words > 0 THEN sum_len / n_words ELSE 0.0 END
               BETWEEN 3.0 AND 10.0 AS INTEGER) AS mean_word_len_ok,
        CAST(CASE WHEN n_words > 0 THEN n_symbolic / n_words ELSE 0.0 END
               <= 0.1 AS INTEGER) AS symbol_ratio_ok,
        CAST(CASE WHEN n_words > 0 THEN n_alpha / n_words ELSE 0.0 END
               >= 0.8 AS INTEGER) AS alpha_word_ok,
        CAST(stop_hits >= 2 AS INTEGER) AS stopwords_ok
      FROM m)
SELECT doc_id, n_words, word_count_ok, mean_word_len_ok, symbol_ratio_ok,
       alpha_word_ok, stopwords_ok,
       word_count_ok * mean_word_len_ok * symbol_ratio_ok * alpha_word_ok
         * stopwords_ok AS passes_gopher
FROM f
ORDER BY doc_id
"""
    # same lookahead-free GPT-2-style pretokenizer; RE2 and Java regex
    # agree on \p{L}/\p{N} classes and leftmost-first alternation
    o["text_bpe_token_estimate"] = f"""
WITH p AS (
  SELECT doc_id,
         regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+')
           AS pts,
         {_TOK} AS toks
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_ws_tokens,
         len(pts)::BIGINT AS n_pretokens,
         coalesce(list_sum(list_transform(pts,
             x -> greatest(1, ceil(length(trim(x)) / 4.0)::BIGINT))),
           0)::BIGINT AS est_bpe_tokens
  FROM p)
SELECT doc_id, n_ws_tokens, n_pretokens, est_bpe_tokens,
       round(CASE WHEN n_ws_tokens > 0
                  THEN est_bpe_tokens / n_ws_tokens ELSE 0.0 END, 6)
         AS bpe_per_word
FROM m ORDER BY doc_id
"""
    # clusters = the dedup_clusters recursive-CTE kernel; survivor = the
    # row_number-1 member ordered by (quality DESC, doc_id ASC) — identical
    # to the engine's max_by((quality, -doc_id)) election
    o["dedup_best_quality"] = f"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct({_SHINGLES}) AS s FROM documents
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE round(len(list_intersect(a.s, b.s))::DOUBLE
        / nullif(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)), 0), 6) >= 0.2
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
), reach(node, lab) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.lab FROM reach r JOIN edges e ON e.a = r.node
), clus AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
), t AS (SELECT doc_id, text, {_TOK} AS toks FROM documents
), qual AS (
  SELECT doc_id,
         round((CASE WHEN len(toks) >= 16 THEN 1 ELSE 0 END
         + CASE WHEN (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')))::DOUBLE
                      / greatest(length(text), 1) < 0.2 THEN 1 ELSE 0 END
         + CASE WHEN ({stop_hits}) > 0 THEN 1 ELSE 0 END) / 3.0, 4)
           AS quality_score
  FROM t
), lab AS (
  SELECT d.doc_id,
         coalesce(c.cluster_id, d.doc_id) AS cluster_id,
         q.quality_score
  FROM documents d
  LEFT JOIN clus c ON c.doc_id = d.doc_id
  JOIN qual q ON q.doc_id = d.doc_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cluster_id
                               ORDER BY quality_score DESC, doc_id ASC) AS rn
  FROM lab)
SELECT doc_id, cluster_id, quality_score,
       CASE WHEN rn = 1 THEN 1 ELSE 0 END AS is_survivor
FROM ranked ORDER BY doc_id
"""
    o["text_bigram_logprob"] = f"""
WITH t AS (SELECT doc_id, {_TOK} AS toks FROM documents),
bi AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
  FROM t, unnest(range(1, len(toks))) AS r(i)
  WHERE len(toks) >= 2),
uni AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1
        FROM (SELECT unnest(toks) AS w1 FROM t) GROUP BY 1),
vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bi GROUP BY 1, 2)
SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(-log2((big.c12 + 0.5) / (uni.c1 + 0.5 * vv.v))), 6)
         AS bits_per_bigram
FROM bi JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vocab vv
GROUP BY bi.doc_id
ORDER BY bi.doc_id
"""
    o["corpus_decontaminate"] = f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents),
grams AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 6),
         i -> array_to_string(t[i:i+7], ' '))) AS gs
  FROM toks),
corpus_side AS (
  SELECT doc_id, unnest(gs) AS gram FROM grams WHERE doc_id % 7 <> 0),
bench AS (
  SELECT DISTINCT unnest(gs) AS gram FROM grams WHERE doc_id % 7 = 0),
bad AS (SELECT DISTINCT c.doc_id FROM corpus_side c JOIN bench b USING (gram))
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id % 7 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM bad)
ORDER BY d.doc_id
"""
    o["events_audience_overlap"] = """
WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
       FROM du GROUP BY 1),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS overlap
  FROM du a JOIN du b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT i.type_a, i.type_b,
       ca.n_users AS users_a, cb.n_users AS users_b, i.overlap,
       round(i.overlap / (ca.n_users + cb.n_users - i.overlap), 6)
         AS jaccard
FROM inter i
JOIN pt ca ON ca.event_type = i.type_a
JOIN pt cb ON cb.event_type = i.type_b
ORDER BY i.type_a, i.type_b
"""
    o["events_heavy_hitters"] = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY user_id
ORDER BY n DESC, user_id ASC LIMIT 10
"""
    o["corpus_epoch_plan"] = f"""
WITH toks AS (
  SELECT source,
         CAST(sum(len({_TOK})) AS BIGINT) AS available_tokens
  FROM documents GROUP BY 1),
p AS (SELECT *, available_tokens ** 0.3 AS powed FROM toks),
z AS (SELECT sum(powed) AS z FROM p)
SELECT source, available_tokens,
       round(powed / z, 6) AS token_share,
       round(powed / z * 1000000.0, 2) AS target_tokens,
       round(CASE WHEN available_tokens > 0
                  THEN powed / z * 1000000.0 / available_tokens
                  ELSE 0.0 END, 4) AS epochs
FROM p CROSS JOIN z
ORDER BY source
"""
    o["corpus_temperature_mix"] = """
WITH counts AS (
  SELECT lang, count(*) AS doc_count FROM documents GROUP BY lang),
tot AS (SELECT CAST(sum(doc_count) AS BIGINT) AS total_docs FROM counts),
powed AS (
  SELECT lang, doc_count, power(doc_count, 0.3) AS pw FROM counts),
z AS (SELECT sum(pw) AS z FROM powed)
SELECT lang, doc_count,
       round(doc_count / total_docs, 6) AS share,
       round(pw / z, 6) AS temp_share,
       round((pw / z) / (doc_count / total_docs), 6) AS sample_factor
FROM powed, z, tot ORDER BY lang
"""
    o["events_funnel_rates"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1),
s2 AS (
  SELECT e.user_id, t1, min(ts) AS t2 FROM events e JOIN s1 USING (user_id)
  WHERE event_type = 'click' AND ts >= t1 GROUP BY 1, 2),
s3 AS (
  SELECT e.user_id, t1, t2, min(ts) AS t3 FROM events e JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1, 2, 3),
c AS (
  SELECT 1 AS step_index, 'view' AS step,
         CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_users
  UNION ALL
  SELECT 2, 'click', CAST((SELECT count(*) FROM s2) AS BIGINT)
  UNION ALL
  SELECT 3, 'purchase', CAST((SELECT count(*) FROM s3) AS BIGINT))
SELECT step_index, step, n_users,
       round(CASE WHEN lag(n_users) OVER (ORDER BY step_index) IS NULL
                  THEN 1.0
                  WHEN lag(n_users) OVER (ORDER BY step_index) = 0
                  THEN 0.0
                  ELSE n_users / lag(n_users) OVER (ORDER BY step_index)
             END, 6) AS rate_vs_prev,
       round(CASE WHEN first_value(n_users) OVER (ORDER BY step_index) = 0
                  THEN 0.0
                  ELSE n_users
                       / first_value(n_users) OVER (ORDER BY step_index)
             END, 6) AS rate_vs_entry
FROM c ORDER BY step_index
"""
    o["orders_pareto_share"] = """
WITH per_cust AS (
  SELECT o_custkey, sum(o_totalprice) AS spend
  FROM orders GROUP BY 1),
tot AS (SELECT sum(spend) AS total_spend FROM per_cust),
t10 AS (SELECT spend FROM per_cust ORDER BY spend DESC, o_custkey LIMIT 10),
t100 AS (SELECT spend FROM per_cust ORDER BY spend DESC, o_custkey LIMIT 100),
c AS (
  SELECT 10 AS k, CAST((SELECT count(*) FROM t10) AS BIGINT) AS n_customers,
         (SELECT sum(spend) FROM t10) AS top_spend
  UNION ALL
  SELECT 100, CAST((SELECT count(*) FROM t100) AS BIGINT),
         (SELECT sum(spend) FROM t100))
SELECT k, n_customers,
       round(top_spend, 2) AS top_spend,
       round(total_spend, 2) AS total_spend,
       round(top_spend / total_spend, 6) AS revenue_share
FROM c, tot ORDER BY k
"""
    return o
