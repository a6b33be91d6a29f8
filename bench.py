"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints per-query detail FIRST (one JSON line + a BENCH_DETAIL.json file),
then ONE compact final JSON line the driver parses:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

The driver captures only the last ~2000 characters of stdout, and round 4's
90-query final line outgrew that window ("parsed": null) — so the final
line caps its "queries" dict at the slowest TOP_K entries (2 dp) and points
at BENCH_DETAIL.json for the full per-query map.  The detail line is
printed before the final line so truncation can only ever eat the detail,
never the headline.

Modes:
  (default)      headline suite (curated list below)
  BENCH_FULL=1   every registered query, minus the O(n^2) exact oracle
                 anchors whose registered LSH/auto twins are the at-scale
                 path (benching the anchors at sf0.1 measures the wrong
                 kernel — see SCALE.md).
  BENCH_ONLY=a,b comma-separated subset (isolation runs for drift checks)
  BENCH_REPEAT=N run each query N times and report the MEDIAN (default 1
                 — the committed artifacts are single-run so they stay
                 comparable round-over-round; use N>=3 with BENCH_ONLY
                 when deciding whether a row genuinely regressed, since
                 single-run host variance is measured at +-20% on this
                 box — see SCALE.md "bench row position effect")
  BENCH_HEAVY_REPEAT=K rows whose PREVIOUS committed full-suite raw
                 exceeded HEAVY_THRESHOLD_SEC run K times (median), even
                 when BENCH_REPEAT=1 (default 3; set 1 to disable).
                 Round 13 proved calibration corrects only UNIFORM load:
                 position-dependent pressure fabricated +130-411%
                 single-run rows on byte-identical kernels that only
                 repeat-median isolation killed (round-13 verdict #2),
                 and the expensive rows are where those phantoms land.
                 Per-row repeat counts are recorded in the artifact
                 ("repeats": rows that differ from the base "repeat").

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect overhead).  A warmup run of the smallest query absorbs
JVM/codegen startup so per-query numbers reflect steady state.

Cache policy (round-7 directive #2): BENCH_FULL clears the session cache
between queries so every row measures its own standalone cost; HEADLINE
keeps the intentional retrieval_pipeline-first warm ordering and flags the
cache-served rows in "warm_rows" in both artifacts' JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_zeal_spark.io import load_table  # noqa: E402
from data_pipeline_zeal_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Quiet-box cost of the calibration kernel (median of 3, measured at the
#: start of round 13 immediately after boot — see SCALE.md "bench
#: calibration").  Row timings are reported both raw and normalized by
#: (CALIBRATION_REF_SEC / observed calibration), so a suite run on a
#: loaded box can be compared to a quiet-box run: if the calibration
#: kernel ran 1.5x slow, every row's normalized number divides that
#: drift out.  Normalization assumes roughly uniform slowdown (CPU
#: contention), which is exactly the failure mode observed in r11/r12;
#: it cannot correct per-row cache effects, so regression adjudication
#: should still use BENCH_ONLY + BENCH_REPEAT>=3 isolation runs.
CALIBRATION_REF_SEC = 0.46
#: max entries in the final line's "queries" dict (keeps the line < ~1.5 kB)
TOP_K = 25

#: rows above this previous-round raw cost get BENCH_HEAVY_REPEAT medians
HEAVY_THRESHOLD_SEC = 5.0


def _prior_heavy_rows() -> set[str]:
    """Rows whose raw timing in the NEWEST committed full-suite artifact
    exceeded :data:`HEAVY_THRESHOLD_SEC` — the candidates for automatic
    repeat-median treatment.  Reads metadata only; empty when no full
    artifact exists yet (first round on a fresh clone)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    paths = sorted(
        glob.glob(os.path.join(here, "BENCH_FULL_r*.json")),
        key=lambda p: int("".join(c for c in os.path.basename(p)
                                  if c.isdigit())),
    )
    if not paths:
        return set()
    try:
        with open(paths[-1]) as f:
            q = json.load(f).get("queries") or {}
    except (OSError, ValueError):
        return set()
    return {k for k, v in q.items()
            if isinstance(v, (int, float)) and v > HEAVY_THRESHOLD_SEC}

#: exact kernels excluded from BENCH_FULL: each is an oracle-pinning anchor
#: whose at-scale twin IS in the suite (minhash_lsh / best_quality_lsh /
#: embedding_lsh_pairs / ivf / lsh_topk).  O(n^2) at sf0.1 measures the
#: kernel we deliberately do not ship for scale.
FULL_EXCLUDE = {
    "dedup_jaccard_pairs",
    "dedup_best_quality",
    "dedup_embedding_near",
}

#: Headline suite: the flagship aggregation, the join/window/rollup ETL
#: spine, and the LLM-data operators.  dedup_jaccard_pairs (O(n^2) exact
#: kernel) is deliberately excluded — minhash_lsh is the at-scale path.
HEADLINE = [
    "hourly_agg",
    "agg_stats",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_revenue_forecast",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_revenue",
    "tpch_q13_order_distribution",
    "tpch_q16_part_variety",
    "tpch_q4_priority_check",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume",
    "top_orders_per_customer",
    "customer_order_stats",
    "order_priority_rollup",
    "priority_with_returns",
    "promo_revenue_share",
    "events_sessionize",
    "events_session_window",
    "events_type_hour_pivot",
    "asof_events_last_order",
    "range_error_context",
    "text_stats",
    "text_language_id",
    "text_source_token_totals",
    "corpus_quality_filter",
    "corpus_contamination",
    "dedup_exact_groups",
    "dedup_normalized_groups",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_lsh_topk",
    "sim_label_centroids",
    "sim_filtered_topk",
    "orders_rfm",
    "events_value_histogram",
    "events_daily_anomaly",
    "corpus_curation_summary",
    "events_type_transitions",
    "basket_part_pairs",
    "text_unigram_logprob",
    "text_repetition_profile",
    "customer_spend_deciles",
    "corpus_weighted_sample",
    "sim_knn_label",
    "events_cdc_merge",
    "corpus_boilerplate_profile",
    "part_pagerank",
    "corpus_source_divergence",
    "events_value_percentiles",
    "events_scd2_history",
    "dq_audit",
    "events_scd2_pit_join",
    "orders_snapshot_diff",
    "dedup_incremental_survivors",
    "text_top_terms_per_source",
    "orders_snapshot_rebuild",
    "events_first_touch",
    "events_user_cms_counts",
    "events_daily_trend",
    "order_ship_latency",
    "supplier_scorecard",
    "corpus_effective_tokens",
    "part_degree_histogram",
    "events_linear_attribution",
    "corpus_shuffle_shards",
    "text_feature_hash",
    "events_hourly_gapfill",
    "events_hourly_interpolate",
    "text_chunk_overlap",
    "text_ngram_novelty",
    "part_triangle_census",
    "sim_pq_topk",
    "orders_backlog_timeline",
    "events_profile_drift",
    "hourly_agg_incremental",
    "events_decay_attribution",
    "asof_error_nearest_click_30m",
    "text_doc_similarity",
    "dedup_rate_by_source",
    "sim_pca_project",
    "orders_priority_anova",
    "part_supplier_hhi",
    "events_stickiness_28d",
    "events_gap_distribution",
    "events_markov_steady",
    "text_zipf_fit",
    "sim_centroid_drift",
    "events_hour_uniformity",
    "corpus_split_leakage",
    "text_duplicated_spans",
    "text_gopher_flags",
    "text_bpe_token_estimate",
    "dedup_best_quality_lsh",
    "text_bigram_logprob",
    "multimodal_jpeg_headers",
    "corpus_decontaminate",
    "events_audience_overlap",
    "events_heavy_hitters",
    "corpus_temperature_mix",
    "events_funnel_rates",
    "orders_pareto_share",
    "sim_matryoshka_topk",
    "dq_functional_deps",
    "basket_rules",
    "text_readability",
    "events_top_paths",
    "dedup_clusters",
    "semdedup_survivors",
    "orders_cohort_ltv",
    "corpus_epoch_plan",
    "text_source_fair_quality",
    "text_compression_ratio",
    "orders_seasonality",
    "events_daily_anomaly_mad",
    "events_user_bursts",
    "events_key_skew_profile",
    # round-6 additions
    "dedup_embedding_near_lsh",
    # retrieval_pipeline runs FIRST of the retrieval set on purpose: its
    # persisted top-k runs (BM25 + vector since r9) are the same plan
    # subtrees the four standalone queries build, so the session cache
    # serves them without re-running the posting join / corpus scan — the
    # amortization the operator exists to provide.  Since r10 the
    # pipeline EAGERLY fills the vector run too (round-9 advice: a lazy
    # persist left the entry unfilled because the pipeline's own output
    # never references it), so the hybrid row really is fusion-only
    # marginal cost for BOTH legs.  HEADLINE keeps this intentional warm
    # ordering and flags the four beneficiaries in the artifact's
    # "warm_rows" (their numbers are cache-served marginal cost, not
    # standalone cost); BENCH_FULL clears the session cache between
    # queries so every row measures its own cost
    # (round-7 verdict what's-wrong #5).
    "retrieval_pipeline",
    "text_bm25_topk",
    "retrieval_quality",
    "retrieval_hard_negatives",
    "retrieval_hybrid_rrf",
    "corpus_containment",
    "dedup_bcubed_norm_vs_jaccard",
    "text_bpe_train_merges",
    "versioned_time_travel",
    "versioned_merge_upsert",
    "versioned_change_feed",
    "corpus_perplexity_filter",
    "corpus_dsir_weights",
    "dq_k_anonymity",
    "dq_l_diversity",
    # round-7 additions
    "dedup_embedding_near_cells",
    "versioned_stats_skipping",
    # round-8 additions (retrieval_hybrid_rrf moved into the warm
    # retrieval block above in r9 — it now consumes the pipeline's
    # persisted runs)
    "corpus_decontaminate_bloom",
    "dedup_pipeline",
    "sim_ivf_pq_topk",
    "versioned_delete_where",
    "versioned_update_where",
    "text_quality_classifier",
    # round-9 additions
    "dedup_substring_spans",
    "text_bpe_encode",
    "corpus_decontaminate_fuzzy",
    # round-10 additions: distributed-trainer evaluation frames + the
    # persisted IVF index (build-once/probe-many over the versioned table)
    "train_kmeans_distributed",
    "train_pq_distributed",
    "train_classifier_distributed",
    "sim_ivf_index_search",
    "text_bm25_index_search",
    # round-11 addition: tokenizer-depth encode (in-memory trainer over
    # the word-count stage + Arrow kernel through auto dispatch)
    "text_bpe_encode_deep",
    "text_bm25_segment_search",
    "text_bm25_delete_search",
    "versioned_delete_dv",
    # round-11: persisted IVFADC index (compressed codes + exact rerank),
    # incremental materialized views, write-time expectations
    "sim_ivfadc_index_search",
    "versioned_matview_refresh",
    "versioned_expectations",
    "versioned_maintain",
    "versioned_bloom_skipping",
    "versioned_auto_bloom",
    "versioned_restore",
    # round-13: retention under the maintenance tick + predicate delete
    "versioned_vacuum_tick",
    "text_bm25_delete_where_search",
    # round-14: MP4 box-walk gate + streaming IVF maintenance at the
    # driver (build on a slice, availableNow sink append, probe) + the
    # ANN index under the unified tick (canary + COW-DML drift law)
    "multimodal_mp4_headers",
    "sim_ivf_segment_search",
    "sim_ivfadc_segment_search",
    "ann_maintain_tick",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_calibration(spark) -> float:
    """Fixed-cost synthetic kernel: seeded 20M-row hash aggregate.

    Pure `spark.range` -> xxhash64 -> groupBy(1000 keys), so its cost is
    independent of every fixture table and every operator in the suite —
    it measures only how fast this box runs a known Spark job right now.
    Executed BEFORE and AFTER the timed suite (round-12 verdict directive
    #2); both numbers land in the artifact so a reader can see whether
    the box was loaded, and whether load changed mid-suite.  Median of 3.
    """
    reps = []
    for _ in range(3):
        spark.catalog.clearCache()
        df = (
            spark.range(0, 20_000_000, 1, 32)
            .select(
                (F.xxhash64("id") % 1000).alias("k"),
                # bounded so SUM over 20M rows cannot overflow long under
                # ANSI mode
                (F.xxhash64("id", F.lit(1)) % 1_000_000).alias("v"),
            )
            .groupBy("k")
            .agg(F.count("*").alias("c"), F.sum("v").alias("s"))
        )
        t0 = time.perf_counter()
        _force(df)
        reps.append(time.perf_counter() - t0)
    reps.sort()
    return round(reps[1], 3)


def main() -> None:
    import __spark_entry__ as em

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name=f"bench-sf{sf}")
    queries = em.queries()

    is_full = False
    if os.environ.get("BENCH_ONLY"):
        suite = [n.strip() for n in os.environ["BENCH_ONLY"].split(",") if n.strip()]
    elif os.environ.get("BENCH_FULL"):
        suite = [n for n in queries if n not in FULL_EXCLUDE]
        is_full = True
    else:
        suite = HEADLINE

    _force(queries["agg_event_types"](spark, SF_DIR))  # warmup (JVM/codegen)
    # Warm the Python/Arrow worker pool too: the first pandas-UDF stage of a
    # session pays worker fork + numpy/pandas import (~5 s across 32 slots),
    # which otherwise lands on whichever pandas-backed query runs first.
    _warm = spark.range(32).repartition(32)
    _force(_warm.mapInPandas(lambda it: it, "id long"))
    # Warm every fixture parquet scan (round-8 verdict what's-wrong #3):
    # the generic warm-up above touches only `events`, so under
    # cache-clean isolation row 1 of the suite otherwise pays the
    # first-ever footer read + FS cache fill for ITS tables (measured:
    # part_search 0.23 s warm vs 2.32 s as row 1), polluting
    # round-over-round diffs.  A throwaway count per table before the
    # timed loop makes row 1 measure its own cost.
    for _t in ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "documents", "embeddings"):
        load_table(spark, SF_DIR, _t).count()
    spark.catalog.clearCache()

    #: HEADLINE rows intentionally served from retrieval_pipeline's
    #: persisted run (flagged in "warm_rows"): the block cleanup below
    #: must not run before these or it would destroy the warm serve it
    #: is documenting.
    WARM = {
        "text_bm25_topk",
        "retrieval_quality",
        "retrieval_hard_negatives",
        "retrieval_hybrid_rrf",
    }

    cal_before = _run_calibration(spark)

    # r13: the BM25 rows share one disk-backed base build per corpus
    # fingerprint (retrieval.bm25_index_for — round-12 directive #3).
    # Whichever of them runs FIRST in suite order pays the build; later
    # ones are cache-served.  BENCH_FULL's cache-clean isolation does
    # not (and should not) clear that cache, so flag the served rows —
    # their numbers are amortized marginal cost, not standalone cost.
    from data_pipeline_zeal_spark.operators import retrieval as _retrieval

    BM25_CACHE_ROWS = {
        "text_bm25_index_search",
        "text_bm25_segment_search",
        "text_bm25_delete_search",
        "text_bm25_delete_where_search",
    }
    shared_build_rows: list[str] = []

    repeat = max(1, int(os.environ.get("BENCH_REPEAT", "1")))
    heavy_repeat = max(1, int(os.environ.get("BENCH_HEAVY_REPEAT", "3")))
    heavy = _prior_heavy_rows() if heavy_repeat > repeat else set()
    repeats: dict[str, int] = {}
    timings: dict[str, float] = {}
    # r15 (r14 verdict #6): when a BM25-cache row's MEDIAN rep is
    # cache-served, the artifact must also carry a build-paying number so
    # cross-round comparisons can be like-for-like against rounds whose
    # singles paid the base build.  rep 1 in EXECUTION order is the rep
    # that pays the build when this row is the first of its fingerprint
    # in the suite; record its raw seconds (and flag the rows where even
    # rep 1 was served because an earlier row already paid).
    build_rep_sec: dict[str, float] = {}
    build_rep_served: list[str] = []
    for name in suite:
        if is_full or name not in WARM:
            # Cache-clean isolation (round-7 directive #2): drop every
            # cached block a previous query left behind (e.g. the
            # retrieval_pipeline run frame) so each row measures ITS OWN
            # cost, not a warm-cache serve.  HEADLINE keeps the one
            # intentional warm ordering (the retrieval trio) by skipping
            # the cleanup before those rows only.
            spark.catalog.clearCache()
            # clearCache() drops cached DATASETS but not localCheckpoint
            # RDD blocks (dedup/CC/perplexity checkpoints), which
            # otherwise accumulate across the 200+ queries, squeeze
            # execution memory, and inflate LATE rows ~3x (measured:
            # price_quantiles 5.1 s isolated vs 17.3 s late-suite).
            # Prior queries' frames are dead — noop-written, never
            # reused — so dropping their blocks is safe here (NOT safe
            # for live frames: a localCheckpoint cannot recompute).
            # EXCEPT before the warm retrieval rows (above) — a
            # DataFrame.persist also surfaces as a persistent RDD, so
            # the cleanup would evict the run frame clearCache spares.
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist(False)
        n_reps = max(repeat, heavy_repeat if name in heavy else 1)
        repeats[name] = n_reps
        # guide §1.5: label the row's jobs so the UI / event log maps
        # stages back to the registered query
        spark.sparkContext.setJobDescription(f"bench: {name}")
        reps: list[tuple[float, bool]] = []
        for _ in range(n_reps):
            # per-REP cache snapshot (round-13 advice): with repeats the
            # first rep pays the shared BM25 base build and later reps
            # are cache-served, so the served flag must describe the rep
            # the MEDIAN actually came from, not rep 1's key delta
            rep_keys_before = set(_retrieval._BM25_BUILD_CACHE)
            t0 = time.perf_counter()
            _force(queries[name](spark, SF_DIR))
            elapsed = time.perf_counter() - t0
            served = (
                name in BM25_CACHE_ROWS
                and set(_retrieval._BM25_BUILD_CACHE) == rep_keys_before
            )
            reps.append((elapsed, served))
        first_time, first_served = reps[0]  # execution order, before sort
        reps.sort()
        med_time, med_served = reps[len(reps) // 2]
        timings[name] = round(med_time, 3)
        if med_served:
            # the reported median needed no new base build: it is
            # amortized marginal cost, served from the shared cache
            shared_build_rows.append(name)
            build_rep_sec[name] = round(first_time, 3)
            if first_served:
                build_rep_served.append(name)

    if is_full:
        # Completeness gate (round-5 verdict #3): the full-suite artifact
        # must cover the WHOLE registry minus the documented O(n^2)
        # anchors — a silent lag reads as "covered everything" when it
        # didn't.  tests/test_bench_artifact.py pins the committed
        # BENCH_FULL_r*.json against the same contract.  Keyed on the
        # suite actually selected (BENCH_ONLY takes priority over
        # BENCH_FULL), not the raw env var.
        expected = set(queries) - FULL_EXCLUDE
        missing = expected - set(timings)
        assert not missing, f"BENCH_FULL missed registry queries: {sorted(missing)}"

    spark.sparkContext.setJobDescription(None)
    cal_after = _run_calibration(spark)
    # normalization factor: <1 means the box ran SLOWER than the quiet-box
    # reference, so normalized numbers shrink raw ones back toward it.
    cal_mean = (cal_before + cal_after) / 2.0
    norm = round(CALIBRATION_REF_SEC / cal_mean, 4) if cal_mean > 0 else 1.0
    normalized = {k: round(v * norm, 3) for k, v in timings.items()}

    total = round(sum(timings.values()), 3)
    total_norm = round(sum(normalized.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query detail: printed FIRST (truncation-safe) + durable file.
    # BENCH_ONLY isolation runs are labeled as such and land in a SEPARATE
    # file — a 3-query drift check must never clobber the committed
    # headline/full detail artifact or masquerade as the suite metric.
    is_subset = bool(os.environ.get("BENCH_ONLY"))
    metric = "subset_suite_seconds" if is_subset else "headline_suite_seconds"
    # HEADLINE-only honesty flag: these rows run after retrieval_pipeline
    # on purpose and are served from its persisted run — their timings are
    # the amortized marginal cost, NOT standalone cost (standalone numbers
    # live in BENCH_FULL, which cache-cleans between queries).
    warm_rows = (
        sorted(WARM & set(timings)) if (not is_full and not is_subset) else []
    )
    detail = {
        "metric": metric,
        "value": total,
        "unit": "sec",
        "queries": timings,
        # round-12 directive #2: fixed-cost kernel timed before/after the
        # suite; normalized rows divide host-load drift out (see
        # CALIBRATION_REF_SEC).  Compare rounds on these, adjudicate
        # individual regressions with BENCH_ONLY+BENCH_REPEAT isolation.
        "calibration_before": cal_before,
        "calibration_after": cal_after,
        "calibration_ref": CALIBRATION_REF_SEC,
        "calibration_factor": norm,
        "value_normalized": total_norm,
        "queries_normalized": normalized,
        "warm_rows": warm_rows,
        # BM25 rows whose shared base build was served from the session
        # cache (suite-order dependent — the first such row pays it)
        "shared_build_rows": shared_build_rows,
        # r15: for each cache-served row above, rep 1's raw seconds (the
        # rep that pays the base build when this row is the first of its
        # fingerprint) — the like-for-like number vs single-run rounds.
        # Rows in build_rep_served had even rep 1 served (an earlier row
        # already paid the build), so no build-paying number exists.
        "build_rep_sec": build_rep_sec,
        "build_rep_served": build_rep_served,
        "sf": sf_val,
        # methodology (round-10 directive #5): per-row value is the
        # MEDIAN of `repeat` runs; repeat=1 artifacts are single-run and
        # carry the measured +-20-60% host variance (SCALE.md "bench row
        # position effect") — compare rounds only at equal repeat
        "repeat": repeat,
        # round-13 directive #2: rows whose previous committed full-suite
        # raw exceeded HEAVY_THRESHOLD_SEC are medians of heavy_repeat
        # runs even at repeat=1 — single-run phantoms land on the
        # expensive rows, and calibration cannot remove position-
        # dependent pressure.  "repeats" lists only rows whose count
        # differs from the base "repeat".
        "heavy_repeat": heavy_repeat,
        "heavy_threshold_sec": HEAVY_THRESHOLD_SEC,
        "repeats": {k: v for k, v in sorted(repeats.items())
                    if v != repeat},
    }
    print(json.dumps(detail))
    detail_name = "BENCH_SUBSET.json" if is_subset else "BENCH_DETAIL.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               detail_name)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    # Compact final line: slowest TOP_K only, 2 dp — guaranteed to fit the
    # driver's ~2000-char stdout tail.
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:TOP_K]
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in slowest.items()},
                "queries_benched": len(timings),
                "calibration_before": cal_before,
                "calibration_after": cal_after,
                "calibration_ref": CALIBRATION_REF_SEC,
                "value_normalized": total_norm,
                "warm_rows": warm_rows,
                "detail": detail_name,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
