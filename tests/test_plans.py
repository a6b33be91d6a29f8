"""Structural plan assertions — the performance contract, tested.

These lock in the plan shapes that make the operators scale: predicate
pushdown to parquet, column pruning, broadcast dimension joins, top-k via
TakeOrderedAndProject.
"""

from __future__ import annotations

from data_pipeline_zeal_spark import plans
from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import etl

from tests.conftest import SF_SMALL


def test_q3_pushdown_pruning_broadcast(spark):
    df = etl.shipping_priority(
        load_table(spark, SF_SMALL, "customer"),
        load_table(spark, SF_SMALL, "orders"),
        load_table(spark, SF_SMALL, "lineitem"),
    )
    p = plans.summarize(df)
    pushed = " | ".join(p.pushed_filters)
    assert "EqualTo(c_mktsegment,BUILDING)" in pushed  # filter reached the scan
    assert "l_shipdate" in pushed
    assert p.broadcast_joins >= 1
    assert p.sort_merge_joins == 0  # nothing should fall back at this size
    # column pruning: the lineitem scan must not read unused l_comment-like
    # columns — check one scan reads only the 4 needed lineitem columns
    li = [s for s in p.read_schemas if "l_orderkey" in s]
    assert li and "l_tax" not in li[0] and "l_quantity" not in li[0]
    assert p.has_take_ordered  # top-10 must not be a global sort


def test_q6_scan_only_needed_columns(spark):
    df = etl.revenue_forecast(load_table(spark, SF_SMALL, "lineitem"))
    p = plans.summarize(df)
    assert len(p.read_schemas) == 1
    s = p.read_schemas[0]
    for col in ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"]:
        assert col in s
    assert "l_orderkey" not in s  # pruned
    assert p.pushed_filters  # range predicates pushed
    assert p.has_partial_agg  # map-side combine before the exchange


def test_top_orders_single_shuffle(spark):
    df = etl.top_orders_per_customer(load_table(spark, SF_SMALL, "orders"))
    p = plans.summarize(df)
    # one exchange for the window partition; no extra aggregation shuffles
    assert p.shuffles <= 2  # window hash exchange (+ optional AQE read)


def test_broadcast_hints_only_on_fixed_dims(spark):
    """SF-scaled tables (customer/supplier/part) must never carry an
    unconditional broadcast hint — at the 100 TB target a forced broadcast
    of a multi-GB table OOMs the driver.  With auto-broadcast disabled, the
    ONLY broadcasts left in the plan are the fixed-cardinality dims
    (region: 5 rows, nation: 25 rows); everything else falls back to a
    shuffle join, proving no hint forces it."""
    t = lambda n: load_table(spark, SF_SMALL, n)  # noqa: E731
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q5 = etl.local_supplier_volume(
            t("region"), t("nation"), t("customer"), t("supplier"),
            t("orders"), t("lineitem"),
        )
        p5 = plans.summarize(q5)
        # region→nation hint + dim→fact hint; customer/supplier must NOT
        # broadcast when not auto-eligible.
        assert p5.broadcast_joins == 2
        assert p5.sort_merge_joins >= 3  # orders⋈lineitem, ⋈customer, ⋈supplier

        q10 = etl.returned_item_revenue(
            t("customer"), t("orders"), t("lineitem"), t("nation")
        )
        p10 = plans.summarize(q10)
        assert p10.broadcast_joins == 1  # nation only
        assert p10.sort_merge_joins >= 2

        q18 = etl.large_volume_customers(t("customer"), t("orders"), t("lineitem"))
        p18 = plans.summarize(q18)
        assert p18.broadcast_joins == 0  # no hints anywhere in Q18
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)


def test_broadcasts_still_chosen_automatically_at_small_sf(spark):
    """With the hints gone, size statistics must still pick broadcast for the
    genuinely-small sides at fixture scale (the local-perf half of the
    size-honest contract)."""
    t = lambda n: load_table(spark, SF_SMALL, n)  # noqa: E731
    q5 = etl.local_supplier_volume(
        t("region"), t("nation"), t("customer"), t("supplier"),
        t("orders"), t("lineitem"),
    )
    assert plans.summarize(q5).sort_merge_joins == 0
    q18 = etl.large_volume_customers(t("customer"), t("orders"), t("lineitem"))
    assert plans.summarize(q18).broadcast_joins >= 1


def test_filtered_topk_label_pushdown(spark):
    """Metadata-filtered ANN: the label predicate must reach the parquet
    scan (at production layout it becomes partition pruning) — not run as
    a post-scan filter over the full corpus."""
    from data_pipeline_zeal_spark.operators import similarity

    df = similarity.filtered_topk(
        load_table(spark, SF_SMALL, "embeddings"), list(range(5)), labels=[0, 1]
    )
    p = plans.summarize(df)
    pushed = " | ".join(p.pushed_filters)
    assert "label" in pushed and "In" in pushed


def test_basket_pairs_equality_join_no_cartesian(spark):
    """Market-basket self-join must plan as an equality join on
    l_orderkey (hash/SMJ), never a cartesian/nested-loop — the pair
    fan-out is bounded by basket size only if the join key reaches the
    join operator."""
    df = etl.part_basket_pairs(load_table(spark, SF_SMALL, "lineitem"))
    simple = plans.explain_mode(df, "simple")
    assert "CartesianProduct" not in simple
    assert "BroadcastNestedLoopJoin" not in simple
    assert "l_orderkey" in simple


def test_weighted_sample_is_take_ordered(spark):
    """A-ES top-k must be TakeOrderedAndProject (per-partition heaps),
    not a global sort of the corpus."""
    from data_pipeline_zeal_spark.operators import corpus

    df = corpus.weighted_sample(load_table(spark, SF_SMALL, "documents"), k=50)
    p = plans.summarize(df)
    assert p.has_take_ordered


def test_unpivot_is_expand_not_join(spark):
    """Unpivot must expand inline — no join against a names table and no
    repeated scans of events."""
    from data_pipeline_zeal_spark.operators import relational

    df = relational.hour_pivot_unpivot(load_table(spark, SF_SMALL, "events"), hours=8)
    simple = plans.explain_mode(df, "simple")
    assert simple.count("Scan parquet") == 1
    assert "Expand" in simple


def test_unigram_logprob_scalar_total_is_broadcast(spark):
    """The 1-row corpus total must attach via a broadcast join (no shuffle
    of the token stream against a singleton)."""
    from data_pipeline_zeal_spark.operators import text

    df = text.unigram_logprob(load_table(spark, SF_SMALL, "documents"))
    simple = plans.explain_mode(df, "simple")
    assert "BroadcastNestedLoopJoin" in simple or "BroadcastHashJoin" in simple


def test_rfm_and_deciles_scale_mode_has_no_global_window(spark):
    """The approx quantile path must carry NO single-partition exchange —
    ntile's global sort is the one-reducer bottleneck the scale mode
    exists to remove (every row of the per-customer aggregate would
    otherwise funnel through one task).  The exact path keeps it as the
    oracle anchor; auto flips on row count."""
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer")

    exact = plans.summarize(etl.rfm_segments(orders, method="exact"))
    assert exact.global_windows >= 1  # the smell, pinned

    approx = plans.summarize(etl.rfm_segments(orders, method="approx"))
    assert approx.global_windows == 0

    approx_d = plans.summarize(
        etl.customer_spend_deciles(customer, orders, method="approx")
    )
    assert approx_d.global_windows == 0


def test_rfm_and_deciles_approx_matches_exact_shape(spark):
    """Approx and exact modes must agree on schema and bucket domain —
    same output contract, different physical strategy."""
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer")

    exact = etl.rfm_segments(orders, method="exact")
    approx = etl.rfm_segments(orders, method="approx")
    assert exact.columns == approx.columns
    rows = approx.collect()
    assert rows and all(
        1 <= r.r_quartile <= 4 and 1 <= r.f_quartile <= 4 and 1 <= r.m_quartile <= 4
        for r in rows
    )

    exact_d = etl.customer_spend_deciles(customer, orders, method="exact")
    approx_d = etl.customer_spend_deciles(customer, orders, method="approx")
    assert exact_d.columns == approx_d.columns
    drows = approx_d.collect()
    assert drows and {r.decile for r in drows} <= set(range(1, 11))
    # every customer lands in exactly one decile in both modes
    assert sum(r.n_customers for r in drows) == sum(
        r.n_customers for r in exact_d.collect()
    )


def test_no_unreviewed_nested_loop_joins_anywhere(spark):
    """Engine-wide invariant: a BroadcastNestedLoopJoin / CartesianProduct
    may appear ONLY where one side is bounded — 1-row scalar broadcasts
    (corpus totals, thresholds), bounded broadcast query sets (similarity
    probes), or the documented exact O(n²) verification kernels.  The
    allowlist pins today's reviewed set with counts; any new theta join
    sneaking into any registered query fails here before it ships."""
    import __spark_entry__ as em

    ALLOWED = {
        # 1-row scalar broadcast attaches
        "corpus_mixture_weights": 1,
        "corpus_temperature_mix": 2,  # total + power-sum 1-row broadcasts
        "corpus_epoch_plan": 1,  # power-sum normalizer 1-row broadcast
        "corpus_source_divergence": 1,
        "text_unigram_logprob": 1,
        "text_source_fair_quality": 1,  # same 1-row total broadcast
        "text_bigram_logprob": 1,  # 1-row vocabulary-size broadcast
        # 1-row tertile-cutoff broadcast (the bigram-LM vocab broadcast
        # sits behind the score-frame localCheckpoint)
        "corpus_perplexity_filter": 1,
        # 1-row (t_raw, t_tgt) smoothing-totals broadcast
        "corpus_dsir_weights": 1,
        "text_tfidf_top_terms": 1,
        # 1-row (n_docs, avgdl) corpus-stats broadcast on the BM25 postings
        "text_bm25_topk": 1,
        "retrieval_quality": 1,  # same run subplan
        "retrieval_hard_negatives": 1,  # same run subplan
        # the amortized composition references the persisted run subplan
        # from BOTH consumers, so the 1-row stats broadcast shows twice
        # in the analyzed plan; at execution the run is one cached frame
        "retrieval_pipeline": 2,
        # (dedup_bcubed_norm_vs_jaccard's exact clustering kernel sits
        # behind connected_components' eager localCheckpoint, so its
        # registered plan carries no nested loop — auto flips the
        # candidate kernel to LSH at scale, the semdedup pattern)
        # (text_doc_similarity's 1-row n_docs crossJoin sits behind the
        # postings localCheckpoint, so the registered plan carries none)
        "tpch_q11_important_parts": 1,
        "tpch_q22_idle_customers": 1,
        "dq_audit": 2,
        "orders_pareto_share": 2,  # one 1-row total broadcast per k
        # 1-row n_baskets denominator broadcast
        "basket_rules": 1,
        # bounded broadcast query/centroid sets
        "sim_cosine_topk": 1,
        "sim_matryoshka_topk": 1,  # coarse-stage query-set broadcast
        "sim_filtered_topk": 1,
        "sim_centroid_pairs": 1,
        "sim_knn_label": 1,
        "sim_ivf_topk": 1,
        "sim_pq_topk": 1,
        "sim_ivf_pq_topk": 1,  # same broadcast query-set shape as pq_topk
        # hybrid fusion: the vector run is the bounded broadcast
        # query-set theta join (the sim_cosine_topk kernel) plus the
        # BM25 side's 1-row (n_docs, avgdl) corpus-stats broadcast
        "retrieval_hybrid_rrf": 2,
        # documented exact O(n²) verification kernels
        "dedup_jaccard_pairs": 1,
        "dedup_embedding_near": 1,
        # bounded dense-grid builds (broadcast hours x broadcast types —
        # grid size is #hours x #types, independent of event volume)
        "events_hourly_gapfill": 1,
        "events_hourly_interpolate": 1,
        # 1-row x 1-row scalar assembly of the census summary
        "part_triangle_census": 2,
    }
    hits = {}
    for name, fn in em.queries().items():
        # audit EVERY plan on a clean cache: persisted frames (the
        # retrieval runs — retrieval_pipeline eagerly fills the vector
        # run since r10) print their child plan inside InMemoryRelation
        # and would skew later queries' operator counts
        spark.catalog.clearCache()
        simple = plans.explain_mode(fn(spark, SF_SMALL), "simple")
        n = simple.count("BroadcastNestedLoopJoin") + simple.count(
            "CartesianProduct"
        )
        if n:
            hits[name] = n
    assert hits == ALLOWED


def test_pagerank_broadcasts_rank_frame_when_small(spark):
    """While |V| fits the broadcast budget the per-iteration joins must
    broadcast the rank frame (the transition frame never moves); past the
    budget they fall back to hash exchanges."""
    from data_pipeline_zeal_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)], "src long, dst long, weight double"
    )
    small = plans.explain_mode(graph.pagerank(edges, iterations=2), "simple")
    assert small.count("BroadcastHashJoin") >= 4  # 2 joins x 2 iterations

    big = plans.explain_mode(
        graph.pagerank(edges, iterations=2, broadcast_nodes_max=0), "simple"
    )
    assert big.count("BroadcastHashJoin") < small.count("BroadcastHashJoin")


def test_ship_latency_modes_share_schema(spark):
    """Exact and approx latency modes must agree on schema and bucket
    counts — same contract, sketch-backed physical strategy at scale."""
    orders = load_table(spark, SF_SMALL, "orders")
    lineitem = load_table(spark, SF_SMALL, "lineitem")
    exact = etl.order_ship_latency(orders, lineitem, method="exact")
    approx = etl.order_ship_latency(orders, lineitem, method="approx")
    assert exact.columns == approx.columns
    e = {r.o_orderpriority: r for r in exact.collect()}
    a = {r.o_orderpriority: r for r in approx.collect()}
    assert set(e) == set(a)
    for k in e:
        assert e[k].n_lines == a[k].n_lines
        # exact interpolates between data points, the sketch returns a real
        # one — allow a small absolute or relative gap
        assert abs(e[k].p50_days - a[k].p50_days) <= max(
            5.0, 0.05 * e[k].p50_days
        )


def test_duplicated_spans_hash_keyed_no_cartesian(spark):
    """The window-count exchange must carry the 8-byte xxhash64 key, never
    the window text itself, and the whole plan must be equality-joined
    (hash count -> per-doc re-aggregation), with no nested loop and no
    global window."""
    from data_pipeline_zeal_spark.operators import text

    df = text.duplicated_spans(load_table(spark, SF_SMALL, "documents"), n=20)
    p = plans.summarize(df)
    assert p.nested_loop_joins == 0
    assert p.global_windows == 0
    simple = plans.explain_mode(df, "simple")
    assert "xxhash64" in simple  # the slim grouping key exists in the plan
    assert "CartesianProduct" not in simple


def test_gopher_flags_zero_shuffle(spark):
    """Per-document rule evaluation is a pure projection: no exchange at
    all before the (orderBy-driven) range partitioning for output."""
    from data_pipeline_zeal_spark.operators import text

    df = text.gopher_flags(load_table(spark, SF_SMALL, "documents"))
    p = plans.summarize(df)
    # the only exchange allowed is the rangepartitioning for orderBy
    assert p.shuffles <= 1
    assert p.nested_loop_joins == 0 and p.global_windows == 0
