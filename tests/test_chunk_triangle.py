"""Semantic corners of the round-4 additions: RAG chunking boundaries,
n-gram novelty, and the degree-oriented triangle census (oracle parity is
covered by test_oracle_parity.py; these pin what SQL parity can't —
boundary fan-out arithmetic, coverage, and exact counts on known graphs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.operators import graph, text


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_chunk_counts_at_boundaries(spark):
    w, s = 4, 3
    docs = _docs(
        spark,
        [
            "",  # empty: no chunks
            "a b c",  # n < w: one chunk
            "a b c d",  # n == w: one chunk
            "a b c d e",  # n == w+1: two chunks (second covers the tail)
            "a b c d e f g h",  # n == w + s + 1: three chunks
        ],
    )
    out = text.chunk_overlap(docs, window=w, stride=s)
    per_doc = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc == {1: 1, 2: 1, 3: 2, 4: 3}


def test_chunk_coverage_and_overlap(spark):
    docs = _docs(spark, [" ".join(f"t{i}" for i in range(10))])
    rows = sorted(
        text.chunk_overlap(docs, window=4, stride=3).collect(),
        key=lambda r: r.chunk_index,
    )
    # starts advance by the stride and the last chunk reaches token 10
    assert [r.start_token for r in rows] == [1, 4, 7]
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 4]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[-1].chunk_text.endswith("t9")
    # consecutive chunks share window - stride tokens
    assert rows[0].chunk_text.split()[3:] == rows[1].chunk_text.split()[:1]
    # deterministic, distinct chunk keys
    assert len({r.chunk_key for r in rows}) == 3


def test_chunk_rejects_bad_stride(spark):
    docs = _docs(spark, ["a b c"])
    with pytest.raises(ValueError):
        text.chunk_overlap(docs, window=4, stride=0)
    with pytest.raises(ValueError):
        text.chunk_overlap(docs, window=4, stride=5)


def test_ngram_novelty_first_occurrence_wins(spark):
    docs = _docs(
        spark,
        [
            "a b c d",      # doc 0: shingles {a b c, b c d} — all novel
            "a b c d",      # doc 1: exact repeat — nothing novel
            "a b c x y z",  # doc 2: {a b c, b c x, c x y, x y z} — 3 of 4 novel
        ],
    )
    out = {r.doc_id: r for r in text.ngram_novelty(docs, n=3).collect()}
    assert (out[0].n_shingles, out[0].n_novel) == (2, 2)
    assert out[0].novelty == 1.0
    assert (out[1].n_shingles, out[1].n_novel) == (2, 0)
    assert out[1].novelty == 0.0
    assert (out[2].n_shingles, out[2].n_novel) == (4, 3)
    assert out[2].novelty == 0.75


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_census_known_graphs(spark):
    # K4: 4 nodes, 6 edges, 4 triangles, 12 wedges, clustering 1.0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = graph.triangle_stats(_edges(spark, k4)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (4, 6, 12, 4)
    assert row.clustering_coefficient == 1.0

    # path graph 0-1-2-3: no triangles, 2 wedges
    path = [(0, 1), (1, 2), (2, 3)]
    row = graph.triangle_stats(_edges(spark, path)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (4, 3, 2, 0)
    assert row.clustering_coefficient == 0.0


def test_triangle_census_canonicalizes_input(spark):
    # duplicated edges, reversed direction, and a self-loop all collapse
    noisy = [(0, 1), (1, 0), (1, 2), (2, 0), (0, 0), (1, 2)]
    row = graph.triangle_stats(_edges(spark, noisy)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (3, 3, 1)


def test_order_backlog_timeline_sweep(spark):
    from data_pipeline_zeal_spark.operators import etl
    import datetime

    d = lambda day: datetime.datetime(2024, 1, day)  # noqa: E731
    orders = spark.createDataFrame(
        [(1, d(1)), (2, d(1)), (3, d(3)), (9, d(9))],
        "o_orderkey long, o_orderdate timestamp",
    )
    # order 1 ships on day 2 (two lines, last one wins), order 2 on day 4,
    # order 3 on day 3 (same-day close); order 9 has no lines -> never opens
    lineitem = spark.createDataFrame(
        [(1, d(1)), (1, d(2)), (2, d(4)), (3, d(3))],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = {
        r.day.day: (r.n_opened, r.n_closed, r.backlog)
        for r in etl.order_backlog_timeline(orders, lineitem).collect()
    }
    assert out == {
        1: (2, 0, 2),  # orders 1,2 open
        2: (0, 1, 1),  # order 1 closes
        3: (1, 1, 1),  # order 3 opens and closes same day
        4: (0, 1, 0),  # order 2 closes
    }


def test_triangle_census_empty_and_selfloop_only(spark):
    row = graph.triangle_stats(_edges(spark, [(5, 5)])).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (0, 0, 0, 0)
    assert row.clustering_coefficient == 0.0


def test_doc_similarity_identical_docs_and_pruning(spark):
    shared = "alpha beta gamma delta"
    docs = _docs(
        spark,
        [
            shared,                      # 0 and 1 identical -> sim 1.0
            shared,
            shared + " epsilon",         # 2: shares epsilon with 3 (df=2)
            "epsilon zeta eta theta",    # 3: rest are df=1 -> pruned
        ],
    )
    out = text.doc_similarity_topk(docs, k=3, max_df_ratio=0.95)
    rows = {(r.doc_a, r.doc_b): (r.sim, r.rank) for r in out.collect()}
    assert rows[(0, 1)][0] == 1.0 and rows[(0, 1)][1] == 1
    assert rows[(1, 0)][0] == 1.0
    # epsilon survives pruning (df=2), so doc 2 differs from 0/1 but is
    # still their nearest non-identical neighbor
    assert 0.5 < rows[(0, 2)][0] < 1.0
    # doc 3's only surviving token is epsilon -> pairs with doc 2 alone,
    # and after normalization its vector IS the epsilon axis
    assert (3, 2) in rows and rows[(3, 2)][1] == 1
    assert not any({a, b} == {0, 3} for (a, b) in rows)


def test_variance_decomposition_hand_computed(spark):
    from data_pipeline_zeal_spark.operators import relational

    # A: [1, 3] mean 2; B: [5, 7] mean 6; grand 4
    # SSB = 2*(2-4)^2 + 2*(6-4)^2 = 16; SSW = 1+1+1+1 = 4
    # F = (16/1)/(4/2) = 8; eta^2 = 16/20 = 0.8
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 3.0), ("B", 5.0), ("B", 7.0)],
        "g string, x double",
    )
    row = relational.variance_decomposition(df, "g", "x").collect()[0]
    assert (row.n_groups, row.n_rows) == (2, 4)
    assert row.ss_between == 16.0 and row.ss_within == 4.0
    assert row.f_stat == 8.0 and row.eta_sq == 0.8


def test_stickiness_trailing_window(spark):
    import datetime

    from data_pipeline_zeal_spark.operators import events_ext

    d = lambda day, u: (u * 100 + day, datetime.datetime(2024, 1, day), u)  # noqa: E731
    rows = [
        d(1, 1), d(1, 2),   # day 1: users {1,2}
        d(2, 1),            # day 2: user {1}
        d(4, 3),            # day 4: user {3}
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, "click", 1.0, None) for i, ts, u in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.day.day: (r.dau, r.mau, r.stickiness)
        for r in events_ext.stickiness(ev, window_days=3).collect()
    }
    # day 1: window {day1} -> users {1,2}; day 2: {1,2} from d1 + {1} = {1,2};
    # day 4: d2..d4 -> {1} from d2 + {3} = {1,3}
    assert out[1] == (2, 2, 1.0)
    assert out[2] == (1, 2, 0.5)
    assert out[4] == (1, 2, 0.5)
    assert 3 not in out  # no activity on day 3 -> no row


def test_supplier_hhi_shares(spark):
    from data_pipeline_zeal_spark.operators import etl

    li = spark.createDataFrame(
        # part 1: 3:1 split -> hhi 0.625; part 2: single supplier -> 1.0
        [(1, 10, 30.0), (1, 11, 10.0), (2, 10, 5.0)],
        "l_partkey long, l_suppkey long, l_quantity double",
    )
    out = {r.l_partkey: r for r in etl.supplier_concentration(li).collect()}
    assert out[1].n_suppliers == 2 and out[1].hhi == 0.625
    assert out[2].n_suppliers == 1 and out[2].hhi == 1.0


def test_hour_uniformity_closed_form(spark):
    import datetime

    from data_pipeline_zeal_spark.operators import events_ext

    # 24 events all at hour 7: exp = 1/hour, chi2 = (24-1)^2/1 + 23*1 = 552
    ev = spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, 1 + i, 7, 0), 1, "click", 1.0, None)
            for i in range(24)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    row = events_ext.hour_uniformity(ev).collect()[0]
    assert (row.n_events, row.hours_active, row.peak_hour) == (24, 1, 7)
    assert row.chi_square == 552.0
