"""Unit semantics for the CDC merge kernels, the PageRank kernel, and the
cross-document boilerplate profile (oracle parity is covered separately by
test_oracle_parity.py; these pin the semantic corners SQL parity can't
reach: tie precedence, rank-mass conservation, plan shape)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.operators import cdc, corpus, graph


def _ts(day: int, hour: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, hour)


@pytest.fixture()
def changes(spark):
    rows = [
        # key (1, 'a'): three versions, latest day 3
        (1, "a", 10, _ts(1), 1.0),
        (1, "a", 11, _ts(2), 2.0),
        (1, "a", 12, _ts(3), 3.0),
        # key (2, 'b'): same ts twice -> tiebreak on id
        (2, "b", 20, _ts(5), 5.0),
        (2, "b", 21, _ts(5), 6.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, ts timestamp, value double"
    )


def test_latest_snapshot_picks_latest_and_tiebreaks(changes):
    out = cdc.latest_snapshot(
        changes, keys=["user_id", "event_type"], order_col="ts", tiebreak="event_id"
    )
    got = {(r.user_id, r.event_type): (r.event_id, r.value) for r in out.collect()}
    assert got == {(1, "a"): (12, 3.0), (2, "b"): (21, 6.0)}


def test_merge_latest_delta_wins_exact_tie(spark):
    """A delta row carrying the SAME (order, tiebreak) as a base row must
    replace it — upsert semantics, enforced by the injected source bit."""
    base = spark.createDataFrame(
        [(1, 100, _ts(1), "old")], "k long, ver long, ts timestamp, payload string"
    )
    delta = spark.createDataFrame(
        [(1, 100, _ts(1), "new")], "k long, ver long, ts timestamp, payload string"
    )
    out = cdc.merge_latest(base, delta, keys=["k"], order_col="ts", tiebreak="ver")
    rows = out.collect()
    assert len(rows) == 1 and rows[0].payload == "new"


def test_merge_latest_inserts_unmatched_keys(spark):
    base = spark.createDataFrame([(1, _ts(1), "b1")], "k long, ts timestamp, v string")
    delta = spark.createDataFrame([(2, _ts(2), "d2")], "k long, ts timestamp, v string")
    out = cdc.merge_latest(base, delta, keys=["k"], order_col="ts")
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "b1", 2: "d2"}


def test_merge_latest_composes_as_new_snapshot(spark):
    """merge(merge(base, d1), d2) == latest over base+d1+d2 — the property
    an incremental compaction loop relies on."""
    base = spark.createDataFrame([(1, _ts(1), 1.0)], "k long, ts timestamp, v double")
    d1 = spark.createDataFrame([(1, _ts(2), 2.0)], "k long, ts timestamp, v double")
    d2 = spark.createDataFrame(
        [(1, _ts(3), 3.0), (2, _ts(1), 9.0)], "k long, ts timestamp, v double"
    )
    snap = cdc.merge_latest(cdc.merge_latest(base, d1, ["k"], "ts"), d2, ["k"], "ts")
    got = {r.k: r.v for r in snap.collect()}
    assert got == {1: 3.0, 2: 9.0}


def test_cdc_plan_has_no_window_sort(changes):
    """The latest-wins kernel must compile to an aggregate (max_by), never
    a per-partition window sort — the 100 TB design point."""
    out = cdc.latest_snapshot(changes, ["user_id"], "ts", "event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "max_by" in plan or "MaxBy" in plan or "HashAggregate" in plan


def test_pagerank_mass_conserved_and_symmetric(spark):
    """On a symmetric graph rank mass stays ~1 and a structurally more
    central node outranks leaves."""
    # star: 1 <-> 2, 1 <-> 3, 1 <-> 4 (symmetrized)
    edges = [(1, i, 1.0) for i in (2, 3, 4)] + [(i, 1, 1.0) for i in (2, 3, 4)]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    ranks = {r.node: r.rank for r in graph.pagerank(e, iterations=5).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks[1] > ranks[2] == pytest.approx(ranks[3])


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle is rank-uniform at every iteration count."""
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0)], "src long, dst long, weight double"
    )
    ranks = [r.rank for r in graph.pagerank(e, iterations=4).collect()]
    assert all(r == pytest.approx(1.0 / 3.0) for r in ranks)


def test_boilerplate_profile_flags_shared_grams(spark):
    """A trigram shared by >= min_docs documents is boilerplate; a unique
    tail is not; docs shorter than n yield zero grams and frac 0."""
    docs = spark.createDataFrame(
        [
            (1, "click here to subscribe now"),
            (2, "click here to unsubscribe later"),
            (3, "click here to win prizes"),
            (4, "totally original content piece"),
            (5, "xy"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_grams, r.n_boilerplate, r.boilerplate_frac)
        for r in corpus.boilerplate_profile(docs, n=3, min_docs=3).collect()
    }
    # "click here to" appears in docs 1-3 -> boilerplate; their other
    # trigrams are unique.
    assert out[1] == (3, 1, round(1 / 3, 6))
    assert out[4] == (2, 0, 0.0)
    assert out[5] == (0, 0, 0.0)


def test_scd2_intervals_chain_and_current_flag(changes):
    hist = cdc.scd2_intervals(
        changes, keys=["user_id", "event_type"], order_col="ts", tiebreak="event_id"
    )
    rows = sorted(
        hist.filter(F.col("user_id") == 1).collect(), key=lambda r: r.valid_from
    )
    # intervals chain: each valid_to == next valid_from; only last is open
    assert [r.event_id for r in rows] == [10, 11, 12]
    assert rows[0].valid_to == rows[1].valid_from
    assert rows[1].valid_to == rows[2].valid_from
    assert [r.is_current for r in rows] == [False, False, True]
    assert rows[2].valid_to is None


def test_pagerank_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long, weight double")
    assert graph.pagerank(edges).count() == 0


def test_scd2_point_in_time_join(changes):
    """Each fact attaches the dimension version valid AT its timestamp;
    facts before the first version or on unknown keys stay NULL."""
    hist = cdc.scd2_intervals(
        changes, keys=["user_id", "event_type"], order_col="ts", tiebreak="event_id"
    )
    spark = changes.sparkSession
    facts = spark.createDataFrame(
        [
            (1, "a", _ts(1, 12)),   # inside v1 [day1, day2)
            (1, "a", _ts(2)),       # valid_from inclusive -> v2
            (1, "a", _ts(9)),       # open current version -> v3
            (1, "a", _ts(1) - datetime.timedelta(hours=1)),  # before first
            (9, "z", _ts(2)),       # unknown key
        ],
        "user_id long, event_type string, fts timestamp",
    )
    out = cdc.scd2_point_in_time_join(
        facts, hist, keys=["user_id", "event_type"], fact_ts="fts",
        dim_values=["value", "is_current"],
    )
    got = {(r.user_id, r.event_type, r.fts): (r.value, r.is_current)
           for r in out.collect()}
    assert got[(1, "a", _ts(1, 12))] == (1.0, False)
    assert got[(1, "a", _ts(2))] == (2.0, False)
    assert got[(1, "a", _ts(9))] == (3.0, True)
    assert got[(1, "a", _ts(1) - datetime.timedelta(hours=1))] == (None, None)
    assert got[(9, "z", _ts(2))] == (None, None)
    assert out.count() == 5  # exactly one row per fact


def test_table_diff_classifies_and_drops_unchanged(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (3, "c", None), (5, "e", 5.0)],
        "k long, name string, v double",
    )
    out = {r.k: r.change for r in cdc.table_diff(old, new, keys=["k"]).collect()}
    # k=1 identical -> dropped; k=3 identical including NULL payload -> dropped
    assert out == {2: "update", 4: "delete", 5: "insert"}


def test_table_diff_payload_structs_carry_both_sides(spark):
    old = spark.createDataFrame([(2, 2.0)], "k long, v double")
    new = spark.createDataFrame([(2, 9.0)], "k long, v double")
    r = cdc.table_diff(old, new, keys=["k"]).collect()[0]
    assert (r.old_values.v, r.new_values.v) == (2.0, 9.0)


def test_table_diff_apply_roundtrip(spark):
    """apply_diff(old, table_diff(old, new)) == new — the change-feed
    contract, exact to the row."""
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "k long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 9.0), (3, "x", None), (5, "e", 5.0)],
        "k long, name string, v double",
    )
    rebuilt = cdc.apply_diff(old, cdc.table_diff(old, new, keys=["k"]), keys=["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_attribution_window_boundaries(spark):
    """First-touch: a click exactly at ts - window is IN, exactly at ts is
    IN (at-or-before), after ts is OUT; earliest click wins with event_id
    tiebreak."""
    from data_pipeline_zeal_spark.operators import events_ext

    rows = [
        # purchase at 12:00 Jan 2
        ("p1", "u1", "purchase", _ts(2, 12)),
        ("c0", "u1", "click", _ts(1, 12)),              # exactly -24h: in
        ("c1", "u1", "click", _ts(1, 11)),              # older than window: out
        ("c2", "u1", "click", _ts(2, 12)),              # same instant: in
        ("c3", "u1", "click", _ts(2, 13)),              # future: out
        # second user, no clicks
        ("p2", "u2", "purchase", _ts(2, 12)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id string, user_id string, event_type string, ts timestamp"
    )
    out = {r.event_id: r for r in events_ext.first_touch_attribution(ev).collect()}
    assert out["p1"].first_click_id == "c0"   # earliest in-window click
    assert out["p1"].first_click_ts == _ts(1, 12)
    assert out["p2"].first_click_id is None

    lin = {r.user_id: r for r in events_ext.linear_attribution(ev).collect()}
    assert lin["u1"].n_clicks_credited == 2   # c0 and c2 share the credit
    assert lin["u1"].credit_mass == 1.0       # one purchase's worth
    assert "u2" not in lin                    # unattributed users absent


def test_table_diff_null_keys_roundtrip(spark):
    """NULL keys diff correctly (the join is null-safe for exactly this):
    identical NULL-key rows drop out, changed ones classify as update,
    and the apply roundtrip stays exact — no duplicate NULL-key rows."""
    old = spark.createDataFrame([(None, 1.0), (1, 2.0)], "k long, v double")
    same = spark.createDataFrame([(None, 1.0), (1, 2.0)], "k long, v double")
    assert cdc.table_diff(old, same, keys=["k"]).count() == 0

    new = spark.createDataFrame([(None, 9.0), (1, 2.0)], "k long, v double")
    d = cdc.table_diff(old, new, keys=["k"]).collect()
    assert len(d) == 1 and d[0].change == "update" and d[0].k is None

    rebuilt = cdc.apply_diff(old, cdc.table_diff(old, new, keys=["k"]), keys=["k"])
    assert sorted(map(tuple, rebuilt.collect()), key=repr) == sorted(
        map(tuple, new.collect()), key=repr
    )

    gone = spark.createDataFrame([(1, 2.0)], "k long, v double")
    d2 = {r.k: r.change for r in cdc.table_diff(old, gone, keys=["k"]).collect()}
    assert d2 == {None: "delete"}


def test_time_decay_attribution_weights(spark):
    """Decay weights: a same-instant click carries weight 1, a half-life-old
    click weight 0.5, shares sum to 1 per purchase (credit_mass == number
    of attributed purchases), boundary/future clicks behave as in the
    other attribution modes."""
    from data_pipeline_zeal_spark.operators import events_ext

    rows = [
        ("p1", "u1", "purchase", _ts(2, 12)),
        ("c1", "u1", "click", _ts(2, 12)),   # age 0h -> weight 1
        ("c2", "u1", "click", _ts(2, 6)),    # age 6h = half-life -> 0.5
        ("c3", "u1", "click", _ts(2, 13)),   # future: out
        ("p2", "u2", "purchase", _ts(2, 12)),  # no clicks: absent
    ]
    ev = spark.createDataFrame(
        rows, "event_id string, user_id string, event_type string, ts timestamp"
    )
    out = {
        r.user_id: r
        for r in events_ext.time_decay_attribution(
            ev, window_hours=24, half_life_hours=6.0
        ).collect()
    }
    assert set(out) == {"u1"}
    assert out["u1"].n_clicks_credited == 2
    assert out["u1"].credit_mass == 1.0          # shares normalize per purchase
    assert out["u1"].decay_weight_mass == 1.5    # 1 + 0.5


def test_markov_steady_state_laws(spark):
    """damping=1.0 pagerank over a transition matrix is Markov power
    iteration: mass is conserved (sum pi == 1) and iterating an already-
    stationary chain leaves it fixed (checked on a 2-state chain with
    known stationary distribution [1/3, 2/3])."""
    from data_pipeline_zeal_spark.operators import graph

    # P = [[0.5, 0.5], [0.25, 0.75]] -> pi = [1/3, 2/3]
    edges = spark.createDataFrame(
        [("a", "a", 0.5), ("a", "b", 0.5), ("b", "a", 0.25), ("b", "b", 0.75)],
        "src string, dst string, w double",
    )
    out = {
        r.node: r.rank
        for r in graph.pagerank(
            edges, iterations=30, damping=1.0, weight="w"
        ).collect()
    }
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert abs(out["a"] - 1 / 3) < 1e-6 and abs(out["b"] - 2 / 3) < 1e-6
