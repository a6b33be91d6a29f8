"""Count-min sketch laws: one-sided error, exactness at low load factor,
and additive mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import sketch

from tests.conftest import SF_SMALL


def _exact(df, col):
    return {
        r.item: r.c
        for r in df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("item"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }


def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    ev = load_table(spark, SF_SMALL, "events")
    cms = sketch.cms_build(ev, "user_id")
    est = {
        r.item: r.est
        for r in sketch.cms_estimate(cms, ev, "user_id").collect()
    }
    exact = _exact(ev, "user_id")
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)  # one-sided error law
    # at fixture cardinality << width the sketch is collision-free
    assert est == exact


def test_cms_unseen_item_estimates_zero(spark):
    ev = load_table(spark, SF_SMALL, "events")
    cms = sketch.cms_build(ev, "user_id")
    ghosts = spark.createDataFrame([("no-such-user-xyz",)], "user_id string")
    [r] = sketch.cms_estimate(cms, ghosts, "user_id").collect()
    assert r.est == 0


def test_cms_merge_law(spark):
    """sketch(A) + sketch(B) == sketch(A ∪ B) for disjoint slices."""
    ev = load_table(spark, SF_SMALL, "events")
    a = ev.filter(F.dayofmonth("ts") <= 15)
    b = ev.filter(F.dayofmonth("ts") > 15)
    merged = sketch.cms_merge(
        sketch.cms_build(a, "user_id"), sketch.cms_build(b, "user_id")
    )
    whole = sketch.cms_build(ev, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_cms_overestimates_under_collision_pressure(spark):
    """At width << cardinality, collisions must inflate estimates — never
    deflate them (the one-sided error bound under pressure, not just in
    the comfortable regime)."""
    ev = load_table(spark, SF_SMALL, "events")
    cms = sketch.cms_build(ev, "user_id", depth=2, width=4)
    est = {
        r.item: r.est
        for r in sketch.cms_estimate(cms, ev, "user_id", depth=2, width=4).collect()
    }
    exact = _exact(ev, "user_id")
    assert all(est[k] >= exact[k] for k in exact)
    assert any(est[k] > exact[k] for k in exact)  # collisions really occurred
