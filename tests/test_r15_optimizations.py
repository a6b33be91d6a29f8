"""Pins for the r15 optimization internals: the DV-only matview delta,
the Arrow trainer kernels' assignment parity, and the tie-distance audit
that licenses the numpy argmax (r14 verdict #2)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import local_frame

REPO = Path(__file__).resolve().parent.parent


def _mk_table(spark, path):
    from data_pipeline_zeal_spark.sources import versioned as V

    rows = [(i, f"t{i % 3}", float(i)) for i in range(60)]
    V.commit_write(
        local_frame(spark, rows, "event_id long, event_type string, value double"),
        path,
        mode="overwrite",
    )
    return path


def test_dv_only_deleted_rows_matches_change_feed(spark, tmp_path):
    from data_pipeline_zeal_spark.sources import versioned as V

    t = _mk_table(spark, str(tmp_path / "t"))
    v0 = V.latest_version(t)
    V.delete_where_dv(spark, t, [("event_id", "<", 20)])
    v1 = V.latest_version(t)

    fast = V.dv_only_deleted_rows(spark, t, v0, v1)
    assert fast is not None
    got = sorted(
        (r.event_id, r.event_type, r.value)
        for r in fast.select("event_id", "event_type", "value").collect()
    )
    feed = V.change_feed(spark, t, v0, v1, ["event_id"])
    exp = sorted(
        (r.event_id, r.old_values.event_type, r.old_values.value)
        for r in feed.filter(F.col("change") == "delete").collect()
    )
    assert got == exp
    assert all(r.change == "delete" for r in feed.collect())


def test_dv_only_returns_none_on_mixed_range(spark, tmp_path):
    from data_pipeline_zeal_spark.sources import versioned as V

    t = _mk_table(spark, str(tmp_path / "t"))
    v0 = V.latest_version(t)
    V.delete_where_dv(spark, t, [("event_id", "<", 5)])
    V.commit_write(
        local_frame(spark, [(100, "t0", 1.0)],
                    "event_id long, event_type string, value double"),
        t,
        mode="append",
    )
    v2 = V.latest_version(t)
    assert V.dv_only_deleted_rows(spark, t, v0, v2) is None
    # empty range is not a DV delta either
    assert V.dv_only_deleted_rows(spark, t, v2, v2) is None


def test_tie_gap_audit_licenses_kernel_argmax():
    """The numpy-argmax trainer kernels are only value-equal to the JVM
    fold form if no assignment sits within float-reassociation distance
    of a tie — replay the registered trainer trajectories on the small
    fixture and assert the audited margin."""
    sys.path.insert(0, str(REPO / "tools"))
    import tie_gap_audit as audit

    ids, X = audit._load("/root/testdata/sf0.001")
    assert audit.audit_kmeans(ids, X) > 1000 * audit.REASSOC_BOUND
    assert audit.audit_pq(ids, X) > 1000 * audit.REASSOC_BOUND


def test_kmeans_kernel_partials_match_jvm_aggregate(spark):
    """One kernel iteration's folded (sum, count) must equal the old
    posexplode + groupBy(cell, pos) aggregate on the same centroids."""
    import numpy as np

    from data_pipeline_zeal_spark.functions.vector import dot as _dot
    from data_pipeline_zeal_spark.operators import similarity as S

    rows = [(i, [float((i * 7 + j * 3) % 11) / 10.0 for j in range(8)])
            for i in range(50)]
    X = local_frame(spark, rows, "vec_id long, v array<double>")
    C = S._norm_rows(
        np.array([r[1] for r in rows[:4]], dtype=np.float64)
    )
    partials = X.select("v").mapInPandas(
        S._kmeans_partials_kernel(C, normalize=True),
        "cell int, n long, s array<double>",
    ).collect()
    sums = np.zeros_like(C)
    counts = np.zeros(len(C), dtype=np.int64)
    for r in partials:
        if r.n:
            counts[r.cell] += r.n
            sums[r.cell] += np.asarray(r.s)

    # reference: the r14 JVM form over the normalized frame
    from data_pipeline_zeal_spark.functions.vector import norm

    nrm = norm(F.col("v"))
    Xn = X.withColumn(
        "__nrm", F.when(nrm == 0, F.lit(1.0)).otherwise(nrm)
    ).select(
        "vec_id", F.transform("v", lambda x: x / F.col("__nrm")).alias("v")
    )
    scored = F.array(
        *[
            F.struct(
                _dot(F.col("v"), F.lit([float(x) for x in c])).alias("d"),
                F.lit(-j).alias("negcell"),
            )
            for j, c in enumerate(C)
        ]
    )
    cell = (-F.array_max(scored)["negcell"]).cast("int")
    stats = (
        Xn.select(cell.alias("cell"), "v")
        .select("cell", F.posexplode("v"))
        .groupBy("cell", "pos")
        .agg(F.sum("col").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    ref_counts = np.zeros(len(C), dtype=np.int64)
    ref_sums = np.zeros_like(C)
    for r in stats:
        ref_counts[r.cell] = r.n
        ref_sums[r.cell][r.pos] = r.s
    assert (counts == ref_counts).all()
    assert np.allclose(sums, ref_sums, atol=1e-9)


def test_load_table_schema_cache_matches_inference(spark):
    """load_table's pinned-schema read must be schema- and value-equal
    to bare inference (the cache is metadata-only, keyed on the file's
    stat identity)."""
    from data_pipeline_zeal_spark.io import load_table, table_path

    sf = "/root/testdata/sf0.001"
    df = load_table(spark, sf, "nation")
    raw = spark.read.parquet(table_path(sf, "nation"))
    assert df.schema == raw.schema
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, raw.collect()))
    # events carries the nano-ts conversion on top of the cached schema
    ev = load_table(spark, sf, "events")
    assert str(ev.schema["ts"].dataType) == "TimestampType()"
