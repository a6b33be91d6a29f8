"""Measured scaling probes for the r11 lakehouse surfaces (round-11
verdict directive #5): three curves that SCALE.md claims qualitatively
and this tool pins numerically.

(a) DV read overhead — merge-on-read deletes are an anti-join at read
    time; measure read wall-clock as the live tombstone count grows
    from zero to 10% of the table (claim: overhead scales with the
    TOMBSTONE count, small at sane delete ratios, and maintain_table's
    dv-debt trigger exists precisely to cap it).
(b) Bloom bitmap log growth + probe selectivity at a 10x fixture —
    bitmap bytes per file are LAYOUT-bound (m_bits/8 per file per
    column) regardless of row count, so the commit-entry size grows
    with file count only, while point-probe selectivity holds (claim:
    ~1 KiB/file/col, kept files ~= 1 for present keys, 0 for absent).
(c) Matview refresh cost vs base size — refresh applies the delta,
    never the base; with a FIXED delta appended to bases growing 16x,
    refresh wall-clock must stay flat (claim: O(delta + |view|)).

Deterministic (spark.range-derived data); prints one JSON line per
measurement.  Paste the summary tables into SCALE.md when the numbers
change.

    python tools/lakehouse_scale_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _entry_bytes(table: str) -> int:
    log = os.path.join(table, "_log")
    return sum(
        os.path.getsize(os.path.join(log, f))
        for f in os.listdir(log)
        if f.endswith(".json")
    )


def main() -> None:
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.session import get_spark
    from data_pipeline_zeal_spark.sources import matview as MV
    from data_pipeline_zeal_spark.sources import versioned as V

    spark = get_spark(app_name="lakehouse-scale-probe")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # ---------------- (a) DV read overhead vs tombstone count ----------
    t = tempfile.mkdtemp(prefix="probe_dv_")
    try:
        n = 400_000
        base = spark.range(n).select(
            F.col("id"), (F.col("id") % 997).alias("k"),
            (F.col("id") * 3).alias("v"),
        )
        V.commit_write(base.repartition(8, "id"), t, mode="overwrite")
        t0 = time.perf_counter()
        force(V.read_version(spark, t))
        sec0 = time.perf_counter() - t0
        print(json.dumps({"op": "dv_read", "tombstones": 0,
                          "sec": round(sec0, 3)}), flush=True)
        for k_lt in (1, 10, 100):  # ~0.1%, ~1%, ~10% cumulative
            V.delete_where_dv(spark, t, [("k", "<", k_lt)])
            deleted = n - V.read_version(spark, t).count()
            t0 = time.perf_counter()
            force(V.read_version(spark, t))
            sec = time.perf_counter() - t0
            print(json.dumps({
                "op": "dv_read", "tombstones": deleted,
                "frac": round(deleted / n, 4),
                "sec": round(sec, 3), "vs_clean_x": round(sec / sec0, 2),
            }), flush=True)
    finally:
        shutil.rmtree(t, ignore_errors=True)

    # ------- (b) Bloom log growth + selectivity at 10x ------------------
    for rows, files, bits in (
        (50_000, 8, 8192),
        (500_000, 8, 8192),
        (500_000, 32, 8192),
        (50_000, 8, "auto"),
        (500_000, 8, "auto"),
    ):
        t = tempfile.mkdtemp(prefix="probe_bloom_")
        try:
            df = spark.range(rows).select(
                F.col("id").alias("key"), (F.col("id") * 7).alias("v")
            )
            base_t = tempfile.mkdtemp(prefix="probe_nobloom_")
            try:
                V.commit_write(df.repartition(files, "key"), base_t,
                               mode="overwrite")
                plain_bytes = _entry_bytes(base_t)
            finally:
                shutil.rmtree(base_t, ignore_errors=True)
            V.commit_write(
                df.repartition(files, "key"), t, mode="overwrite",
                bloom_cols=["key"], bloom_bits=bits,
            )
            bloom_bytes = _entry_bytes(t)
            _, kept_p, skip_p = V.pruned_paths(t, [("key", "=", rows // 2)])
            _, kept_a, skip_a = V.pruned_paths(t, [("key", "=", -5)])
            m = V._read_entry(t, V.latest_version(t))["bloom"]["m"]
            print(json.dumps({
                "op": "bloom", "rows": rows, "files": files,
                "bits": bits, "m_resolved": m,
                "entry_bytes_plain": plain_bytes,
                "entry_bytes_bloom": bloom_bytes,
                "bloom_bytes_per_file": round(
                    (bloom_bytes - plain_bytes) / files
                ),
                "present_kept": kept_p, "present_skipped": skip_p,
                "absent_kept": kept_a, "absent_skipped": skip_a,
            }), flush=True)
        finally:
            shutil.rmtree(t, ignore_errors=True)

    # ------- (c) matview refresh vs base size (fixed delta) -------------
    delta_n = 20_000
    for base_n in (100_000, 400_000, 1_600_000):
        bt = tempfile.mkdtemp(prefix="probe_mvb_")
        vt = tempfile.mkdtemp(prefix="probe_mvv_")
        try:
            mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
                F.col("id").alias("event_id"),
                (F.col("id") % 23).cast("string").alias("event_type"),
                (F.col("id") % 1000).cast("double").alias("value"),
            )
            V.commit_write(mk(0, base_n).repartition(8), bt, mode="overwrite")
            MV.create_matview(
                spark, bt, vt, ["event_type"],
                [("n", "count", None),
                 ("s", "sum", "CAST(value AS BIGINT)"),
                 ("mx", "max", "CAST(value AS BIGINT)")],
                keys=["event_id"],
            )
            V.commit_write(
                mk(base_n, base_n + delta_n).repartition(2), bt,
                mode="append",
            )
            t0 = time.perf_counter()
            rep = MV.refresh_matview(spark, vt)
            sec = time.perf_counter() - t0
            t0 = time.perf_counter()
            force(
                MV._partials(V.read_version(spark, bt), ["event_type"],
                             [("n", "count", None)])
            )
            full = time.perf_counter() - t0
            print(json.dumps({
                "op": "mv_refresh", "base_rows": base_n,
                "delta_rows": delta_n, "path": rep["path"],
                "refresh_sec": round(sec, 3),
                "full_recompute_sec": round(full, 3),
            }), flush=True)
        finally:
            shutil.rmtree(bt, ignore_errors=True)
            shutil.rmtree(vt, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
