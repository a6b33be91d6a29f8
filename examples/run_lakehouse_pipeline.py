"""Lakehouse operations demo — the round-11 table-format surface chained
the way a production ingest loop would run it:

  1. expectations-gated ingest: a poisoned events batch commits through
     the write-time quality gate; violating rows dead-letter to the
     quarantine table, violation counts land in commit meta,
  2. an incrementally-maintained materialized view over the table
     (count + integer-cents sum per event type), refreshed from the
     append delta — never a base rescan,
  3. a merge-on-read DV delete (GDPR drip) followed by a keyed-diff
     view refresh — still exactly equal to a recompute,
  4. auto-OPTIMIZE: maintain_table reads only the log, sees the
     tombstone debt, and settles it with one materializing compact
     (re-declaring the Bloom bitmaps through the rewrite),
  5. a Bloom-pruned point lookup (files kept vs the bloom-blind form),
  6. a bad overwrite undone by metadata-only RESTORE, and a zero-copy
     CLONE forked for an experiment,
  7. the quarantine drained under a relaxed ruleset (r12),
  8. one unified maintenance tick per structure (r12), and
  9. retention under the same tick (r13): expired-history debt measured
     from the log, vacuumed with floors persisted before deletion.

Every step asserts its own invariant, so the script doubles as an
executable tour.  Run:  python examples/run_lakehouse_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_zeal_spark.io import load_table  # noqa: E402
from data_pipeline_zeal_spark.session import get_spark  # noqa: E402
from data_pipeline_zeal_spark.sources import expectations as E  # noqa: E402
from data_pipeline_zeal_spark.sources import matview as MV  # noqa: E402
from data_pipeline_zeal_spark.sources import versioned as V  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

EXPECT = [
    ("value_non_negative", "value >= 0"),
    ("type_known", "event_type IS NOT NULL AND event_type != 'bogus'"),
]
MEASURES = [
    ("n_events", "count", None),
    ("sum_cents", "sum", "CAST(FLOOR(value * 100) AS BIGINT)"),
]


def main() -> None:
    spark = get_spark(app_name="lakehouse-demo")
    table = tempfile.mkdtemp(prefix="lake_")
    view = tempfile.mkdtemp(prefix="lake_view_")
    clone = tempfile.mkdtemp(prefix="lake_clone_")
    try:
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "event_type", "value"
        )
        poisoned = ev.withColumn(
            "event_type",
            F.when(F.col("event_id") % 97 == 0, F.lit("bogus")).otherwise(
                F.col("event_type")
            ),
        )

        # 1. gated ingest: two batches through the quality gate
        rep = E.commit_with_expectations(
            poisoned.filter(F.col("event_id") % 2 == 0),
            table,
            EXPECT,
            on_violation="quarantine",
            txn="ingest-0",
        )
        print(f"[1] ingest batch 0: {rep['rows_written']} written, "
              f"{rep['quarantined']} quarantined {rep['violations']}")
        assert rep["quarantined"] > 0

        # 2. materialized view on the current snapshot, then a second
        #    gated append and an append-delta refresh
        MV.create_matview(
            spark, table, view, ["event_type"], MEASURES, keys=["event_id"]
        )
        E.commit_with_expectations(
            poisoned.filter(F.col("event_id") % 2 == 1),
            table,
            EXPECT,
            on_violation="quarantine",
            txn="ingest-1",
        )
        r1 = MV.refresh_matview(spark, view)
        print(f"[2] view refresh: {r1['path']} "
              f"v{r1['from_version']}→v{r1['to_version']}")
        assert r1["path"] == "append-delta"

        # 3. GDPR drip: MOR delete (~15% of ids), then keyed-diff refresh
        cutoff = int(
            ev.agg(F.max("event_id")).first()[0] * 0.15
        )
        V.delete_where_dv(spark, table, [("event_id", "<", cutoff)])
        r2 = MV.refresh_matview(spark, view)
        recompute = {
            tuple(r)
            for r in MV._partials(
                V.read_version(spark, table), ["event_type"], MEASURES
            ).drop(MV._N).collect()
        }
        served = {tuple(r) for r in MV.read_matview(spark, view).collect()}
        print(f"[3] keyed refresh: {r2['path']}; view == recompute: "
              f"{served == recompute}")
        assert r2["path"] == "keyed-diff" and served == recompute

        # 4. auto-OPTIMIZE settles the tombstone debt
        rec = V.maintain_table(
            spark, table, max_dv_ratio=0.1, num_files=4,
            # ~10 bits/key at this row count — size the bitmap to the
            # post-compaction file, not the default
            bloom_cols=["event_id"], bloom_bits=1 << 16, txn="opt-1",
        )
        print(f"[4] maintain: dv_ratio={rec['dv_ratio']} "
              f"compacted={rec['compacted']} files={rec.get('files_after')}")
        assert rec["compacted"] and not V.live_dv_dirs(table)

        # 5. bloom-pruned point lookup on the compacted layout
        ids = sorted(
            r.event_id
            for r in V.read_version(spark, table).select("event_id").collect()
        )
        key = ids[len(ids) // 2]
        zone = V.pruned_paths(table, [("event_id", "between", (key, key))])[1]
        _, kept, _ = V.pruned_paths(table, [("event_id", "=", key)])
        print(f"[5] point lookup: zone maps keep {zone} files, bloom "
              f"keeps {kept}")
        assert kept <= zone

        # 6. bad deploy + metadata-only restore + zero-copy clone
        good = V.latest_version(table)
        V.commit_write(
            V.read_version(spark, table).limit(3), table, mode="overwrite"
        )
        rr = V.restore_table(spark, table, good, txn="undo-1")
        V.clone_table(spark, table, clone)
        n = V.read_version(spark, table).count()
        print(f"[6] restore: metadata_only={rr['metadata_only']} "
              f"rows={n}; clone rows={V.read_version(spark, clone).count()}")
        assert rr["metadata_only"] and n == len(ids)

        # 7. (r12) relax a rule and drain the quarantine exactly once
        n_q = V.read_version(spark, table + "_quarantine").count()
        if n_q:
            n_before = V.read_version(spark, table).count()
            out = E.replay_quarantine(
                spark, table, [("value_ok", "value >= -1000")],
            )
            out2 = E.replay_quarantine(  # replay adopts, nothing doubles
                spark, table, [("value_ok", "value >= -1000")],
            )
            n_after = V.read_version(spark, table).count()
            print(f"[7] quarantine drain: {out['readmitted']} re-admitted, "
                  f"{out['still_quarantined']} kept; idempotent="
                  f"{n_after == n_before + out['readmitted']}")
            assert n_after == n_before + out["readmitted"]

        # 8. (r12) one unified maintenance tick per structure
        from data_pipeline_zeal_spark.operators import maintenance

        for path, want in ((table, "plain"), (view, "matview")):
            rec = maintenance.maintain_index(spark, path)
            print(f"[8] maintain_index({want}): kind={rec['kind']} "
                  f"action={rec['action']}")
            assert rec["kind"] == want

        # 9. (r13) retention under the same tick: the table accumulated
        # superseded history (ingest -> DV delete -> compact); one tick
        # with a keep-history window measures the expired-dir debt from
        # the log and vacuums it, floors persisted before deletion
        rec = maintenance.maintain_index(
            spark, table, vacuum_keep_history=1, max_expired_dirs=0,
            retention_seconds=0.0,
        )
        vac = rec.get("vacuum", {}).get("components", {}).get(table, {})
        print(f"[9] retention tick: debt={rec['vacuum_debt_dirs']} dirs, "
              f"floor={vac.get('floor')}, removed={vac.get('removed')}")
        assert V.read_version(spark, table).count() > 0  # live snapshot ok

        # the commit log as quality ledger
        for h in V.history(table):
            meta = V.commit_meta(table, h["version"])
            if "expectations" in meta:
                print(f"    ledger v{h['version']}: "
                      f"{meta['expectations']['violations']}")
        print("lakehouse demo: ALL STEPS VERIFIED")
    finally:
        for p in (table, table + "_quarantine", view, clone):
            shutil.rmtree(p, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
