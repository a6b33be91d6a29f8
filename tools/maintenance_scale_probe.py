"""Measured scaling probe for the unified maintenance tick (r14):
SCALE.md claims the steady-state tick is METADATA-ONLY — log replay plus
one isdir stat per committed dir, never a data scan.  This tool pins the
two curves that claim implies:

(a) tick wall-clock vs COMMIT-LOG LENGTH at fixed data size — the
    replay is O(commits), so cost grows with the log (and stays in the
    tens of milliseconds per hundred commits — the reason a cron tick
    on thousands of tables is affordable);
(b) tick wall-clock vs DATA SIZE at fixed log length — a 100x larger
    table must NOT change the tick's cost, because the debt probes
    (fragmentation count, DV ratio, expired-dir retention debt) read
    entries and stat directories, never parquet pages.

Thresholds are set so no repair fires (the probe measures the DECISION,
which is the steady-state cron cost; the repair is the rare paid step
it gates).  Deterministic (spark.range data); prints one JSON line per
measurement.  Paste the summary into SCALE.md when the numbers change.

    python tools/maintenance_scale_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from data_pipeline_zeal_spark.operators import maintenance
    from data_pipeline_zeal_spark.session import get_spark
    from data_pipeline_zeal_spark.sources import versioned as V

    spark = get_spark(app_name="maintenance-scale-probe",
                      shuffle_partitions=8)

    def tick_time(table: str, reps: int = 5) -> float:
        # median of reps: the tick is fast enough that scheduler jitter
        # would otherwise dominate a single measurement
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            rec = maintenance.maintain_index(
                spark, table,
                vacuum_keep_history=3, max_expired_dirs=10**9,
                max_live_files=10**9, max_dv_ratio=1e9,
            )
            ts.append(time.perf_counter() - t0)
            assert rec["action"] == "none", rec
        ts.sort()
        return ts[len(ts) // 2]

    # (a) log length at fixed data size (~2k rows total, split N ways)
    for n_commits in (8, 32, 128):
        t = tempfile.mkdtemp(prefix="mprobe_a_")
        try:
            per = max(1, 2048 // n_commits)
            for i in range(n_commits):
                df = spark.range(i * per, (i + 1) * per).selectExpr(
                    "id", "id * 2 as v"
                )
                V.commit_write(
                    df.coalesce(1), t,
                    mode="overwrite" if i == 0 else "append",
                    txn=f"a{i}",
                )
            sec = tick_time(t)
            print(json.dumps({
                "curve": "tick_vs_log_length", "commits": n_commits,
                "rows": 2048, "tick_sec": round(sec, 4),
            }))
        finally:
            shutil.rmtree(t, ignore_errors=True)

    # (b) data size at fixed log length (16 commits; rows per commit
    # grows 100x end to end)
    for per in (1_000, 10_000, 100_000):
        t = tempfile.mkdtemp(prefix="mprobe_b_")
        try:
            for i in range(16):
                df = spark.range(i * per, (i + 1) * per).selectExpr(
                    "id", "id * 2 as v"
                )
                V.commit_write(
                    df.coalesce(1), t,
                    mode="overwrite" if i == 0 else "append",
                    txn=f"b{i}",
                )
            sec = tick_time(t)
            print(json.dumps({
                "curve": "tick_vs_data_size", "commits": 16,
                "rows": 16 * per, "tick_sec": round(sec, 4),
            }))
        finally:
            shutil.rmtree(t, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
