"""One scheduled maintenance pass over a set of persisted structures —
the cron entry point for :func:`~data_pipeline_zeal_spark.operators.
maintenance.maintain_index` (r12).

Each argument is a table root (plain versioned table, BM25 index,
IVF/IVFADC index, or materialized view — classification is automatic
from the logs); the tick prints one JSON decision line per table, so an
orchestrator's run log IS the maintenance ledger.  Steady-state ticks
cost log metadata only; repairs run only where a debt trigger fired.

    python tools/maintenance_tick.py /data/events /data/events_by_type \\
        /data/docs_bm25 /data/emb_ivf

Retention rides the same tick (r13, round-12 verdict directive #4):
``--keep-history N`` measures each structure's expired-history debt
from log metadata and, past ``--max-expired-dirs`` (default 8), vacuums
the structure's main + companion + quarantine tables coherently — never
below a version the live manifest or model pointers pin.
``--retention-seconds`` (default 21600 = Delta-style 6 h) protects
freshly staged dirs of in-flight writers.

    python tools/maintenance_tick.py --keep-history 10 /data/docs_bm25

Exit code 0 when every tick succeeded (including honest
``rebuild_required`` escalations, which need a source the tick cannot
supply); 1 when any table errored.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    keep_history: int | None = None
    max_expired_dirs = 8
    retention_seconds = 6 * 3600.0
    tables: list[str] = []
    it = iter(argv)
    for a in it:
        if a == "--keep-history":
            keep_history = int(next(it))
        elif a == "--max-expired-dirs":
            max_expired_dirs = int(next(it))
        elif a == "--retention-seconds":
            retention_seconds = float(next(it))
        else:
            tables.append(a)
    if not tables:
        print(__doc__)
        return 1
    from data_pipeline_zeal_spark.operators import maintenance
    from data_pipeline_zeal_spark.session import get_spark

    spark = get_spark(app_name="maintenance-tick")
    failed = 0
    try:
        for table in tables:
            try:
                rec = maintenance.maintain_index(
                    spark, table,
                    vacuum_keep_history=keep_history,
                    max_expired_dirs=max_expired_dirs,
                    retention_seconds=retention_seconds,
                )
                print(json.dumps({"table": table, **rec}, default=str))
            except Exception as exc:  # one bad table must not stall the rest
                failed += 1
                print(json.dumps({
                    "table": table, "action": "error",
                    "error": f"{type(exc).__name__}: {exc}",
                }))
    finally:
        spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
