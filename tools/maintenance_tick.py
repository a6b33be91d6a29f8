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
    if not argv:
        print(__doc__)
        return 1
    from data_pipeline_zeal_spark.operators import maintenance
    from data_pipeline_zeal_spark.session import get_spark

    spark = get_spark(app_name="maintenance-tick")
    failed = 0
    try:
        for table in argv:
            try:
                rec = maintenance.maintain_index(spark, table)
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
