"""Subprocess worker for the multiprocess commit-log torture test
(r13, round-12 verdict directive #6).

Usage: python _concurrent_writer_worker.py <table> <worker_id> <n_commits>
       [replay]

Each worker opens its OWN SparkSession (own JVM — a genuinely separate
OS process racing the hard-link CAS, unlike the in-process threading
tests) and appends ``n_commits`` distinct-txn commits of 8 rows each.
With ``replay`` it additionally re-commits its FIRST txn at the end —
the duplicate publish must ADOPT the landed commit (same version, no new
log entry).  Prints one JSON line with the versions it observed so the
parent can assert adoption.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    table, wid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    replay = len(sys.argv) > 4 and sys.argv[4] == "replay"

    from data_pipeline_zeal_spark.session import get_spark
    from data_pipeline_zeal_spark.sources import versioned as V

    spark = get_spark(
        app_name=f"torture-w{wid}",
        master="local[2]",
        shuffle_partitions=2,
        extra_conf={"spark.driver.memory": "1g"},
    )
    versions = []
    first_txn = f"w{wid}-0"
    for i in range(n):
        df = spark.range(8).selectExpr(
            f"{wid} as worker", f"{i} as commit_i", "id as row_i"
        )
        versions.append(
            V.commit_write(df, table, mode="append", txn=f"w{wid}-{i}")
        )
    adopted = None
    if replay:
        df = spark.range(8).selectExpr(
            f"{wid} as worker", "0 as commit_i", "id as row_i"
        )
        adopted = V.commit_write(df, table, mode="append", txn=first_txn)
    print(json.dumps(
        {"worker": wid, "versions": versions, "adopted": adopted}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
