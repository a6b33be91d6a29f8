"""Subprocess worker for the multiprocess MAINTENANCE race test
(r14, round-13 verdict directive #7).

Usage: python _concurrent_maintenance_worker.py <table> <role> <wid> <n>

Roles (each worker opens its OWN SparkSession — a genuinely separate
OS process racing the commit log, the hard-link CAS, and the manifest
commit point):

* ``appender``  — streams ``n`` doc slices into the BM25 index through
  ``bm25_index_sink`` (postings/df/stats segment appends + manifest
  publish per batch).  A :class:`ConcurrentWriteConflict` from a racing
  overwrite (another appender's manifest publish, the maintainer's
  optimize) is RETRIED with the same batch id — the txn keys make the
  replay adopt landed pieces and republish the manifest, the exact
  crash-replay contract the sink documents.
* ``maintainer`` — fires ``n`` `maintain_index` ticks with retention
  under the tick enabled and the PRODUCTION-DEFAULT 6 h
  ``retention_seconds`` — the Delta-style window that protects racing
  writers' staged-but-uncommitted dirs, so a tick may repair (optimize)
  and must report fresh expired history as DEFERRED debt, never delete
  it out from under a live writer.  Conflicted repairs are skipped (the
  next tick retries).
* ``prober``    — runs ``n`` probes + manifest-triple reads; EVERY one
  must succeed (no torn index state is ever observable through the
  manifest commit point).

Each prints one JSON line for the parent's assertions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"


def main() -> None:
    table, role, wid, n = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    )

    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators import maintenance, retrieval
    from data_pipeline_zeal_spark.session import get_spark
    from data_pipeline_zeal_spark.sources import versioned as V

    spark = get_spark(
        app_name=f"maintrace-{role}{wid}",
        master="local[2]",
        shuffle_partitions=2,
        extra_conf={"spark.driver.memory": "1g"},
    )
    out: dict = {"role": role, "wid": wid}
    docs = load_table(spark, SF_SMALL, "documents")

    if role == "appender":
        # disjoint 30-doc slices per appender: [200+90w, 200+90w+90)
        sink = retrieval.bm25_index_sink(table, f"mx-w{wid}")
        committed = []
        conflicts = 0
        for i in range(n):
            lo = 200 + 90 * wid + 30 * i
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 30)
            )
            for attempt in range(40):
                try:
                    sink(batch, i)
                    committed.append([lo, lo + 30])
                    break
                except V.ConcurrentWriteConflict:
                    conflicts += 1
                    time.sleep(0.2)
            else:
                raise RuntimeError(f"appender w{wid} batch {i} livelocked")
        out.update({"committed": committed, "conflicts": conflicts})

    elif role == "maintainer":
        ticks = []
        conflicts = 0
        for i in range(n):
            try:
                rec = maintenance.maintain_index(
                    spark, table, vacuum_keep_history=2,
                    max_expired_dirs=0, max_segments=2,
                    txn=f"mx-tick-{wid}-{i}",
                )
                ticks.append({
                    "action": rec.get("action"),
                    "debt": rec.get("vacuum_debt_dirs"),
                    "deferred": rec.get("vacuum_debt_deferred"),
                    "vacuum_fired": "vacuum" in rec,
                })
            except V.ConcurrentWriteConflict:
                conflicts += 1
            time.sleep(1.0)
        out.update({"ticks": ticks, "conflicts": conflicts})

    else:  # prober
        q = retrieval.corpus_queries(
            docs.filter(F.col("doc_id") < 200)
        ).filter(F.col("query_id") <= 124)
        probes = 0
        for _ in range(n):
            hits = retrieval.search_bm25_index(
                spark, table, q, k=5
            ).collect()
            assert hits, "probe returned no rows"
            assert all(r.score == r.score for r in hits)  # no NaN
            man = table + "_manifest"
            row = V.read_version(spark, man).collect()[0]
            for comp, pin in (
                (table, row.postings_version),
                (table + "_df", row.df_version),
                (table + "_stats", row.stats_version),
            ):
                V.read_version(spark, comp, int(pin)).count()
            probes += 1
            time.sleep(0.5)
        out.update({"probes": probes})

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
