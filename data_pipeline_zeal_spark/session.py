"""SparkSession factory with engine defaults.

Defaults are chosen for correctness-at-scale first:

* AQE on (runtime coalescing + skew-join splitting) so the same plans survive
  a 100x scale-up without retuning ``spark.sql.shuffle.partitions``.
* Session timezone pinned to UTC — the reference pipeline stamps and stores
  UTC timestamps end-to-end (reference ``utils/domain/events.py:34,47``), and
  the DuckDB correctness oracle reads naive/UTC parquet timestamps.
* Arrow enabled for the few Pandas-UDF code paths (similarity / multimodal).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "data-pipeline-zeal-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's tuned defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # The driver fixtures are written with TIMESTAMP(NANOS) parquet
        # logical type, which Spark rejects by default; read as long and
        # convert in io.load_table (integer division — nano epochs overflow
        # double precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Micros-precision fixtures with isAdjustedToUTC=false must load as
        # session-UTC instants (reference semantics), not TIMESTAMP_NTZ.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (the zeal_versioned format
        # prunes files against commit stats at planning time)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Streaming state should not depend on the number of cores at restore
        # time; a fixed modest number keeps local tests fast.
        .config("spark.sql.streaming.stateStore.maintenanceInterval", "30s")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


#: Streaming state-store profile for stateful production jobs (funnel,
#: heavy hitters, latest-state CDC): the RocksDB provider keeps per-key
#: state OFF-HEAP and checkpoints incrementally (changelog files instead
#: of full snapshots), so state scales with distinct ACTIVE keys rather
#: than executor heap — the provider `streaming/cdc.py` and
#: `streaming/funnel.py` size their state bounds against, and the one a
#: 100 TB deployment runs.  These are RUNTIME SQL confs: apply via
#: ``streaming_profile()`` at session build, or ``spark.conf.set`` on a
#: live session before ``start()`` (each streaming query binds its
#: provider at start and keeps it for the checkpoint's lifetime).
ROCKSDB_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # incremental checkpoints: upload changelogs per batch, compact in
    # the background — bounds both commit latency and snapshot I/O
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def streaming_profile(
    app_name: str = "data-pipeline-zeal-spark-streaming",
    **kwargs,
) -> SparkSession:
    """:func:`get_spark` with the RocksDB state-store profile applied —
    the session factory for stateful streaming deployments."""
    extra = dict(ROCKSDB_STATE_CONF)
    extra.update(kwargs.pop("extra_conf", None) or {})
    return get_spark(app_name=app_name, extra_conf=extra, **kwargs)
