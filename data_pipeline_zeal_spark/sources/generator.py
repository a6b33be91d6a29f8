"""Synthetic user-activity event generator — columnar, distributed.

Reproduces the reference generator's distributions
(``producer/src/domain/event_generator.py:33-65``) as pure column
expressions over ``spark.range`` (batch) or the rate source (streaming):

* user pool of N users, uniform                      (``:39``)
* 10 event types, uniform                            (``:8-19,44``)
* page_url only for page_view/click/scroll, from 8 pages (``:21-30,45``)
* duration_ms only for page_view/video_play, uniform 100-30000 (``:46``)
* metadata: {"query": "search query N"} for search,
  {"amount": uniform 10-500 rounded 2} for purchase  (``:48-52``)
* sticky sessions rotating with p=0.1 per event      (``:41-42``):
  the reference keeps per-user mutable session state; a distributed
  generator derives the rotation statelessly — each event flips a
  p=0.1 coin seeded by (user, seq) and the session id is a hash of
  (user, #flips so far), approximated per-row by hashing
  user + floor(seq-within-user scaled by geometric mean run length).
  Only the distribution shape matters (SURVEY.md §7.3).

All randomness is hash-derived from the row id (pure per-row functions) →
deterministic for a fixed seed regardless of partitioning, and
embarrassingly parallel (no driver-side loops, no RNG stream state).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import REFERENCE_EVENT_TYPES, REFERENCE_PAGE_URLS


def _u(seed: int, k: int):
    """Hash-derived uniform [0,1) from the row ``id`` — a pure per-row
    function.  (``F.rand`` is stateful per-partition: instances inside
    ``when`` branches advance only on rows where the branch evaluates,
    desynchronizing draws across columns.  Hashing has no stream.)"""
    return (
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + k)), F.lit(1_000_003))
        / 1_000_003.0
    )


def _event_columns(df: DataFrame, num_users: int, seed: int) -> DataFrame:
    """Project generator columns onto a DataFrame with ``id`` and ``ts``."""
    types = F.lit(list(REFERENCE_EVENT_TYPES))
    pages = F.lit(list(REFERENCE_PAGE_URLS))

    user_n = F.floor(_u(seed, 0) * num_users).cast("long")
    etype = F.element_at(types, (F.floor(_u(seed, 1) * 10) + 1).cast("int"))
    # session rotation: expected run length 1/p = 10 events; bucket the
    # per-user event sequence into runs via a seeded hash of (user, id/10
    # jittered) — stateless stand-in for the reference's per-user counter.
    session_bucket = F.floor(
        (F.col("id") + F.pmod(F.xxhash64(user_n), F.lit(7))) / F.lit(10)
    )
    session_id = F.md5(F.concat_ws("-", user_n, session_bucket))

    df = df.select(
        F.md5(F.concat_ws("-", F.lit("evt"), F.col("id"))).alias("event_id"),
        F.concat(F.lit("user_"), user_n).alias("user_id"),
        etype.alias("event_type"),
        F.col("ts").alias("timestamp"),
        session_id.alias("session_id"),
        F.when(
            etype.isin("page_view", "click", "scroll"),
            F.element_at(pages, (F.floor(_u(seed, 2) * 8) + 1).cast("int")),
        ).alias("page_url"),
        F.when(
            etype.isin("page_view", "video_play"),
            (F.floor(_u(seed, 3) * 29901) + 100).cast("long"),
        ).alias("duration_ms"),
        F.when(
            etype == "search",
            F.to_json(
                F.struct(
                    F.concat(
                        F.lit("search query "), F.floor(_u(seed, 4) * 100)
                    ).alias("query")
                )
            ),
        )
        .when(
            etype == "purchase",
            F.to_json(
                F.struct(
                    F.round(_u(seed, 5) * 490 + 10, 2).alias("amount")
                )
            ),
        )
        .alias("metadata"),
    )
    return df


def generate_events(
    spark: SparkSession,
    count: int,
    num_users: int = 100,
    start_ts: str = "2024-01-01 00:00:00",
    events_per_second: float = 58.0,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Batch generation of ``count`` events at a steady design rate
    (reference S9: rate = total/(hours*3600), ``simulation_producer.py:81-84``;
    default 58 ev/s ≈ the 5M-events/24h simulation target)."""
    base = spark.range(0, count, numPartitions=num_partitions).select(
        "id",
        (
            F.to_timestamp(F.lit(start_ts))
            + F.make_dt_interval(secs=F.col("id") / F.lit(events_per_second))
        ).alias("ts"),
    )
    return _event_columns(base, num_users, seed)


def generate_event_stream(
    spark: SparkSession,
    rows_per_second: int = 58,
    num_users: int = 100,
    seed: int = 42,
) -> DataFrame:
    """Streaming generation via the rate source (reference S9's rate-limited
    replay: ``readStream.format("rate")`` holds the target rate)."""
    base = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
        .select(F.col("value").alias("id"), F.col("timestamp").alias("ts"))
    )
    return _event_columns(base, num_users, seed)


def generate_embeddings(
    spark: SparkSession,
    count: int,
    dim: int = 64,
    num_labels: int = 10,
    seed: int = 42,
    num_partitions: int | None = None,
    clusters: int | None = None,
    cluster_scale: float = 1.0,
) -> DataFrame:
    """Synthetic embeddings matching the fixture geometry
    (``embeddings.parquet``: vec_id bigint, embedding float[dim], label
    int 0..num_labels-1) at arbitrary row counts — the scale-law probe
    for the dedup/ANN candidate-volume measurements (round-7 directive
    #3: a third decade beyond sf0.1's 2 000 rows).

    Default geometry is ISOTROPIC standard normals (the fixture's —
    the worst case for any cell-probing ANN).  ``clusters=k`` switches
    to CLUSTERED geometry: each row draws a hash-assigned cluster id and
    its vector is ``cluster_scale * anchor(cluster) + noise``, where the
    anchor components are themselves hash-derived normals of the cluster
    id — the real ANN/SemDeDup setting, where cell probing concentrates
    recall in a few cells.  ``label`` becomes the cluster id so recall
    probes can verify against ground-truth structure.

    Components are standard normals via Box-Muller over the same
    hash-derived uniforms as :func:`_u` — pure per-row functions of
    ``id`` (and the derived cluster id), so the output is deterministic
    under ANY partitioning (``F.rand`` is not: its stream is
    per-partition).  Entirely JVM-side codegen; no Python on the row
    path.
    """
    base = spark.range(0, count, numPartitions=num_partitions)

    def _unit(k: int, col="id"):
        # (pmod + 1) / (m + 1) keeps u in (0, 1]: ln(0) is the only
        # Box-Muller singularity and u2's cos argument is unaffected
        return (
            F.pmod(F.xxhash64(F.col(col), F.lit(seed + k)), F.lit(1_000_003))
            + 1
        ) / 1_000_004.0

    def _normal(k: int, col="id"):
        return F.sqrt(-2.0 * F.log(_unit(2 * k, col))) * F.cos(
            2.0 * math.pi * _unit(2 * k + 1, col)
        )

    if clusters is None:
        comps = [_normal(k).cast("float") for k in range(dim)]
        label = F.floor(_unit(2 * dim) * num_labels).cast("int")
        return base.select(
            F.col("id").alias("vec_id"),
            F.array(*comps).alias("embedding"),
            label.alias("label"),
        )

    # clustered: anchor(cluster) is a pure function of the cluster id via
    # the same hash-normal construction (seed offset keeps anchors
    # independent of the noise stream)
    withc = base.withColumn(
        "__c", F.floor(_unit(2 * dim) * clusters).cast("bigint")
    )
    comps = [
        (
            F.lit(float(cluster_scale)) * _normal(k + 7919, "__c")
            + _normal(k)
        ).cast("float")
        for k in range(dim)
    ]
    return withc.select(
        F.col("id").alias("vec_id"),
        F.array(*comps).alias("embedding"),
        F.col("__c").cast("int").alias("label"),
    )
