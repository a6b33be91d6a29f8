"""data_pipeline_zeal_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of
``sanjaymulchandani-xplor/data-pipeline-zeal`` (a streaming user-activity
analytics pipeline: tumbling hourly windowed aggregation over JSON events,
idempotent upsert persistence, and a filter/sort/paginate/re-aggregate query
surface), re-expressed idiomatically on Spark DataFrame / SQL / Structured
Streaming, and extended with large-scale batch-ETL and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Layout:
    session     — SparkSession builder tuned for the engine
    schemas     — the single source-of-truth StructTypes
    io          — parquet fixture loading helpers
    operators/  — hourly aggregation, API query surface, batch ETL,
                  dedup, similarity, text analysis
    sources/    — synthetic generator, Kafka + JSONL ingest
    streaming/  — Structured Streaming pipeline (watermark, upsert sink)
"""

__version__ = "0.1.0"
