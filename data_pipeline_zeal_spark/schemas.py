"""Single source-of-truth schemas.

The reference keeps three hand-synced copies of each schema (dataclasses in
``utils/domain/events.py:7-18`` / ``processor/src/domain/aggregation.py:90-102``,
SQL DDL in ``migrations/001_initial_schema.sql:1-14``, Pydantic models in
``api/src/routers/aggregations.py:23-55``).  Here one ``StructType`` per entity
is the only copy; everything else derives from it.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Wire-format event, one JSON message on the Kafka topic
#: (reference ``utils/domain/events.py:7-18``; nullable fields are conditional
#: on event_type, reference ``producer/src/domain/event_generator.py:43-52``).
EVENT_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("session_id", T.StringType(), False),
        T.StructField("page_url", T.StringType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        # Reference carries metadata as an opaque dict; we keep it as a JSON
        # string at the wire and expose typed extraction helpers.
        T.StructField("metadata", T.StringType(), True),
    ]
)

#: The 10 event types of the reference generator
#: (``producer/src/domain/event_generator.py:8-19``).
REFERENCE_EVENT_TYPES = [
    "page_view",
    "click",
    "scroll",
    "form_submit",
    "video_play",
    "video_pause",
    "purchase",
    "add_to_cart",
    "search",
    "logout",
]

#: The 8 page URLs of the reference generator
#: (``producer/src/domain/event_generator.py:21-30``).
REFERENCE_PAGE_URLS = [
    "/home",
    "/products",
    "/products/electronics",
    "/products/clothing",
    "/cart",
    "/checkout",
    "/account",
    "/search",
]

#: Driver-fixture events table (``/root/testdata/sf*/events.parquet``).
EVENT_TABLE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

#: Persisted hourly aggregate (reference ``migrations/001_initial_schema.sql``;
#: logical PK is (window_start, event_type), ``001_initial_schema.sql:13``).
HOURLY_AGGREGATION_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("window_end", T.TimestampType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("event_count", T.LongType(), False),
        T.StructField("unique_user_count", T.LongType(), False),
        T.StructField("unique_session_count", T.LongType(), True),
        T.StructField("total_duration_ms", T.LongType(), True),
        T.StructField("avg_duration_ms", T.DoubleType(), True),
    ]
)

#: Fixture tables available at every scale-factor directory.
FIXTURE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
