"""[EXT] Streaming heavy hitters: sharded Misra-Gries summaries.

Top-talker detection ("which users dominate the stream RIGHT NOW") needs
state that is bounded regardless of how many distinct users flow past —
the thing a plain streaming ``groupBy(user).count()`` cannot promise.
Misra-Gries keeps at most ``capacity`` counters and guarantees every item
with true frequency > N/(capacity+1) is present, with its counter
under-counting by at most N/(capacity+1).

Scale shape: the stream is keyed by a HASH SHARD (``user_id`` mod
``n_shards``), not by user — so the stateful operator runs ``n_shards``
parallel groups, each holding one bounded summary (``capacity`` entries),
total state = n_shards x capacity rows no matter how many users exist.
Each micro-batch pre-counts its Arrow batches into a dict BEFORE touching
state (one state read + one write per shard per batch), then emits the
shard's refreshed candidate set; downstream consumes it as an idempotent
upsert keyed (shard, user_id), and a global top-k is the union of shard
summaries re-ranked — the same merge a count-min/space-saving fleet does.

The summary is stored as a JSON string column: capacity entries, a few KB
— the point of MG is precisely that this cannot grow with the stream.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("count_lb", T.LongType()),
    ]
)

#: the bounded summary, JSON-encoded: {"n": items_seen, "c": {user: count}}
HH_STATE_SCHEMA = T.StructType([T.StructField("summary", T.StringType())])


def mg_merge(counters: dict[str, int], capacity: int) -> dict[str, int]:
    """Misra-Gries reduction: if more than ``capacity`` keys survive,
    subtract the (capacity+1)-th largest count from every counter and
    drop the non-positive ones — the standard mergeable-summary step
    (Agarwal et al., "Mergeable Summaries")."""
    if len(counters) <= capacity:
        return counters
    cut = sorted(counters.values(), reverse=True)[capacity]
    return {k: v - cut for k, v in counters.items() if v > cut}


def _hh_fn(capacity: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        cur = {"n": 0, "c": {}}
        if state.exists:
            cur = json.loads(state.get[0])
        counters: dict[str, int] = dict(cur["c"])
        n = int(cur["n"])
        seen_any = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            seen_any = True
            # reduce the Arrow batch to per-user counts BEFORE state I/O
            for user, cnt in pdf["user_id"].value_counts().items():
                counters[str(user)] = counters.get(str(user), 0) + int(cnt)
                n += int(cnt)
        if not seen_any:
            return
        counters = mg_merge(counters, capacity)
        state.update((json.dumps({"n": n, "c": counters}),))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(counters),
                "user_id": list(counters.keys()),
                "count_lb": [int(v) for v in counters.values()],
            }
        )

    return fn


def heavy_hitters_stream(
    events: DataFrame, capacity: int = 32, n_shards: int = 16
) -> DataFrame:
    """Per-shard Misra-Gries heavy-hitter candidates over a stream of
    events; every micro-batch re-emits each touched shard's current
    candidate set (consume as an upsert keyed (shard, user_id)).  Any
    user with true count > N_shard/(capacity+1) within its shard is
    guaranteed present."""
    sharded = events.withColumn(
        "shard", F.pmod(F.xxhash64("user_id"), F.lit(n_shards)).cast("int")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _hh_fn(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )


def heavy_hitters_batch(
    events: DataFrame, k: int = 10, n_shards: int = 16
) -> DataFrame:
    """Exact batch twin: true top-``k`` users by event count with the
    same shard labels — the ground truth the streaming summary's
    guarantee is tested against."""
    return (
        events.withColumn(
            "shard", F.pmod(F.xxhash64("user_id"), F.lit(n_shards)).cast("int")
        )
        .groupBy("shard", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("user_id"))
        .limit(k)
    )
