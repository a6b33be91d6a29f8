"""[EXT] Change-data-capture / incremental-maintenance operators.

A 100 TB event store is never rewritten wholesale: it lives as a base
snapshot plus keyed change deltas, periodically compacted (the MERGE INTO
/ latest-wins-upsert pattern every lakehouse table format implements).
The reference's closest analogue is the Postgres ``ON CONFLICT`` upsert
sink (reference ``processor/src/infrastructure/postgres_repository.py:59-98``)
— these are the same semantics expressed as distributed batch kernels.

Scale notes (100 TB bar):
* Both kernels are a single hash shuffle on the merge key with a
  map-side-combining ``max_by`` aggregate — NO window sort.  A
  ``row_number() OVER (PARTITION BY key ORDER BY ...)`` formulation
  materializes and sorts every version of every key inside each
  partition; ``max_by`` keeps exactly one row per key per map task
  before the exchange, so shuffle volume is bounded by distinct keys,
  not by change volume.  At 10^11 change rows against 10^9 keys that is
  a 100x exchange reduction.
* The ordering key is a struct ``(version, source_priority, tiebreak)``
  compared lexicographically in the JVM — fully whole-stage-codegen,
  no Python.
* Ties are impossible when ``tiebreak`` is a unique id; when two
  physically identical rows collide, delta wins over base by the
  injected priority bit, matching upsert semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Internal column carrying base(0)/delta(1) precedence through the union.
_SRC = "__cdc_src"


def _pick_latest(
    changes: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None,
    payload_cols: list[str],
    src_col: str | None = None,
) -> DataFrame:
    """One-shuffle latest-wins reduction: ``max_by(payload, ordering)``
    per key, ordering = (order_col [, src priority][, tiebreak])."""
    ord_fields = [F.col(order_col)]
    if src_col is not None:
        ord_fields.append(F.col(src_col))
    if tiebreak is not None:
        ord_fields.append(F.col(tiebreak))
    payload = F.struct(*[F.col(c) for c in payload_cols])
    picked = changes.groupBy(*[F.col(k) for k in keys]).agg(
        F.max_by(payload, F.struct(*ord_fields)).alias("__row")
    )
    return picked.select(
        *keys, *[F.col(f"__row.{c}").alias(c) for c in payload_cols]
    )


def latest_snapshot(
    changes: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Compact a keyed change log to its latest row per key.

    Equivalent SQL: ``row_number() OVER (PARTITION BY keys ORDER BY
    order_col DESC, tiebreak DESC) = 1`` — but executed as a single
    map-side-combined aggregate (see module scale notes)."""
    payload = [c for c in changes.columns if c not in keys]
    return _pick_latest(changes, keys, order_col, tiebreak, payload)


def merge_latest(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Latest-wins upsert merge of a delta into a base snapshot (MERGE
    INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED INSERT, with
    most-recent-version-wins semantics; delta beats base on exact
    version ties).

    Both inputs must share the base schema; the output is a valid new
    base snapshot, so the operator composes with itself for incremental
    compaction loops."""
    cols = base.columns
    unioned = base.select(*cols).withColumn(_SRC, F.lit(0)).unionByName(
        delta.select(*cols).withColumn(_SRC, F.lit(1))
    )
    payload = [c for c in cols if c not in keys]
    return _pick_latest(unioned, keys, order_col, tiebreak, payload, src_col=_SRC)


def scd2_intervals(
    changes: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: each change row becomes
    a validity interval ``[valid_from, valid_to)``, with ``valid_to`` NULL
    on the current row — the warehouse-standard temporal shape downstream
    point-in-time joins (``operators/asof.py``) consume.

    This one IS a window op (``lead`` over the per-key version order):
    unlike the latest-wins kernels above, every version must see its
    successor, so a per-key sort is inherent to the semantics — one hash
    exchange on the key, in-partition sort, no driver involvement.  Key
    cardinality bounds partition skew exactly as in the sessionize
    operator."""
    from pyspark.sql import Window

    order = [F.col(order_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return changes.select(
        *changes.columns,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(w).alias("valid_to"),
        F.lead(order_col).over(w).isNull().alias("is_current"),
    )


def scd2_point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    keys: list[str],
    fact_ts: str,
    dim_values: list[str],
    how: str = "left",
) -> DataFrame:
    """Point-in-time join: attach to each fact row the dimension version
    that was valid AT the fact's timestamp — the consumer of
    :func:`scd2_intervals` output (``valid_from`` inclusive, ``valid_to``
    exclusive, NULL = still current).  The warehouse-standard "join facts
    to the dimension as it was" primitive.

    Plan shape for 100 TB: an EQUALITY hash join on ``keys`` (never a
    range/theta join — the interval predicates ride along as join-level
    filters evaluated per matched pair), so shuffle volume is facts +
    history, and per-key fan-out is bounded by that key's version count
    (SCD2 histories are shallow: versions per key << facts per key).
    Facts matching no valid version (before the key's first version, or
    unknown key) keep NULL dimension columns under ``how="left"``.
    """
    f = facts.alias("f")
    d = dim_history.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"f.{k}") == F.col(f"d.{k}")
        cond = c if cond is None else (cond & c)
    ts = F.col(f"f.{fact_ts}")
    cond = (
        cond
        & (ts >= F.col("d.valid_from"))
        & (F.col("d.valid_to").isNull() | (ts < F.col("d.valid_to")))
    )
    return f.join(d, cond, how).select(
        "f.*",
        *[F.col(f"d.{v}").alias(v) for v in dim_values],
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    payload: list[str] | None = None,
) -> DataFrame:
    """Snapshot diff: classify every key as ``insert`` (new only),
    ``delete`` (old only), ``update`` (both, payload differs) or drop it
    (both, payload identical) — the regression gate between two versions
    of a 100 TB table, and the generator of a minimal change feed.

    One full-outer hash join on the key; payload equality is a
    null-safe struct comparison evaluated in codegen (no row
    materialization, no Python).  Output carries old/new payload structs
    so downstream can render either side; its size is bounded by the
    CHANGED keys, not the table.
    """
    payload = payload or [c for c in new.columns if c not in keys]
    # presence flags, NOT key nullability: the join is null-safe on the
    # keys precisely so NULL-key rows diff correctly, which means a
    # matched NULL key cannot signal absence
    o = old.withColumn("__in_old", F.lit(True)).alias("o")
    n = new.withColumn("__in_new", F.lit(True)).alias("n")
    cond = None
    for k in keys:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else (cond & c)
    o_struct = F.struct(*[F.col(f"o.{c}").alias(c) for c in payload])
    n_struct = F.struct(*[F.col(f"n.{c}").alias(c) for c in payload])
    in_old = F.col("o.__in_old").isNotNull()
    in_new = F.col("n.__in_new").isNotNull()
    return (
        o.join(n, cond, "full_outer")
        .withColumn(
            "change",
            F.when(~in_old, F.lit("insert"))
            .when(~in_new, F.lit("delete"))
            .when(~o_struct.eqNullSafe(n_struct), F.lit("update"))
            .otherwise(F.lit(None)),
        )
        .filter(F.col("change").isNotNull())
        .select(
            *[F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys],
            "change",
            o_struct.alias("old_values"),
            n_struct.alias("new_values"),
        )
    )


def apply_diff(
    old: DataFrame,
    diff: DataFrame,
    keys: list[str],
    payload: list[str] | None = None,
) -> DataFrame:
    """Apply a :func:`table_diff` change feed to the old snapshot and
    reproduce the new one — the consumer side of the minimal-change-feed
    contract (``apply_diff(old, table_diff(old, new), keys) == new`` up to
    row order; pinned by a roundtrip test).

    One hash join of the snapshot against the (changed-keys-only) feed:
    deletes anti-join away, updates project the feed's new payload,
    inserts union in.  Cost ∝ snapshot + changes — the lakehouse MERGE
    shape, expressed as pure DataFrame ops.
    """
    payload = payload or [
        f.name for f in diff.schema["new_values"].dataType.fields
    ]
    upserts = diff.filter(F.col("change").isin("insert", "update")).select(
        *keys, *[F.col(f"new_values.{c}").alias(c) for c in payload]
    )
    changed_keys = diff.select(*keys).alias("d")
    ol = old.alias("ol")
    # null-safe anti join: a changed NULL-key row must still knock out the
    # old NULL-key row (plain key equality would keep it and duplicate)
    cond = None
    for k in keys:
        c = F.col(f"ol.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    kept = ol.join(changed_keys, cond, "left_anti")
    return kept.select(*keys, *payload).unionByName(upserts)
