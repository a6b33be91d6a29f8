"""[EXT] Incrementally-maintained materialized aggregate views over the
commit-log versioned table (r11; no reference counterpart — the
reference has no table format).

The 100 TB problem: a serving aggregate (events per type, revenue per
day) cannot be recomputed from the base table on every refresh — the
recompute cost is O(base), the CHANGE is O(delta).  The production
answer (Materialize, Delta Live Tables, BigQuery MVs) maintains the
view from the table's change stream instead, which our table format
already exposes in two tiers:

* **append-delta** (:func:`~.versioned.read_changes_since`): when the
  refresh range is pure appends, read ONLY the new commits' files —
  table history size and base size are both irrelevant;
* **keyed-diff** (:func:`~.versioned.change_feed`): when the range
  contains deletes/updates/rewrites, the keyed change feed yields the
  minimal signed row set (insert +, delete −, update = − old + new).

Either way the maintenance step is the SAME re-aggregation: the stored
view rows are already group partials, so ``(view ∪ signed-delta
partials) → groupBy → sum`` merges them with no join at all — groupBy
is null-safe on group keys for free, and emptied groups drop out when
their maintained row count hits zero.  Refresh cost is O(delta +
|view|), never O(base).

Exactness contract: ``count`` and integer-valued ``sum`` measures are
EXACTLY equal to a from-scratch recompute at any point (integer
addition is associative); float sums would drift by summation order —
callers who need exact money math must pre-scale to integers or use
decimals, and the registered query does exactly that
(``sum(floor(value*100))``).  Each view commit records its spec + the
base version it reflects in commit ``meta``, so refresh is stateless
and the view itself time-travels like any versioned table.

Measure kinds (r12, verdict directive #3):

* ``count`` / ``sum`` — fully decomposable, signed deltas on every path.
* ``avg`` — stored as two decomposable internals (``<name>__sum``,
  ``<name>__cnt`` of NON-NULL values, SQL AVG semantics) and derived
  exactly at read time — never maintained as a ratio.
* ``min`` / ``max`` — decomposable on pure-append ranges (merge is just
  ``min``/``max``); a range containing deletes/updates can WIDEN a
  group's extreme, which no stored partial can repair, so refresh
  recomputes ONLY the groups that lost rows (the keyed feed names
  them) from the base snapshot — one group-pruned base scan, bounded
  by changed groups, while every untouched group keeps its maintained
  row.  This is the Materialize/DBSP answer to non-invertible
  aggregates: incremental where algebra allows, targeted recompute
  where it does not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import versioned as V

#: measure spec: (output column, kind, SQL expression or None) with kind
#: in "count" | "sum" | "avg" | "min" | "max"
Measure = tuple

_N = "__n"  # maintained row count — drops emptied groups, never exposed

#: kinds whose partials are signed-decomposable (deletes subtract)
_SIGNED_KINDS = ("count", "sum", "avg")
_KINDS = _SIGNED_KINDS + ("min", "max")


def _partials(
    df: DataFrame,
    group_cols: list[str],
    measures: list[Measure],
    sign=None,
) -> DataFrame:
    """One map-side-combinable aggregation producing the view's partial
    rows; ``sign`` (±1 column) turns the same shape into signed deltas
    for the keyed-diff path.  Signed partials are only legal for the
    invertible kinds — min/max measures require ``sign=None`` (callers
    route their delete-side work through targeted recompute instead)."""
    s = F.lit(1) if sign is None else sign
    aggs = [F.sum(s).alias(_N)]
    for name, kind, expr in measures:
        if kind == "count":
            aggs.append(F.sum(s).alias(name))
        elif kind == "sum":
            col = F.expr(expr)
            aggs.append(F.sum(s * F.coalesce(col, F.lit(0))).alias(name))
        elif kind == "avg":
            col = F.expr(expr)
            aggs.append(
                F.sum(s * F.coalesce(col, F.lit(0))).alias(name + "__sum")
            )
            aggs.append(
                F.sum(s * col.isNotNull().cast("long")).alias(name + "__cnt")
            )
        elif kind in ("min", "max"):
            if sign is not None:
                raise ValueError(
                    f"min/max measure {name!r} cannot take signed partials"
                )
            col = F.expr(expr)
            agg = F.min(col) if kind == "min" else F.max(col)
            aggs.append(agg.alias(name))
        else:
            raise ValueError(f"unknown measure kind: {kind!r}")
    return df.groupBy(*group_cols).agg(*aggs)


def _storage_cols(measures: list[Measure]) -> list[str]:
    """The view's internal measure columns, in storage order."""
    cols = []
    for name, kind, _ in measures:
        if kind == "avg":
            cols.extend([name + "__sum", name + "__cnt"])
        else:
            cols.append(name)
    return cols


def _merge_aggs(measures: list[Measure]) -> list:
    """Per-measure merge functions for re-aggregating (view ∪ partials):
    sum for the invertible family, min/max for the extremes (exact on
    append-only contributions; delete-touched groups are replaced by
    recompute before this merge's result is committed)."""
    aggs = [F.sum(_N).alias(_N)]
    for name, kind, _ in measures:
        if kind in ("count", "sum"):
            aggs.append(F.sum(name).alias(name))
        elif kind == "avg":
            aggs.append(F.sum(name + "__sum").alias(name + "__sum"))
            aggs.append(F.sum(name + "__cnt").alias(name + "__cnt"))
        elif kind == "min":
            aggs.append(F.min(name).alias(name))
        else:
            aggs.append(F.max(name).alias(name))
    return aggs


def create_matview(
    spark: SparkSession,
    base_table: str,
    view_table: str,
    group_cols: list[str],
    measures: list[Measure],
    keys: list[str] | None = None,
    txn: str | None = None,
) -> int:
    """Materialize the view from the base table's CURRENT snapshot and
    record (spec, base_version) in the view commit's meta — everything
    :func:`refresh_matview` needs later, so refresh takes no arguments
    but the view table.  ``keys`` (the base table's row identity)
    enables the keyed-diff path across deletes/updates; without it the
    view can only follow pure appends."""
    for name, kind, _ in measures:
        if kind not in _KINDS:
            raise ValueError(
                f"unknown measure kind {kind!r} for {name!r}: "
                f"supported kinds are {_KINDS}"
            )
    base_v = V.latest_version(base_table)
    snap = V.read_version(spark, base_table, base_v)
    view = _partials(snap, group_cols, measures)
    return V.commit_write(
        view.coalesce(1),
        view_table,
        mode="overwrite",
        txn=txn,
        meta={
            "matview": {
                "base_table": base_table,
                "base_version": base_v,
                "group_cols": group_cols,
                "measures": [list(m) for m in measures],
                "keys": keys,
            }
        },
    )


def _signed_rows_from_feed(
    feed: DataFrame, keys: list[str], payload_cols: list[str]
) -> DataFrame:
    """Explode a keyed change feed into signed full rows: insert → new
    row +1; delete → old row −1; update → both.  Row width is the
    columns the view actually reads, size is bounded by CHANGED keys."""
    old_side = feed.filter(F.col("change").isin("delete", "update")).select(
        *keys,
        *[F.col(f"old_values.{c}").alias(c) for c in payload_cols],
        F.lit(-1).alias("__sign"),
    )
    new_side = feed.filter(F.col("change").isin("insert", "update")).select(
        *keys,
        *[F.col(f"new_values.{c}").alias(c) for c in payload_cols],
        F.lit(1).alias("__sign"),
    )
    return old_side.unionByName(new_side)


def refresh_matview(
    spark: SparkSession, view_table: str, txn: str | None = None
) -> dict:
    """Advance the view to the base table's latest version by applying
    the delta — never by rescanning the base.  Picks the cheapest legal
    path: pure-append ranges read only the new commits' files; ranges
    crossing deletes/updates/rewrites fall back to the keyed change
    feed (requires the spec's ``keys``).  Returns a summary dict
    ``{"path", "from_version", "to_version", "view_version"}``."""
    vv = V.latest_version(view_table)
    spec = V.commit_meta(view_table, vv)["matview"]
    base_table = spec["base_table"]
    base_old = spec["base_version"]
    group_cols = list(spec["group_cols"])
    measures = [tuple(m) for m in spec["measures"]]
    keys = spec.get("keys")
    base_new = V.latest_version(base_table)
    if base_new == base_old:
        return {
            "path": "noop",
            "from_version": base_old,
            "to_version": base_new,
            "view_version": vv,
        }

    current = V.read_version(spark, view_table, vv)
    shrunk = None  # groups that lost rows — min/max recompute targets
    try:
        delta = V.read_changes_since(spark, base_table, base_old, base_new)
        # pure appends: EVERY kind is decomposable (min/max merge is
        # just min/max when no row ever leaves a group)
        parts = [_partials(delta, group_cols, measures)]
        path = "append-delta"
    except ValueError:
        if not keys:
            raise ValueError(
                f"refresh range ({base_old}, {base_new}] of {base_table} "
                "contains deletes/updates/rewrites and the view spec has "
                "no keys — recreate the view with keys=[...] to enable "
                "the keyed-diff path"
            )
        # r15: a range whose commits are ALL positional deletes needs no
        # full-outer snapshot diff — the tombstones name the deleted
        # rows, so the signed delta is one semi-join over the
        # from-snapshot (V.dv_only_deleted_rows); other ranges take the
        # general keyed diff as before.
        deleted = V.dv_only_deleted_rows(spark, base_table, base_old, base_new)
        if deleted is not None:
            payload_cols = [c for c in deleted.columns if c not in keys]
            rows = deleted.select(
                *keys, *payload_cols, F.lit(-1).alias("__sign")
            )
        else:
            feed = V.change_feed(
                spark, base_table, base_old, base_new, keys
            )
            # ship every payload column the feed carries — column
            # pruning below the struct happens in the optimizer; the
            # row COUNT (changed keys only) is what bounds the work
            payload_cols = [
                f.name for f in feed.schema["old_values"].dataType.fields
            ]
            rows = _signed_rows_from_feed(feed, keys, payload_cols)
        # r15 (guide §5): the signed rows feed up to THREE consumers
        # (positive partials, negative partials, the shrunk-group set) —
        # lazily the diff re-ran per consumer.  Persist for the
        # refresh's lifetime (released below); size is bounded by
        # CHANGED keys, the same bound the refresh already relies on.
        from pyspark import StorageLevel

        rows = rows.persist(StorageLevel.MEMORY_AND_DISK)
        has_minmax = any(kind in ("min", "max") for _, kind, _ in measures)
        if not has_minmax:
            parts = [
                _partials(rows, group_cols, measures, sign=F.col("__sign"))
            ]
        else:
            # min/max present: split the signed work.  New-side rows
            # (inserts / update-new) contribute unsigned partials — they
            # can only TIGHTEN an extreme, so the min/max merge absorbs
            # them.  Old-side rows (deletes / update-old) subtract from
            # the invertible internals; their min/max columns ride as
            # NULL (ignored by min/max merge) and their groups are
            # collected for targeted recompute below.
            pos = _partials(
                rows.filter(F.col("__sign") == 1), group_cols, measures
            )
            signed_kinds = [
                m for m in measures if m[1] in _SIGNED_KINDS
            ]
            neg = _partials(
                rows.filter(F.col("__sign") == -1),
                group_cols,
                signed_kinds,
                sign=F.lit(-1),
            )
            for name, kind, _ in measures:
                if kind in ("min", "max"):
                    neg = neg.withColumn(name, F.lit(None))
            parts = [pos, neg.select(pos.columns)]
            shrunk = (
                rows.filter(F.col("__sign") == -1)
                .select(*group_cols)
                .distinct()
            )
        path = "keyed-diff"

    merged = current
    for p in parts:
        merged = merged.unionByName(p)
    merged = (
        merged.groupBy(*group_cols)
        .agg(*_merge_aggs(measures))
        .filter(F.col(_N) > 0)
    )
    if shrunk is not None:
        # a group that lost a row may have lost its extreme — no stored
        # partial can repair that, so recompute EXACTLY those groups
        # from the base snapshot: one scan pruned to the shrunk-group
        # join (broadcast — bounded by changed groups; group-clustered
        # layouts additionally file-prune it), every other group keeps
        # its maintained row untouched
        def _on(a: DataFrame, b: DataFrame):
            cond = None
            for c in group_cols:
                e = a[c].eqNullSafe(b[c])  # NULL is a group too
                cond = e if cond is None else (cond & e)
            return cond

        base_snap = V.read_version(spark, base_table, base_new)
        recomputed = _partials(
            base_snap.join(
                F.broadcast(shrunk), _on(base_snap, shrunk), "left_semi"
            ),
            group_cols,
            measures,
        )
        kept = merged.join(
            F.broadcast(shrunk), _on(merged, shrunk), "left_anti"
        )
        merged = kept.unionByName(recomputed.select(kept.columns))
    new_spec = dict(spec, base_version=base_new)
    try:
        view_version = V.commit_write(
            merged.coalesce(1),
            view_table,
            mode="overwrite",
            txn=txn,
            meta={"matview": new_spec},
        )
    finally:
        if path == "keyed-diff":
            rows.unpersist(blocking=False)
    return {
        "path": path,
        "from_version": base_old,
        "to_version": base_new,
        "view_version": view_version,
    }


def read_matview(
    spark: SparkSession, view_table: str, version: int | None = None
) -> DataFrame:
    """The view's serving read: group columns + declared measures.  The
    internal row-count guard stays internal, and ``avg`` measures are
    derived here — exactly — from their maintained sum/count internals
    (NULL when every contributing value was NULL, SQL AVG semantics)."""
    df = V.read_version(spark, view_table, version)
    spec = V.commit_meta(
        view_table, V.latest_version(view_table) if version is None else version
    ).get("matview")
    measures = [tuple(m) for m in (spec or {}).get("measures", [])]
    for name, kind, _ in measures:
        if kind == "avg":
            s, c = F.col(name + "__sum"), F.col(name + "__cnt")
            df = df.withColumn(
                name, F.when(c > 0, s / c)
            ).drop(name + "__sum", name + "__cnt")
    return df.drop(_N)


def maintained_matview_sink(
    base_table: str, view_table: str, query_name: str = "mv-stream"
):
    """Streaming maintenance for the view, symmetric with the IVF/BM25
    index sinks: a ``foreachBatch`` sink that appends each micro-batch
    to the BASE table (txn-idempotent — the versioned_sink contract)
    and immediately advances the view from the commit log's delta, so
    the serving aggregate is fresh within one trigger of the data.
    Crash replay is safe on both steps: a replayed batch adopts its
    existing base commit, and the refresh txn is keyed on the batch id
    so the view adopts too (a refresh that already happened is also a
    natural noop — the base version pointer caught up)."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        V.commit_write(
            batch, base_table, mode="append", txn=f"{query_name}-{batch_id}"
        )
        refresh_matview(
            batch.sparkSession, view_table, txn=f"{query_name}-mv-{batch_id}"
        )

    return _sink
