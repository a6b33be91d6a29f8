"""[EXT] PySpark Python DataSource over the versioned commit-log table
(`versioned.py`) — ``spark.read.format("zeal_versioned")`` and
``spark.readStream.format("zeal_versioned")``.

Why a real data source instead of the helper functions: the helpers
(`read_version`, `read_where`) are driver-side conveniences; the data
source makes the table format a first-class Spark citizen —

* **Batch**: snapshot reads at any version, with Catalyst filter
  pushdown (`pushFilters`, Spark 4.1) mapped onto the commit log's
  per-file min/max stats, so planning SKIPS files before a single task
  launches.  Filters are used for pruning only and are all returned as
  residuals — Spark still applies them row-by-row, so pruning can never
  change semantics (the parquet PushedFilters contract).
* **Streaming**: commit VERSIONS are the offsets.  Each micro-batch
  reads exactly the directories appended by commits in
  ``(start, end]``; the checkpoint persists the version watermark, so a
  restarted query resumes from the last committed version — end-to-end
  exactly-once against the table's atomic commit protocol, the same
  offsets-in-checkpoint design as Kafka's.  An ``overwrite`` commit in
  the range fails loudly (a rewrite is not consumable as a delta)
  unless ``skipChangeCommits=true`` — Delta CDF's escape hatch — in
  which case rewrite commits are passed over and only later appends
  flow.

Executor reads go through pyarrow batch iteration (Arrow RecordBatches
straight into Spark's columnar path, cast to the session schema), one
input partition per parquet file — the natural parallelism of the
format, no shuffle anywhere.
"""

from __future__ import annotations

import os
from typing import Iterator

from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from . import versioned as V

FORMAT_NAME = "zeal_versioned"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _filter_to_predicate(f: Filter):
    """Map a Catalyst filter to the commit-stats predicate language.
    Returns None for shapes the stats cannot prune (nested columns,
    unsupported operators) — those files are simply kept."""
    ops = {
        EqualTo: "=",
        GreaterThan: ">",
        GreaterThanOrEqual: ">=",
        LessThan: "<",
        LessThanOrEqual: "<=",
        In: "in",
    }
    op = ops.get(type(f))
    if op is None or len(f.attribute) != 1:
        return None
    value = f.value
    if op != "in" and isinstance(value, (list, tuple)):
        return None
    # stats store dates/timestamps as ISO strings; Catalyst hands
    # datetime.date / datetime.datetime literals — same ISO rendering.
    # A None literal (EqualTo(col, null)) or a non-orderable type would
    # raise TypeError inside _predicate_may_match during PLANNING and
    # fail the whole scan (round-7 advice) — such filters prune nothing.
    import datetime

    _orderable = (bool, int, float, str, datetime.date, datetime.datetime)

    def _norm(v):
        return str(v) if isinstance(v, (datetime.date, datetime.datetime)) else v

    if op == "in":
        vals = [v for v in value if isinstance(v, _orderable)]
        if not vals:
            return None
        value = [_norm(v) for v in vals]
    else:
        if not isinstance(value, _orderable):
            return None
        value = _norm(value)
    return (f.attribute[0], op, value)


def _pruned_file_partitions(
    table: str, version: int | None, predicates: list[tuple]
) -> list[_FilePartition]:
    paths, _, _ = V.pruned_paths(table, predicates, version)
    parts: list[_FilePartition] = []
    for p in paths:
        if os.path.isdir(p):  # pre-stats commit: expand to its files
            parts.extend(
                _FilePartition(os.path.join(p, n))
                for n in sorted(os.listdir(p))
                if n.endswith(".parquet")
            )
        else:
            parts.append(_FilePartition(p))
    return parts


def _read_file_batches(path: str, schema: StructType) -> Iterator:
    """Arrow batches of one parquet file, cast to the session schema
    (pyarrow may surface different timestamp/integer widths than the
    Spark schema declares).  Files written BEFORE a schema evolution lack
    the added columns — those are null-filled, the same read semantics
    as the native path's ``read_version(merge_schema=True)``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    names = [f.name for f in schema.fields]
    present = set(pq.read_schema(path).names)
    table = pq.read_table(path, columns=[n for n in names if n in present])
    for n in names:
        if n not in present:
            table = table.append_column(
                n, pa.nulls(table.num_rows, type=target.field(n).type)
            )
    yield from table.select(names).cast(target).to_batches()


class SchemaEvolutionError(ValueError):
    """An append's schema does not match the table's (round-7 directive
    #6 — the writer declares its policy instead of committing whatever
    arrives):

    * identical schema — always allowed.
    * pure column ADDITIONS (every existing column keeps its name and
      type) — allowed only with ``option("mergeSchema", "true")``; the
      commit then EVOLVES the table (the log's newest commit carries the
      widened schema, so subsequent reads surface it and older files
      null-fill the added columns).
    * anything else (dropped columns, type changes) — always refused;
      rewrite via ``mode("overwrite")`` if the change is intended.
    """


def _validate_write_schema(
    table: str, schema: StructType, overwrite: bool, merge_schema: bool
) -> None:
    """Driver-side, fail-fast (before any task stages a file): enforce
    the append schema policy above.  An empty table bootstraps with any
    schema; an overwrite replaces the live file-set wholesale, so its
    schema IS the new table schema."""
    if overwrite:
        return
    try:
        current = _infer_schema(table, None)
    except (FileNotFoundError, ValueError, IndexError):
        return  # no commits (or no live data files) yet: bootstrap
    cur = {f.name: f.dataType.simpleString() for f in current.fields}
    new = {f.name: f.dataType.simpleString() for f in schema.fields}
    if cur == new:
        return
    dropped = sorted(set(cur) - set(new))
    changed = sorted(
        c for c in set(cur) & set(new) if cur[c] != new[c]
    )
    if dropped or changed:
        raise SchemaEvolutionError(
            f"append to {table} is incompatible with the table schema: "
            f"dropped columns {dropped}, type changes "
            f"{[(c, cur[c], new[c]) for c in changed]}; use "
            'mode("overwrite") to rewrite the table'
        )
    added = sorted(set(new) - set(cur))
    if not merge_schema:
        raise SchemaEvolutionError(
            f"append to {table} adds columns {added}; set "
            '.option("mergeSchema", "true") to evolve the table schema '
            "(older files will read the new columns as NULL)"
        )


def _infer_schema(table: str, version: int | None) -> StructType:
    """Schema of the newest live directory's first file, via the same
    arrow->spark mapping the reader uses (driver-side, footer only)."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import from_arrow_schema

    dirs = V.live_dirs(table, version)
    files = sorted(
        n for n in os.listdir(dirs[-1]) if n.endswith(".parquet")
    )
    if not files:
        raise FileNotFoundError(f"no parquet files in {dirs[-1]}")
    arrow = pq.read_schema(os.path.join(dirs[-1], files[0]))
    inferred = from_arrow_schema(arrow)
    # report every column nullable, like Spark's own parquet reader: the
    # footer's non-null flag is per-FILE, and schema evolution makes any
    # column null-filled in files that predate it
    for f in inferred.fields:
        f.nullable = True
    return StructType(inferred.fields)


class VersionedBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, table: str, version: int | None):
        if V.live_dv_dirs(table, version):
            # the Python DataSource reads raw file batches with no
            # _metadata pseudo-column to key the tombstone anti-join on —
            # serving such a table here would silently RESURRECT deleted
            # rows.  Loud beats wrong; the DataFrame path applies DVs.
            raise NotImplementedError(
                f"{table} has live positional deletes (delete_where_dv); "
                "the zeal_versioned DataSource cannot apply them — read "
                "via versioned.read_version, or materialize with "
                "compact() first"
            )
        self._schema = schema
        self._table = table
        self._version = version
        self._predicates: list[tuple] = []

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        for f in filters:
            pred = _filter_to_predicate(f)
            if pred is not None:
                self._predicates.append(pred)
        # pruning-only pushdown: every filter stays a residual, so Spark
        # re-applies them all and stats pruning cannot change semantics
        return filters

    def partitions(self):
        return _pruned_file_partitions(
            self._table, self._version, self._predicates
        )

    def read(self, partition: _FilePartition):
        yield from _read_file_batches(partition.path, self._schema)


class VersionedStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        schema: StructType,
        table: str,
        starting_version: int,
        skip_change_commits: bool,
    ):
        self._schema = schema
        self._table = table
        self._start = starting_version
        self._skip_changes = skip_change_commits

    def initialOffset(self):  # noqa: N802
        return {"version": self._start}

    def latestOffset(self):  # noqa: N802
        versions = V._list_versions(self._table)
        return {"version": versions[-1] if versions else self._start}

    def partitions(self, start, end):
        lo, hi = start["version"], end["version"]
        versions = V._list_versions(self._table)
        parts: list[_FilePartition] = []
        for v in versions:
            if v <= lo or v > hi:
                continue
            entry = V._read_entry(self._table, v)
            # The table's FIRST commit is the bootstrap snapshot — pure
            # initial data with nothing before it to rewrite, so it is
            # always consumable.  Any LATER overwrite replaces rows the
            # stream already emitted and is not expressible as a delta.
            if entry["action"] == "overwrite" and v != versions[0]:
                if self._skip_changes:
                    continue
                raise ValueError(
                    f"version {v} is an overwrite — a rewrite is not "
                    "consumable as a delta; set skipChangeCommits=true "
                    "to pass over rewrite commits"
                )
            if entry["action"] == "delete_dv":
                # positional deletes carry no appended rows; like
                # overwrites they are not an append delta — skippable
                # under the same flag, loud otherwise
                if self._skip_changes:
                    continue
                raise ValueError(
                    f"version {v} is a positional delete — not consumable "
                    "as an append delta; set skipChangeCommits=true to "
                    "pass over delete commits"
                )
            for d in entry["dirs"]:
                full = os.path.join(self._table, d)
                parts.extend(
                    _FilePartition(os.path.join(full, n))
                    for n in sorted(os.listdir(full))
                    if n.endswith(".parquet")
                )
        return parts

    def read(self, partition: _FilePartition):
        yield from _read_file_batches(partition.path, self._schema)

    def commit(self, end):
        pass  # the checkpoint IS the commit record; nothing table-side


@dataclass
class _FileCommit(WriterCommitMessage):
    """Per-task result: the staged file plus ITS OWN statistics —
    computed from the Arrow batches as they stream through the task, so
    the job commit needs no read-back aggregate at all (the DataFrame
    path pays one; this path gets stats for free)."""

    file: str | None = None
    n_rows: int = 0
    stats: dict = field(default_factory=dict)


def _arrow_stat_bounds(arrow_schema):
    """Running per-column min/max over arrow batches for stat-eligible
    columns (numeric / string / date / timestamp — the same set the
    commit log records); date-likes serialize to ISO strings."""
    import pyarrow as pa
    import pyarrow.compute as pc

    eligible = {}
    for f in arrow_schema:
        t = f.type
        if (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
        ):
            eligible[f.name] = False
        elif pa.types.is_date(t) or pa.types.is_timestamp(t):
            eligible[f.name] = True  # ISO-serialize
    bounds: dict[str, list] = {c: [None, None] for c in eligible}

    def update(batch):
        for c, iso in eligible.items():
            col = batch.column(batch.schema.get_field_index(c))
            if col.null_count == len(col):
                continue
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if iso:
                lo, hi = str(lo), str(hi)
            b = bounds[c]
            if lo is not None and (b[0] is None or lo < b[0]):
                b[0] = lo
            if hi is not None and (b[1] is None or hi > b[1]):
                b[1] = hi

    return bounds, update


class VersionedWriter(DataSourceArrowWriter):
    """Batch write path: Spark's two-phase writer commit protocol mapped
    1:1 onto the table's commit log.  Tasks stream their Arrow batches
    into a uniquely-named parquet file under ``data/.inflight/``
    (invisible to every reader — only committed log entries are
    readable), computing per-file stats inline; the DRIVER's job commit
    renames the staged files into a fresh commit directory and publishes
    one atomic log entry via the shared `_publish_entry` protocol.  A
    failed job aborts by deleting its staged files; a crash leaves only
    `.inflight` orphans that `vacuum` reaps file-by-file after the
    retention window.  On object stores the renames become copies —
    same protocol, documented cost."""

    def __init__(self, table: str, overwrite: bool, txn: str | None = None):
        self._table = table
        self._mode = "overwrite" if overwrite else "append"
        self._txn = txn
        # snapshot basis for optimistic conflict checking (batch path
        # only — a long-lived stream's basis would go stale across its
        # own micro-batches; its safety is the per-batch txn dedup)
        self._basis = (V._list_versions(table) or [0])[-1]

    def write(self, iterator):
        import pyarrow.parquet as pq

        inflight = os.path.join(self._table, V._DATA_DIR, V._INFLIGHT_DIR)
        os.makedirs(inflight, exist_ok=True)
        import uuid

        name = f"part-{uuid.uuid4().hex}.parquet"
        path = os.path.join(inflight, name)
        writer = None
        bounds = update = None
        n = 0
        for batch in iterator:
            if writer is None:
                writer = pq.ParquetWriter(path, batch.schema)
                bounds, update = _arrow_stat_bounds(batch.schema)
            writer.write_batch(batch)
            update(batch)
            n += batch.num_rows
        if writer is None:  # empty task partition: nothing staged
            return _FileCommit()
        writer.close()
        return _FileCommit(file=name, n_rows=n, stats=bounds)

    def _assemble(self, messages):
        """(entry, staged file names) from the task commit messages —
        the driver-side half shared with the streaming writer."""
        files = [m for m in messages if m is not None and m.file]
        n_rows = sum(m.n_rows for m in files)
        file_stats = {m.file: m.stats for m in files}
        dir_stats: dict[str, list] = {}
        for m in files:
            for c, (lo, hi) in m.stats.items():
                d = dir_stats.setdefault(c, [None, None])
                if lo is not None and (d[0] is None or lo < d[0]):
                    d[0] = lo
                if hi is not None and (d[1] is None or hi > d[1]):
                    d[1] = hi
        return n_rows, dir_stats, file_stats, [m.file for m in files]

    def _commit(self, messages, txn, read_version=None):
        import uuid

        existing = V._txn_committed_version(self._table, txn)
        inflight = os.path.join(self._table, V._DATA_DIR, V._INFLIGHT_DIR)
        n_rows, dir_stats, file_stats, names = self._assemble(messages)
        if existing is not None:
            # replayed job whose txn already committed: drop the
            # re-staged files, keep exactly-once
            for name in names:
                try:
                    os.unlink(os.path.join(inflight, name))
                except FileNotFoundError:
                    pass
            return existing
        staging = f"v{uuid.uuid4().hex[:12]}"
        final = os.path.join(self._table, V._DATA_DIR, staging)
        dirs = []
        if names:
            os.makedirs(final)
            for name in names:
                os.rename(
                    os.path.join(inflight, name), os.path.join(final, name)
                )
            dirs = [f"{V._DATA_DIR}/{staging}"]
        entry = {
            "action": self._mode,
            "dirs": dirs,
            "n_rows": n_rows,
            "stats": dir_stats,
            "file_stats": file_stats,
        }
        return V._publish_entry(
            self._table, entry, txn, read_version=read_version
        )

    def commit(self, messages):
        self._commit(messages, self._txn, read_version=self._basis)

    def abort(self, messages):
        inflight = os.path.join(self._table, V._DATA_DIR, V._INFLIGHT_DIR)
        for m in messages:
            if m is not None and m.file:
                try:
                    os.unlink(os.path.join(inflight, m.file))
                except FileNotFoundError:
                    pass


class VersionedStreamWriter(VersionedWriter, DataSourceStreamArrowWriter):
    """Streaming sink through the same protocol: each micro-batch
    commits with ``txn = <prefix>-<batchId>``, so Structured Streaming's
    replay of a batch after a crash between sink success and checkpoint
    advance is a no-op (the same exactly-once contract as
    `versioned.versioned_sink`, now reachable as
    ``writeStream.format("zeal_versioned")``)."""

    def __init__(self, table: str, overwrite: bool, txn_prefix: str):
        super().__init__(table, overwrite)
        self._prefix = txn_prefix

    def commit(self, messages, batchId):  # noqa: N803 (Spark API name)
        self._commit(messages, f"{self._prefix}-{batchId}")

    def abort(self, messages, batchId):  # noqa: N803
        VersionedWriter.abort(self, messages)


class VersionedTableDataSource(DataSource):
    """``format("zeal_versioned")``; options:

    * ``path`` — table root (required)
    * ``version`` — batch time travel (default: latest)
    * ``startingVersion`` — streaming: first micro-batch reads commits
      AFTER this version (default 0 = from the first commit)
    * ``skipChangeCommits`` — streaming: pass over overwrite commits
      instead of failing (default false)
    * ``txn`` — batch write: idempotence id (an orchestrator retry of a
      committed job is a no-op)
    * ``txnPrefix`` — streaming write: per-batch txn ids are
      ``<prefix>-<batchId>`` (default ``stream``); give each query a
      distinct prefix when several streams append to one table
    * ``mergeSchema`` — write: allow an append that ADDS columns to
      evolve the table schema (default false: schema drift fails loudly
      at plan time; dropped columns / type changes always fail — see
      :class:`SchemaEvolutionError`)
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("zeal_versioned requires a path")
        return path

    def _version(self) -> int | None:
        v = self.options.get("version")
        return int(v) if v is not None else None

    def schema(self) -> StructType:
        return _infer_schema(self._table(), self._version())

    def reader(self, schema: StructType) -> VersionedBatchReader:
        return VersionedBatchReader(schema, self._table(), self._version())

    def streamReader(self, schema: StructType) -> VersionedStreamReader:  # noqa: N802
        return VersionedStreamReader(
            schema,
            self._table(),
            int(self.options.get("startingversion", 0)),
            str(self.options.get("skipchangecommits", "false")).lower()
            == "true",
        )

    def _merge_schema(self) -> bool:
        return str(self.options.get("mergeschema", "false")).lower() == "true"

    def writer(self, schema: StructType, overwrite: bool) -> VersionedWriter:
        table = self._table()
        _validate_write_schema(table, schema, overwrite, self._merge_schema())
        return VersionedWriter(table, overwrite, self.options.get("txn"))

    def streamWriter(  # noqa: N802
        self, schema: StructType, overwrite: bool
    ) -> VersionedStreamWriter:
        table = self._table()
        _validate_write_schema(table, schema, overwrite, self._merge_schema())
        return VersionedStreamWriter(
            table,
            overwrite,
            self.options.get("txnprefix", "stream"),
        )


def register(spark) -> None:
    """Register the format on a session:
    ``versioned_datasource.register(spark)`` then
    ``spark.read.format("zeal_versioned").option("path", t).load()``."""
    spark.dataSource.register(VersionedTableDataSource)
