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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
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
    # datetime.date / datetime.datetime literals — same ISO rendering
    import datetime

    def _norm(v):
        return str(v) if isinstance(v, (datetime.date, datetime.datetime)) else v

    if op == "in":
        value = [_norm(v) for v in value]
    else:
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
    Spark schema declares)."""
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    table = pq.read_table(path, columns=[f.name for f in schema.fields])
    yield from table.cast(target).to_batches()


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
    return from_arrow_schema(arrow)


class VersionedBatchReader(DataSourceReader):
    def __init__(self, schema: StructType, table: str, version: int | None):
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


class VersionedTableDataSource(DataSource):
    """``format("zeal_versioned")``; options:

    * ``path`` — table root (required)
    * ``version`` — batch time travel (default: latest)
    * ``startingVersion`` — streaming: first micro-batch reads commits
      AFTER this version (default 0 = from the first commit)
    * ``skipChangeCommits`` — streaming: pass over overwrite commits
      instead of failing (default false)
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


def register(spark) -> None:
    """Register the format on a session:
    ``versioned_datasource.register(spark)`` then
    ``spark.read.format("zeal_versioned").option("path", t).load()``."""
    spark.dataSource.register(VersionedTableDataSource)
