"""[EXT] Versioned parquet tables with an atomic commit log — the
exactly-once BATCH sink the plain directory sink cannot be.

A minimal transaction-log table format (the public Delta-Lake/_delta_log
protocol shape, reimplemented from scratch for a filesystem):

```
<table>/
  _log/00000000000001.json   one JSON doc per commit (see below)
  data/v1-<nonce>/part-*.parquet   one staging dir per commit
```

Protocol:

* **Write**: data files land in a fresh uniquely-named directory under
  ``data/`` — invisible to readers until referenced by a committed log
  entry.  The commit payload is fully staged (temp file + fsync) and then
  PUBLISHED as the next numbered ``_log/<version>.json`` with an atomic
  hard link — readers see either no entry or a complete one, never a
  torn write.  Two concurrent writers racing for the same version: one
  wins the link, the loser retries at the next number (optimistic
  concurrency).  A crash before commit leaves only an orphaned staging
  dir that no reader ever sees; ``vacuum`` removes it after a retention
  window.
* **Read**: replay the log up to the requested version — ``overwrite``
  resets the live file-set, ``append`` extends it — then read exactly
  those directories.  ``version=None`` reads latest; any earlier version
  is time travel over unchanged immutable files.
* **Idempotent retries**: a commit may carry a ``txn`` id; committing
  the same id again is a silent no-op, so an at-least-once orchestrator
  retrying a crashed-AFTER-commit job cannot double-append (the same
  write-then-commit ordering contract as the streaming upsert sink).

On object stores swap the hard-link publish for a conditional put /
atomic rename; the rest of the protocol is storage-agnostic.  The log is
tiny (one JSON doc per commit) and replay is a driver-side listing —
data files never move after their one write.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG_DIR = "_log"
_DATA_DIR = "data"


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def _entry_name(version: int) -> str:
    return f"{version:014d}.json"


def _list_versions(table: str) -> list[int]:
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        if name.endswith(".json"):
            try:
                out.append(int(name[:-5]))
            except ValueError:
                continue
    return sorted(out)


def _read_entry(table: str, version: int) -> dict:
    with open(os.path.join(_log_path(table), _entry_name(version))) as f:
        return json.load(f)


def commit_write(
    df: DataFrame,
    table: str,
    mode: str = "append",
    txn: str | None = None,
    max_retries: int = 20,
) -> int:
    """Write ``df`` into the table as one atomic commit; returns the
    committed version.  ``mode`` is ``append`` or ``overwrite``.  With
    ``txn`` set, a commit whose id already appears in the log is skipped
    (idempotent retry) and the existing version is returned."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode: {mode!r}")
    os.makedirs(_log_path(table), exist_ok=True)

    def _txn_already_committed() -> int | None:
        if txn is None:
            return None
        for v in _list_versions(table):
            if _read_entry(table, v).get("txn") == txn:
                return v
        return None

    existing = _txn_already_committed()
    if existing is not None:
        return existing
    staging = f"v{uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(table, _DATA_DIR, staging)
    df.write.mode("error").parquet(data_dir)
    # footer-only count of the files just written (no data scan): recorded
    # in the commit so metadata-only queries (stats/row counts) never
    # touch data files — the lakehouse aggregate-pushdown shortcut
    n_rows = df.sparkSession.read.parquet(data_dir).count()
    entry = {
        "action": mode,
        "dirs": [f"{_DATA_DIR}/{staging}"],
        "n_rows": n_rows,
    }
    if txn is not None:
        entry["txn"] = txn
    payload = json.dumps(entry, sort_keys=True).encode()
    # Stage the FULL payload first (temp name + fsync), then publish with
    # an atomic hard link: readers either see no entry or a complete one.
    # A bare O_EXCL-create-then-write has a crash window where a 0-byte
    # <version>.json exists and every reader chokes on it forever.
    tmp = os.path.join(_log_path(table), f".tmp-{uuid.uuid4().hex[:12]}")
    with open(tmp, "wb") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        for _ in range(max_retries):
            version = (_list_versions(table) or [0])[-1] + 1
            target = os.path.join(_log_path(table), _entry_name(version))
            try:
                os.link(tmp, target)  # atomic; fails if the slot is taken
            except FileExistsError:
                # lost the race — a concurrent retry of the SAME txn may
                # have won it, so re-check before claiming a new version
                existing = _txn_already_committed()
                if existing is not None:
                    return existing
                continue
            return version
    finally:
        os.unlink(tmp)
    raise RuntimeError(f"could not commit to {table} after {max_retries} races")


def live_dirs(table: str, version: int | None = None) -> list[str]:
    """The data directories visible at ``version`` (default: latest),
    by log replay.  Raises if the table has no commits or the requested
    version does not exist."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"no commits in {table}")
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    live: list[str] = []
    for v in versions:
        if v > version:
            break
        entry = _read_entry(table, v)
        if entry["action"] == "overwrite":
            live = list(entry["dirs"])
        else:
            live.extend(entry["dirs"])
    return [os.path.join(table, d) for d in live]


def read_version(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Snapshot read of the table at ``version`` (latest by default).
    ``merge_schema=True`` unions the schemas of every live directory —
    the schema-evolution read for tables whose appends added columns
    over time (older commits surface new columns as NULL)."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*live_dirs(table, version))


def change_feed(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int,
    keys: list[str],
) -> DataFrame:
    """Keyed change feed between two committed versions: insert / update /
    delete rows with old/new values — :func:`..operators.cdc.table_diff`
    over two snapshot reads, so downstream CDC consumers (SCD2 history,
    incremental rollups) work off the table format directly.  Cost is the
    diff's one full-outer key join; both snapshots read only their live
    directories."""
    from ..operators.cdc import table_diff

    return table_diff(
        read_version(spark, table, from_version),
        read_version(spark, table, to_version),
        keys=keys,
    )


def compact(spark: SparkSession, table: str, txn: str | None = None) -> int:
    """OPTIMIZE: rewrite the CURRENT snapshot as one fresh commit (new
    compacted files, one atomic overwrite) — readers never see a partial
    rewrite, historical versions stay readable over their original
    files, and ``vacuum`` still only ever removes uncommitted orphans."""
    snap = read_version(spark, table)
    return commit_write(snap, table, mode="overwrite", txn=txn)


def merge_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
    txn: str | None = None,
) -> int:
    """MERGE INTO the versioned table: read the latest snapshot, apply a
    latest-wins keyed upsert (:func:`..operators.cdc.merge_latest` — the
    shared CDC kernel), and commit the merged state as ONE atomic
    overwrite version.  Readers see either the old snapshot or the fully
    merged one, never a partial state; with ``txn``, orchestrator
    retries are idempotent.  An empty table bootstraps from the updates
    alone (MERGE's WHEN NOT MATCHED INSERT degenerate case)."""
    from ..operators.cdc import merge_latest

    try:
        base = read_version(spark, table)
    except FileNotFoundError:
        merged = updates
    else:
        merged = merge_latest(base, updates, keys, order_col, tiebreak)
    return commit_write(merged, table, mode="overwrite", txn=txn)


def versioned_sink(table: str, query_name: str = "stream"):
    """Exactly-once streaming sink: a ``foreachBatch`` function that
    appends each micro-batch as one atomic commit carrying
    ``txn = "<query_name>-<batch_id>"``.  Structured Streaming replays a
    micro-batch after a crash between sink success and checkpoint
    advance; the txn dedup makes the replay a no-op — the same
    write-then-commit contract as the JDBC upsert sink, without needing
    keyed idempotence from the data itself."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        commit_write(
            batch, table, mode="append", txn=f"{query_name}-{batch_id}"
        )

    return _sink


def table_stats(table: str) -> list[dict]:
    """Metadata-only per-version statistics from log replay — no data
    file is ever opened: each row reports the commit's action, its own
    row count, and the cumulative snapshot row count at that version.
    Commits from before stats were recorded surface ``None`` counts
    (and poison the cumulative count downstream of them) rather than
    guessing."""
    out: list[dict] = []
    live: dict[int, int | None] = {}  # commit version -> its row count
    for v in _list_versions(table):
        entry = _read_entry(table, v)
        n = entry.get("n_rows")
        if entry["action"] == "overwrite":
            live = {}
        live[v] = n
        counts = list(live.values())
        total = None if any(c is None for c in counts) else sum(counts)
        out.append(
            {
                "version": v,
                "action": entry["action"],
                "commit_rows": n,
                "snapshot_rows": total,
            }
        )
    return out


def vacuum(table: str, retention_seconds: float = 6 * 3600) -> list[str]:
    """Remove data directories referenced by NO committed version —
    leftovers of writes that crashed before their commit — plus orphaned
    log staging files.  Time travel stays intact: every dir referenced by
    ANY commit is kept.  Only artifacts older than ``retention_seconds``
    are removed (Delta-style retention): an unreferenced dir younger than
    that may belong to a LIVE writer between its data write and its log
    commit, and deleting it would corrupt the commit it is about to make.
    Returns the removed paths."""
    import shutil
    import time

    cutoff = time.time() - retention_seconds
    referenced: set[str] = set()
    for v in _list_versions(table):
        referenced.update(_read_entry(table, v)["dirs"])
    data_root = os.path.join(table, _DATA_DIR)
    removed = []
    if os.path.isdir(data_root):
        for name in sorted(os.listdir(data_root)):
            rel = f"{_DATA_DIR}/{name}"
            path = os.path.join(data_root, name)
            if rel not in referenced and os.path.getmtime(path) < cutoff:
                shutil.rmtree(path)
                removed.append(path)
    log_root = _log_path(table)
    if os.path.isdir(log_root):
        for name in sorted(os.listdir(log_root)):
            if name.startswith(".tmp-"):
                path = os.path.join(log_root, name)
                if os.path.getmtime(path) < cutoff:
                    os.unlink(path)
                    removed.append(path)
    return removed
