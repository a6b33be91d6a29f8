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
  wins the link, the loser re-checks and retries (optimistic
  concurrency).  A crash before commit leaves only an orphaned staging
  dir that no reader ever sees; ``vacuum`` removes it after a retention
  window.
* **Conflict rules** (Delta-protocol shape): each writer carries the
  snapshot basis it derived its data from; at publish, intervening
  commits from other transactions are checked for commutativity —
  append over append rebases silently to the next version; an append
  losing to an overwrite, or an overwrite/MERGE losing to ANYTHING,
  raises :class:`ConcurrentWriteConflict` (publishing would silently
  drop or resurrect data the writer never read).  Same-txn retries are
  resolved by the idempotence check first and never conflict with
  their own winner.
* **DELETE / UPDATE (copy-on-write)**: :func:`delete_where` /
  :func:`update_where` apply predicate DML as one overwrite commit,
  REWRITING only the files whose
  recorded per-file min/max can contain a match and HARD-LINKING every
  provably-untouched file into the new commit (zero bytes copied or
  scanned; stats carried forward, row counts from parquet footers).
  The write side of the same two-tier stats that power read skipping.
* **Read**: replay the log up to the requested version — ``overwrite``
  resets the live file-set, ``append`` extends it — then read exactly
  those directories.  ``version=None`` reads latest; any earlier version
  is time travel over unchanged immutable files.
* **Idempotent retries**: a commit may carry a ``txn`` id; committing
  the same id again is a silent no-op, so an at-least-once orchestrator
  retrying a crashed-AFTER-commit job cannot double-append (the same
  write-then-commit ordering contract as the streaming upsert sink).
  The id re-check runs AFTER the slow data write, inside the publish
  loop — a concurrent retry of the same txn that commits while this
  writer is still staging data is caught before this writer claims a
  version, not only when the two race for the same version number.
* **Data skipping**: each commit records per-column min/max over its
  own files (one aggregate job at write time); predicate reads replay
  the log and open only directories whose recorded range can match —
  the format's analog of the reference's B-tree indexes
  (``migrations/001_initial_schema.sql:16-23``) and of the z-order +
  parquet-footer pruning path for plain directories.

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
#: shared task-staging area used by the zeal_versioned DataSource writer
#: (tasks write here; the driver's job commit renames into a commit dir)
_INFLIGHT_DIR = ".inflight"


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


class VersionExpiredError(ValueError):
    """Raised on any read of a version below the table's protected floor
    (expired by ``vacuum(min_retained_version=...)``).  Loud by design —
    the alternative is a confusing missing-parquet error, or worse a
    silently wrong snapshot assembled from partially-deleted dirs."""


#: marker file under the log dir recording the protected-versions floor
#: (deliberately NOT ``*.json`` so ``_list_versions`` never parses it)
_FLOOR_FILE = "_min_retained"


def _retention_floor(table: str) -> int:
    """The protected-versions floor: versions BELOW this are expired
    (their unreachable data dirs may have been vacuumed).  0 = nothing
    expired."""
    path = os.path.join(_log_path(table), _FLOOR_FILE)
    try:
        with open(path) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def _write_retention_floor(table: str, floor: int) -> int:
    """Persist the floor, monotonically (a lower request never un-expires
    versions) and atomically (tmp + rename, same recipe as log commits).
    Returns the effective floor."""
    floor = max(floor, _retention_floor(table))
    log = _log_path(table)
    os.makedirs(log, exist_ok=True)
    tmp = os.path.join(log, f".tmp-{_FLOOR_FILE}-{os.getpid()}")
    with open(tmp, "w") as f:
        f.write(str(floor))
    os.replace(tmp, os.path.join(log, _FLOOR_FILE))
    return floor


def _check_not_expired(table: str, version: int | None) -> None:
    if version is None:
        return
    floor = _retention_floor(table)
    if version < floor:
        raise VersionExpiredError(
            f"version {version} of {table} was expired by "
            f"vacuum(min_retained_version={floor}); the oldest readable "
            f"version is {floor}.  Pin readers above the floor before "
            "vacuuming (snapshot-isolation contract: the floor is the "
            "writer's declaration that no reader holds versions below it)."
        )


# Column types whose min/max are JSON-representable and totally ordered —
# the only ones worth recording for data skipping.  Dates/timestamps are
# stored as ISO strings (lexicographic order == chronological order, so
# string comparison prunes correctly); arrays/structs/binary are skipped.
_STAT_NUMERIC = ("byte", "short", "int", "bigint", "float", "double")


def _local_staged_stats(df: DataFrame, data_dir: str):
    """Driver-side twin of :func:`_staged_stats` for LOCAL single-file
    commits (r14 optimization, guide §1.2: remove whole passes).  Model
    frames — centroids, codebooks, manifests, negative-stats rows — are
    arrow local relations whose values already sit on the driver, yet
    the generic path re-read them back from disk with a full Spark
    aggregate job just to learn min/max over a handful of rows.  When
    the staged directory holds exactly ONE parquet file and the frame is
    local (``df.isLocal()``), compute the same (n_rows, dir_stats,
    file_stats) in Python instead: one job saved per model commit.

    Restricted to commits whose stat-eligible columns are all numeric /
    date / timestamp — Python string ordering (code points) differs from
    Java's (UTF-16 code units) for supplementary-plane characters, so
    string-bearing commits keep the Spark path.  NaN replicates Spark's
    ordering (NaN sorts above everything: max picks it when present,
    min only when all values are NaN).  Returns None when not eligible.
    """
    try:
        if not df.isLocal():
            return None
        parts = [
            f for f in os.listdir(data_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if len(parts) != 1:
            return None
        stat_cols, iso = [], set()
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t in _STAT_NUMERIC:
                stat_cols.append(f.name)
            elif t in ("date", "timestamp", "timestamp_ntz"):
                stat_cols.append(f.name)
                iso.add(f.name)
            elif t == "string":
                return None  # string ordering: keep the Spark path
        rows = df.collect()  # local relation: no job, driver-only

        def _mm(vals):
            vals = [v for v in vals if v is not None]
            if not vals:
                return [None, None]
            nan = [v for v in vals if isinstance(v, float) and v != v]
            num = [v for v in vals if not (isinstance(v, float) and v != v)]
            lo = min(num) if num else nan[0]
            hi = nan[0] if nan else max(num)
            return [lo, hi]

        dir_stats: dict[str, list] = {}
        per_file: dict[str, list] = {}
        for c in stat_cols:
            lo, hi = _mm([r[c] for r in rows])
            if c in iso:
                lo = None if lo is None else str(lo)
                hi = None if hi is None else str(hi)
            dir_stats[c] = [lo, hi]
            per_file[c] = [lo, hi]
        return len(rows), dir_stats, {parts[0]: per_file}
    except Exception:
        return None


def _staged_stats(spark: SparkSession, data_dir: str):
    """One aggregate job over a freshly staged directory: row count plus
    per-column [min, max] for every numeric / string / date / timestamp
    column — at PER-FILE granularity (grouped on ``input_file_name``),
    rolled up to the directory bounds in the driver.  Min/max ignore
    NULLs (an all-NULL column records ``None`` bounds and is never pruned
    on).  Returns ``(n_rows, dir_stats, file_stats)`` where file_stats
    maps each parquet basename to its own bounds — the Delta-style
    add-file statistics that let predicate reads skip individual files
    inside a large commit, not just whole commits."""
    from pyspark.sql import functions as F

    staged = spark.read.parquet(data_dir)
    stat_cols = []
    iso = []  # columns serialized via ISO strings
    for f in staged.schema.fields:
        t = f.dataType.simpleString()
        if t in _STAT_NUMERIC or t == "string":
            stat_cols.append(f.name)
        elif t in ("date", "timestamp", "timestamp_ntz"):
            stat_cols.append(f.name)
            iso.append(f.name)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    rows = (
        staged.groupBy(F.input_file_name().alias("__file"))
        .agg(*aggs)
        .collect()
    )

    def _ser(c, v):
        if v is None:
            return None
        # str() of date/datetime is the ISO form ("2024-01-05",
        # "2024-01-05 03:00:00") — lexicographic == chronological
        return str(v) if c in iso else v

    n_rows = 0
    file_stats: dict[str, dict] = {}
    dir_stats: dict[str, list] = {c: [None, None] for c in stat_cols}
    for row in rows:
        n_rows += row["__n"]
        base = row["__file"].rstrip("/").rsplit("/", 1)[-1]
        per_file = {}
        for c in stat_cols:
            lo, hi = _ser(c, row[f"__min_{c}"]), _ser(c, row[f"__max_{c}"])
            per_file[c] = [lo, hi]
            d = dir_stats[c]
            if lo is not None and (d[0] is None or lo < d[0]):
                d[0] = lo
            if hi is not None and (d[1] is None or hi > d[1]):
                d[1] = hi
        file_stats[base] = per_file
    return n_rows, dir_stats, file_stats


def _staged_bloom(
    spark: SparkSession,
    data_dir: str,
    cols: list[str],
    m_bits,
    k: int,
) -> dict:
    """Per-file Bloom bitmaps for the designated point-lookup columns —
    the Delta bloom-filter-index analog, computed over the freshly
    staged directory and recorded in the commit entry so that
    :func:`pruned_paths` can skip files on ``=`` / ``in`` probes that
    min/max bounds cannot prune (unsorted high-cardinality keys: row
    ids, user ids, content hashes).

    Bit positions are ``pmod(xxhash64(col, CAST(i AS BIGINT)), m_bits)``
    for i in 0..k-1 — the JVM expression the driver-side prober
    (:mod:`..functions.xxh64`) replicates bit-for-bit.  The aggregation
    is map-side-combinable and BOUNDED: positions fold to (file, word)
    ``bit_or`` partials, at most ``m_bits/64`` rows per file regardless
    of row count, so the driver collect is ~``n_files x 128`` longs at
    the default 8192-bit layout (1 KiB per file per column in the log).
    NULL keys set no bits — an equality probe can never match NULL, so
    an all-NULL file correctly proves absent.

    ``m_bits="auto"`` (r12) sizes the bitmap from the staged layout: a
    fixed 8192-bit bitmap saturates past ~1.4k keys/file (measured —
    tools/lakehouse_scale_probe.py showed present-key probes keeping
    EVERY file at 6.25k keys/file because the false-positive rate hits
    ~1), so auto picks the smallest power of two >= 10 bits per key of
    the largest file (~0.8% FP at k=6), clamped to [8192, 2^23] —
    at most 1 MiB/file/column in the log, the same bound Delta's
    bloom-filter numItems knob trades against."""
    import base64

    from pyspark.sql import functions as F

    staged = spark.read.parquet(data_dir)
    if m_bits == "auto":
        per_file = (
            staged.groupBy(F.input_file_name())
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        need = 10 * max((int(r["c"]) for r in per_file), default=1)
        m_bits = 8192
        while m_bits < need and m_bits < (1 << 23):
            m_bits *= 2
    n_words = m_bits // 64
    # The JVM dispatches xxhash64 on the COLUMN type: int/short/byte take
    # the 4-byte hashInt path, bigint the 8-byte hashLong path.  Record
    # each column's hash family so the driver-side prober replicates the
    # right one (a hashLong probe of a hashInt bitmap yields false
    # NEGATIVES — silently wrong results); refuse types whose probe
    # literal cannot be mapped (float/date/timestamp/decimal/bool).
    _KINDS = {
        "bigint": "long", "int": "int", "smallint": "int", "tinyint": "int",
        "string": "string", "binary": "binary",
    }
    types: dict[str, str] = {}
    for c in cols:
        sql_type = staged.schema[c].dataType.simpleString()
        kind = _KINDS.get(sql_type)
        if kind is None:
            raise TypeError(
                f"bloom_cols[{c!r}] has type {sql_type}: only bigint/int/"
                "smallint/tinyint/string/binary columns can be Bloom-"
                "indexed (the driver-side prober must replicate the JVM "
                "hash path bit-for-bit)"
            )
        types[c] = kind
    files: dict[str, dict] = {}
    for c in cols:
        pos = F.array(
            *[
                F.pmod(
                    F.xxhash64(F.col(c), F.lit(i).cast("long")),
                    F.lit(m_bits).cast("long"),
                )
                for i in range(k)
            ]
        )
        rows = (
            staged.where(F.col(c).isNotNull())
            .select(F.input_file_name().alias("__file"), F.explode(pos).alias("p"))
            .select(
                "__file",
                F.shiftright(F.col("p"), 6).alias("w"),
                # shiftleft's bit count must be a SQL expression: the
                # Python API only takes a literal int
                F.expr("shiftleft(1L, CAST(pmod(p, 64) AS INT))").alias("b"),
            )
            .groupBy("__file", "w")
            .agg(F.bit_or("b").alias("bits"))
            .collect()
        )
        maps: dict[str, bytearray] = {}
        for r in rows:
            base = r["__file"].rstrip("/").rsplit("/", 1)[-1]
            buf = maps.setdefault(base, bytearray(n_words * 8))
            w = int(r["w"])
            buf[w * 8 : (w + 1) * 8] = (int(r["bits"]) & _U64).to_bytes(
                8, "little"
            )
        for base, buf in maps.items():
            files.setdefault(base, {})[c] = base64.b64encode(bytes(buf)).decode()
    return {"m": m_bits, "k": k, "types": types, "files": files}


_U64 = 0xFFFFFFFFFFFFFFFF


def _bloom_may_contain(
    b64: str, m_bits: int, k: int, value, kind: str = "auto"
) -> bool:
    """Driver-side membership probe against one file's persisted bitmap
    — no false negatives (absent bits PROVE the value never hashed in),
    false positives only cost a kept file.  ``kind`` selects the JVM
    hash family recorded for the column at write time."""
    import base64

    from ..functions.xxh64 import bloom_positions

    bits = base64.b64decode(b64)
    for p in bloom_positions(value, k, m_bits, kind):
        if not (bits[p >> 3] >> (p & 7)) & 1:
            return False
    return True


def _bloom_keeps_file(bloom: dict | None, base: str, predicates) -> bool:
    """Apply every ``=`` / ``in`` predicate's Bloom test to one staged
    file.  Conservative on every gap: no bloom recorded, column not
    indexed, or file missing a bitmap (pre-bloom commit) all keep."""
    if not bloom:
        return True
    per_file = (bloom.get("files") or {}).get(base)
    if not per_file:
        return True
    m_bits, k = bloom["m"], bloom["k"]
    kinds = bloom.get("types") or {}
    for col, op, value in predicates:
        b64 = per_file.get(col)
        if b64 is None:
            continue
        kind = kinds.get(col, "auto")
        if op == "=":
            if not _bloom_may_contain(b64, m_bits, k, value, kind):
                return False
        elif op == "in":
            if not any(
                _bloom_may_contain(b64, m_bits, k, v, kind) for v in value
            ):
                return False
    return True


class ConcurrentWriteConflict(RuntimeError):
    """Optimistic-concurrency conflict (round-7 directive #4): the log
    gained commits this writer never read, and they do not commute with
    its action.  Rules (the public Delta protocol's shape):

    * append vs intervening append — COMMUTES: the loser silently
      retries at the next version number (both writers only extend the
      live file-set; replay order does not change either's rows).
    * append vs intervening overwrite — CONFLICT: the append was
      derived against a table state that has been wholly replaced;
      publishing it would resurrect rows into the new state unseen.
    * overwrite (or MERGE, which commits as overwrite) vs ANY
      intervening commit — CONFLICT: the overwrite would silently drop
      data it never read.

    The loser's staged data directory stays orphaned and invisible
    (``vacuum`` collects it); retry by re-reading the new snapshot and
    re-running the write."""


def _txn_committed_version(table: str, txn: str | None) -> int | None:
    if txn is None:
        return None
    for v in _list_versions(table):
        if _read_entry(table, v).get("txn") == txn:
            return v
    return None


def _publish_entry(
    table: str,
    entry: dict,
    txn: str | None,
    max_retries: int = 20,
    read_version: int | None = None,
) -> int:
    """Atomically publish a fully-assembled commit entry: stage the
    payload (temp + fsync), then claim the next version slot with a hard
    link, re-checking txn idempotence on every attempt.  Shared by the
    DataFrame path (:func:`commit_write`) and the DataSource writer —
    one publish protocol, not two.

    ``read_version`` is the snapshot basis the writer derived its data
    from (0 for an empty table).  When given, every publish attempt
    checks the commits that landed AFTER the basis against the
    :class:`ConcurrentWriteConflict` commute rules — the txn idempotence
    re-check runs first, so a same-txn retry still adopts the winner
    instead of conflicting with it.  ``None`` skips conflict checking
    (blind publish — the streaming sink's txn dedup is its safety)."""
    os.makedirs(_log_path(table), exist_ok=True)
    if txn is not None:
        entry = {**entry, "txn": txn}
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
            versions = _list_versions(table)
            version = (versions or [0])[-1] + 1
            # Re-check idempotence on EVERY publish attempt, not only
            # after a same-slot collision: a concurrent retry of this txn
            # that committed while we were staging data sits at an
            # earlier version, and linking a fresh slot without looking
            # would double-append.  Order matters — the check runs after
            # the version listing, so a same-txn commit that lands
            # between this check and our link necessarily targets the
            # same next slot, collides, and sends us back around the
            # loop to observe it.  It also runs BEFORE the conflict
            # check: a same-txn winner IS this write, not a conflict.
            existing = _txn_committed_version(table, txn)
            if existing is not None:
                return existing
            if read_version is not None:
                action = entry.get("action")
                for v in versions:
                    if v <= read_version:
                        continue
                    other = _read_entry(table, v).get("action")
                    if action == "append" and other == "append":
                        continue  # commutes — rebase onto the next slot
                    raise ConcurrentWriteConflict(
                        f"{table}: {action} based on snapshot v{read_version} "
                        f"conflicts with intervening {other} commit v{v}; "
                        "re-read the table and retry the write"
                    )
            target = os.path.join(_log_path(table), _entry_name(version))
            try:
                os.link(tmp, target)  # atomic; fails if the slot is taken
            except FileExistsError:
                continue  # lost the race; loop re-checks txn then retries
            return version
    finally:
        os.unlink(tmp)
    raise RuntimeError(f"could not commit to {table} after {max_retries} races")


def commit_write(
    df: DataFrame,
    table: str,
    mode: str = "append",
    txn: str | None = None,
    max_retries: int = 20,
    read_version: int | None = None,
    meta: dict | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: "int | str" = 8192,
    bloom_hashes: int = 6,
) -> int:
    """Write ``df`` into the table as one atomic commit; returns the
    committed version.  ``mode`` is ``append`` or ``overwrite``.  With
    ``txn`` set, a commit whose id already appears in the log is skipped
    (idempotent retry) and the existing version is returned.

    ``bloom_cols`` opts designated point-lookup columns into per-file
    Bloom bitmaps (:func:`_staged_bloom`) recorded in the commit entry:
    ``=`` / ``in`` reads then skip files min/max bounds cannot prune —
    the unsorted-high-cardinality-key case zone maps are blind to.  Like
    the min/max stats, the bitmap is paid once at write time and read
    from metadata forever after; each writer declares its own columns
    (mixed commits degrade conservatively to kept files).

    ``meta`` is an optional JSON-serializable dict recorded verbatim in
    the commit entry (read back via :func:`commit_meta`) — the hook for
    writer-supplied provenance, e.g. the persisted IVF index recording
    which companion-table centroid version each commit was assigned
    under so time-travel probes resolve the matching quantizer.

    Concurrency: the snapshot basis is captured at entry (or passed as
    ``read_version`` by read-modify-write callers like
    :func:`merge_upsert`, who capture it BEFORE reading); at publish
    time, intervening commits from OTHER writers are checked against the
    :class:`ConcurrentWriteConflict` commute rules — append+append
    rebase silently, everything else raises and leaves the loser's
    staged files invisible."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode: {mode!r}")
    os.makedirs(_log_path(table), exist_ok=True)
    if read_version is None:
        read_version = (_list_versions(table) or [0])[-1]

    existing = _txn_committed_version(table, txn)
    if existing is not None:
        return existing
    staging = f"v{uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(table, _DATA_DIR, staging)
    # A LOCAL (arrow/driver-built) model frame always writes as one
    # file: multiple near-empty part files would only fragment the
    # commit, and single-file staging is what unlocks the driver-side
    # stats fast path below (r14).
    is_local = df.isLocal()
    (df.coalesce(1) if is_local else df).write.mode("error").parquet(data_dir)
    # ONE aggregate job over the files just written computes the commit's
    # row count AND per-column min/max together.  This is a real Spark
    # job (plain count() is too — parquet footer-only counting needs the
    # v2 scan + aggregate pushdown, which Spark does not use by default),
    # but it is paid once at write time so that table_stats() and
    # predicate pruning (read_where) stay metadata-only forever after.
    # r14 optimizations: local single-file model commits compute the
    # same stats driver-side (no job — _local_staged_stats), and when a
    # Bloom pass is requested the stats and bloom jobs run CONCURRENTLY
    # from two driver threads (guide §2.6 — independent jobs overlap;
    # both scan the same freshly staged files).
    spark = df.sparkSession
    staged = _local_staged_stats(df, data_dir) if is_local else None
    bloom = None
    if bloom_cols and staged is None:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_stats = pool.submit(_staged_stats, spark, data_dir)
            f_bloom = pool.submit(
                _staged_bloom, spark, data_dir, bloom_cols, bloom_bits,
                bloom_hashes,
            )
            staged = f_stats.result()
            bloom = f_bloom.result()
    elif bloom_cols:
        bloom = _staged_bloom(
            spark, data_dir, bloom_cols, bloom_bits, bloom_hashes
        )
    elif staged is None:
        staged = _staged_stats(spark, data_dir)
    n_rows, stats, file_stats = staged
    entry = {
        "action": mode,
        "dirs": [f"{_DATA_DIR}/{staging}"],
        "n_rows": n_rows,
        "stats": stats,
        "file_stats": file_stats,
    }
    if bloom is not None:
        entry["bloom"] = bloom
    if meta:
        entry["meta"] = meta
    return _publish_entry(table, entry, txn, max_retries, read_version)


def live_dirs(table: str, version: int | None = None) -> list[str]:
    """The data directories visible at ``version`` (default: latest),
    by log replay.  Raises if the table has no commits, the requested
    version does not exist, or the version is below the protected floor
    (:class:`VersionExpiredError` — its data dirs may be vacuumed)."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"no commits in {table}")
    _check_not_expired(table, version)
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


def live_dv_dirs(table: str, version: int | None = None) -> list[str]:
    """Positional-delete (deletion-vector) tombstone directories visible
    at ``version`` — log replay over ``delete_dv`` commits.  An
    ``overwrite`` commit resets them: the rewrite read through
    :func:`read_version` already applied every prior tombstone, so the
    new files are clean (DVs are MATERIALIZED by any overwrite —
    compact, merge, COW DML).  Empty list = the fast path: reads carry
    zero merge-on-read overhead unless deletes actually exist."""
    versions = _list_versions(table)
    if not versions:
        return []
    _check_not_expired(table, version)
    if version is None:
        version = versions[-1]
    dvs: list[str] = []
    for v in versions:
        if v > version:
            break
        entry = _read_entry(table, v)
        if entry["action"] == "overwrite":
            dvs = []
        elif entry["action"] == "delete_dv":
            dvs.extend(entry.get("dv_dirs", []))
    return [os.path.join(table, d) for d in dvs]


def _apply_dv(spark: SparkSession, df: DataFrame, dv_dirs: list[str]) -> DataFrame:
    """Merge-on-read: anti-join a parquet-scan frame against the live
    positional tombstones on (file URI, row index).  ``df`` must be the
    scan itself (the ``_metadata`` pseudo-column resolves only there).
    Tombstone sets are usually small (broadcast); at worst this is one
    file-keyed shuffle — the read-side price MOR pays for write-side
    cheapness, exactly Delta's deletion-vector tradeoff."""
    from pyspark.sql import functions as F

    tomb = spark.read.parquet(*dv_dirs).select(
        F.col("file_path").alias("__dv_fp"),
        F.col("row_index").alias("__dv_ri"),
    )
    return (
        df.withColumn("__fp", F.col("_metadata.file_path"))
        .withColumn("__ri", F.col("_metadata.row_index"))
        .join(
            tomb,
            (F.col("__fp") == F.col("__dv_fp"))
            & (F.col("__ri") == F.col("__dv_ri")),
            "left_anti",
        )
        .drop("__fp", "__ri")
    )


def read_version(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Snapshot read of the table at ``version`` (latest by default).
    ``merge_schema=True`` unions the schemas of every live directory —
    the schema-evolution read for tables whose appends added columns
    over time (older commits surface new columns as NULL).  Live
    positional deletes (:func:`delete_where_dv`) apply as a
    merge-on-read anti-join; tables without them read exactly as
    before."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*live_dirs(table, version))
    dvs = live_dv_dirs(table, version)
    if dvs:
        df = _apply_dv(spark, df, dvs)
    return df


def _predicate_may_match(bounds, op: str, value) -> bool:
    """Can a directory whose column spans ``bounds = [lo, hi]`` contain a
    row satisfying ``col <op> value``?  Conservative: unknown bounds
    (missing stats, all-NULL column, pre-stats commits) always match.
    Date/timestamp bounds are ISO strings; pass the literal in the same
    form (lexicographic order is chronological there).  ``between`` takes
    a ``(lo, hi)`` pair, ``in`` an iterable of values."""
    if bounds is None:
        return True
    lo, hi = bounds
    if lo is None or hi is None:
        return True
    try:
        if op == "=":
            return lo <= value <= hi
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
        if op == "between":
            vlo, vhi = value
            return not (vhi < lo or vlo > hi)
        if op == "in":
            return any(lo <= v <= hi for v in value)
    except TypeError:
        # literal not comparable with the recorded bounds (None, or a
        # cross-type comparison) — pruning is an I/O optimization, so
        # conservatively keep the file rather than failing the scan
        # (round-7 advice)
        return True
    raise ValueError(f"unknown predicate op: {op!r}")


def _live_stats(table: str, version: int | None) -> dict[str, dict]:
    """Log replay to ``version``: rel data dir -> its commit's stats
    payloads (``{"stats": dir bounds, "file_stats": per-file bounds}``,
    either possibly missing on pre-stats commits)."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"no commits in {table}")
    _check_not_expired(table, version)
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    live: dict[str, dict] = {}
    for v in versions:
        if v > version:
            break
        entry = _read_entry(table, v)
        if entry["action"] == "overwrite":
            live = {}
        per = entry.get("per_dir") or {}
        for d in entry["dirs"]:
            if d in per:
                # multi-dir entries (RESTORE/CLONE) carry each referenced
                # dir's ORIGINAL stats payload — pruning keeps per-file
                # granularity across a metadata-only restore
                live[d] = {
                    "stats": per[d].get("stats") or {},
                    "file_stats": per[d].get("file_stats"),
                    "bloom": per[d].get("bloom"),
                    "n_rows": per[d].get("n_rows"),
                }
            else:
                live[d] = {
                    "stats": entry.get("stats", {}),
                    "file_stats": entry.get("file_stats"),
                    "bloom": entry.get("bloom"),
                    # a data commit stages exactly one dir and counts
                    # exactly its rows; a legacy multi-dir entry's total
                    # cannot be attributed per-dir (None → caller falls
                    # back to counting that ENTRY once)
                    "n_rows": entry.get("n_rows")
                    if len(entry["dirs"]) == 1
                    else None,
                }
    return live


def pruned_dirs(
    table: str,
    predicates: list[tuple],
    version: int | None = None,
) -> tuple[list[str], list[str]]:
    """Split the live directories at ``version`` into (kept, skipped)
    under a conjunction of simple predicates ``(col, op, literal)`` with
    op in ``= < <= > >=`` — metadata-only log replay, no file opened.
    A directory is skipped only when its recorded min/max PROVE no row
    can match; directories without stats for a referenced column are
    always kept (correctness over pruning)."""
    kept, skipped = [], []
    for d, payload in _live_stats(table, version).items():
        stats = payload["stats"]
        ok = all(
            _predicate_may_match(stats.get(col), op, value)
            for col, op, value in predicates
        )
        (kept if ok else skipped).append(os.path.join(table, d))
    return kept, skipped


def pruned_paths(
    table: str,
    predicates: list[tuple],
    version: int | None = None,
) -> tuple[list[str], int, int]:
    """File-granular pruning: the parquet paths a predicate read must
    open, plus (files kept, files skipped) counts.  Two metadata tiers,
    both from log replay alone: directory bounds drop whole commits,
    then the per-file add-stats (``file_stats``) drop individual files
    inside surviving commits — a compacted-but-unsorted commit with 32
    files keeps only the files whose own range can match.  Directories
    from pre-stats commits contribute themselves wholesale (conservative:
    the reader scans them)."""
    paths: list[str] = []
    n_kept = n_skipped = 0
    for d, payload in _live_stats(table, version).items():
        stats = payload["stats"]
        if not all(
            _predicate_may_match(stats.get(col), op, value)
            for col, op, value in predicates
        ):
            fs = payload["file_stats"]
            n_skipped += len(fs) if fs else 1
            continue
        fs = payload["file_stats"]
        if not fs:  # pre-stats commit: whole directory, unknown file count
            paths.append(os.path.join(table, d))
            n_kept += 1
            continue
        bloom = payload.get("bloom")
        for base, bounds in sorted(fs.items()):
            if all(
                _predicate_may_match(bounds.get(col), op, value)
                for col, op, value in predicates
                # third tier: per-file Bloom bitmaps prove point-lookup
                # absence where min/max ranges overlap (unsorted keys)
            ) and _bloom_keeps_file(bloom, base, predicates):
                paths.append(os.path.join(table, d, base))
                n_kept += 1
            else:
                n_skipped += 1
    return paths, n_kept, n_skipped


def read_where(
    spark: SparkSession,
    table: str,
    predicates: list[tuple],
    version: int | None = None,
) -> DataFrame:
    """Predicate read with data skipping: prune directories against the
    commit-log min/max stats (:func:`pruned_dirs`), then apply the SAME
    predicates as a real filter over the surviving files — pruning is an
    I/O optimization, never a semantic change.  At 100 TB this is the
    difference between opening every file of every commit and opening
    only the commits whose range overlaps the query; within the kept
    directories the ordinary parquet footer min/max pruning still
    applies row-group by row-group."""
    from pyspark.sql import functions as F

    kept, _, _ = pruned_paths(table, predicates, version)
    if not kept:
        # provably empty: an empty frame with the table's schema
        return read_version(spark, table, version).limit(0).filter(F.lit(False))
    df = spark.read.parquet(*kept)
    _OPS = {
        "=": lambda c, v: c == v,
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
        "between": lambda c, v: c.between(v[0], v[1]),
        "in": lambda c, v: c.isin(list(v)),
    }
    for col, op, value in predicates:
        df = df.filter(_OPS[op](F.col(col), F.lit(value) if op not in ("between", "in") else value))
    dvs = live_dv_dirs(table, version)
    if dvs:
        # merge-on-read over the pruned slice: tombstones for skipped
        # files anti-join to nothing, so pruning and DVs compose freely
        df = _apply_dv(spark, df, dvs)
    return df


def history(table: str) -> list[dict]:
    """DESCRIBE HISTORY: one dict per commit (version, action, txn id,
    row count, file count, commit mtime) from log replay alone — the
    audit view an orchestrator reads before time-traveling or vacuuming.
    Metadata-only; no data file is opened."""
    out = []
    for v in _list_versions(table):
        entry = _read_entry(table, v)
        path = os.path.join(_log_path(table), _entry_name(v))
        fs = entry.get("file_stats")
        out.append(
            {
                "version": v,
                "action": entry["action"],
                "txn": entry.get("txn"),
                "n_rows": entry.get("n_rows"),
                "n_files": len(fs) if fs is not None else None,
                "committed_at": os.path.getmtime(path),
            }
        )
    return out


def latest_version(table: str) -> int:
    """Newest committed version (0 for a table with no commits) —
    metadata-only (one directory listing)."""
    return (_list_versions(table) or [0])[-1]


def commit_meta(table: str, version: int) -> dict:
    """The writer-supplied ``meta`` dict recorded in a commit entry
    (empty dict when the writer attached none) — metadata-only."""
    return _read_entry(table, version).get("meta") or {}


def read_changes_since(
    spark: SparkSession,
    table: str,
    after_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Append-only incremental read: the rows ADDED by commits in
    ``(after_version, to_version]`` — the cheap consumption path for
    downstream incremental jobs (rollup maintenance, sync to a serving
    store) when the producer only appends.  Reads exactly the new
    commits' directories; table history size is irrelevant.  Raises if
    the range crosses an ``overwrite`` commit — appends after a rewrite
    are not expressible as a pure delta, so the consumer must fall back
    to the keyed :func:`change_feed` (which diffs full snapshots)."""
    versions = _list_versions(table)
    if not versions:
        raise FileNotFoundError(f"no commits in {table}")
    # append-only dirs below the floor stay reachable from retained
    # snapshots, so only the TARGET snapshot needs the expiry guard
    _check_not_expired(table, to_version)
    if to_version is None:
        to_version = versions[-1]
    new_dirs: list[str] = []
    for v in versions:
        if v <= after_version or v > to_version:
            continue
        entry = _read_entry(table, v)
        if entry["action"] == "overwrite":
            raise ValueError(
                f"version {v} is an overwrite: the range is not append-only"
                " — use change_feed() for a keyed diff across rewrites"
            )
        if entry["action"] == "delete_dv":
            raise ValueError(
                f"version {v} is a positional delete: the range is not"
                " append-only — use change_feed() for a keyed diff that"
                " surfaces the deletes"
            )
        new_dirs.extend(entry["dirs"])
    if not new_dirs:
        return read_version(spark, table, to_version).limit(0)
    return spark.read.parquet(*[os.path.join(table, d) for d in new_dirs])


def dv_only_deleted_rows(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int,
) -> "DataFrame | None":
    """The FULL rows deleted by a ``(from_version, to_version]`` range
    consisting solely of ``delete_dv`` commits — ``None`` when the range
    contains any other commit kind (callers fall back to the general
    keyed :func:`change_feed`).

    The positional tombstones NAME the deleted rows, so the delta is one
    left-semi join of the from-snapshot scan against the range's new
    tombstone files — no full-outer snapshot diff and no to-snapshot
    scan (r15, the Delta-CDF DV shortcut; guide §1.2: don't recompute
    what the metadata already records).  Exactness: ``delete_where_dv``
    excludes already-tombstoned rows from every new commit, so the new
    tombstones reference only rows live at ``from_version`` and the raw
    live-dirs scan needs no old-DV anti-join."""
    from pyspark.sql import functions as F

    versions = _list_versions(table)
    rng = [v for v in versions if from_version < v <= to_version]
    if not rng:
        return None
    new_dvs: list[str] = []
    for v in rng:
        entry = _read_entry(table, v)
        if entry["action"] != "delete_dv":
            return None
        new_dvs.extend(entry.get("dv_dirs", []))
    if not new_dvs:
        return None
    tomb = spark.read.parquet(
        *[os.path.join(table, d) for d in new_dvs]
    ).select(
        F.col("file_path").alias("__dv_fp"),
        F.col("row_index").alias("__dv_ri"),
    )
    df = spark.read.parquet(*live_dirs(table, from_version))
    return (
        df.withColumn("__fp", F.col("_metadata.file_path"))
        .withColumn("__ri", F.col("_metadata.row_index"))
        .join(
            tomb,
            (F.col("__fp") == F.col("__dv_fp"))
            & (F.col("__ri") == F.col("__dv_ri")),
            "left_semi",
        )
        .drop("__fp", "__ri")
    )


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


def _live_parquet_bytes(table: str, version: int | None = None) -> int:
    """On-disk bytes of the live snapshot's parquet files — filesystem
    stat calls over the live dirs, no file opened."""
    total = 0
    for d in live_dirs(table, version):
        for root, _, names in os.walk(d):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in names
                if f.endswith(".parquet")
            )
    return total


def compact(
    spark: SparkSession,
    table: str,
    txn: str | None = None,
    cluster_by: list[str] | None = None,
    zorder: bool = False,
    num_files: int = 32,
    target_file_bytes: int | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: "int | str" = 8192,
) -> int:
    """OPTIMIZE: rewrite the CURRENT snapshot as one fresh commit (new
    compacted files, one atomic overwrite) — readers never see a partial
    rewrite, historical versions stay readable over their original
    files, and ``vacuum`` still only ever removes uncommitted orphans.

    ``cluster_by`` is OPTIMIZE's clustering form: range-partition + sort
    the snapshot on those columns (``zorder=True`` sorts on the Morton
    key instead — bounded ranges on EVERY cluster column, the
    multi-predicate layout; reuses :func:`..functions.zorder.zorder_key`).
    Because commit stats are recorded per file, clustering directly
    tightens each new file's recorded bounds, so the NEXT predicate read
    (:func:`read_where`) skips at file granularity — the same
    write-once/skip-forever contract as Delta's OPTIMIZE ZORDER BY, one
    range exchange per rewrite.

    ``target_file_bytes`` (r12 — Delta's ``targetFileSize`` analog)
    derives the file count from the live snapshot's on-disk bytes
    instead of a fixed ``num_files``: at 100 TB the knob an operator
    actually owns is bytes per file (~128 MiB-1 GiB for scan
    efficiency), not a count that silently drifts as the table grows.
    The size probe is metadata-cheap (stat calls, no file opened) and
    the estimate is input-compressed bytes — output files land near the
    target because compaction preserves encoding."""
    if target_file_bytes is not None:
        if target_file_bytes <= 0:
            raise ValueError(f"target_file_bytes={target_file_bytes}")
        live = _live_parquet_bytes(table)
        num_files = max(1, -(-live // target_file_bytes))
    snap = read_version(spark, table)
    if cluster_by:
        if zorder:
            from ..functions.zorder import zorder_key

            snap = (
                snap.withColumn("__zkey", zorder_key(snap, cluster_by))
                .repartitionByRange(num_files, "__zkey")
                .sortWithinPartitions("__zkey")
                .drop("__zkey")
            )
        else:
            snap = snap.repartitionByRange(
                num_files, *cluster_by
            ).sortWithinPartitions(*cluster_by)
    else:
        # plain bin-packing OPTIMIZE: without a clustering key the point
        # is fewer, larger files — honor num_files instead of inheriting
        # the fragmented source partitioning.  coalesce only SHRINKS;
        # re-splitting an over-compacted snapshot (target_file_bytes on
        # a few big files) needs the shuffle repartition takes.
        if snap.rdd.getNumPartitions() < num_files:
            snap = snap.repartition(num_files)
        else:
            snap = snap.coalesce(num_files)
    # an overwrite replaces the file set, so per-file Bloom bitmaps must
    # be re-declared or they are gone — same re-declare-on-rewrite
    # contract as the clustering itself
    return commit_write(
        snap,
        table,
        mode="overwrite",
        txn=txn,
        bloom_cols=bloom_cols,
        bloom_bits=bloom_bits,
        # compaction rewrites LAYOUT, not rows: drift accounting must
        # neither count it as a data change nor let it masquerade as a
        # rebuild that would zero accumulated debt
        meta={"layout_only": True},
    )


def maintain_table(
    spark: SparkSession,
    table: str,
    max_live_files: int = 32,
    max_dv_ratio: float = 0.1,
    cluster_by: list[str] | None = None,
    zorder: bool = False,
    num_files: int = 8,
    target_file_bytes: int | None = None,
    txn: str | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: "int | str" = 8192,
) -> dict:
    """Auto-OPTIMIZE (the Databricks predictive-optimization shape, r11):
    decide from METADATA ALONE whether the table has accumulated enough
    debt to earn a rewrite, and pay it with one :func:`compact` when it
    has.  Two debts, both read from log replay without opening a file:

    * **fragmentation** — live parquet file count
      (:func:`pruned_paths` with no predicates) above ``max_live_files``:
      streamed micro-batch appends each commit their own small files,
      and at 100 TB per-file overheads (open cost, footer reads, task
      scheduling) dominate once files shrink below ~100 MB;
    * **tombstone debt** — live merge-on-read delete rows
      (:func:`delete_where_dv`) above ``max_dv_ratio`` of the live
      physical rows: every read pays the anti-join until an overwrite
      materializes the deletes, so MOR's write-side savings must be
      repaid before the read tax compounds.

    The rewrite settles BOTH debts at once (compaction rewrites the
    current snapshot, which drops the tombstones by construction) and
    restores file-granular stats pruning when ``cluster_by`` is given.
    Scheduled alongside :func:`~..operators.ann_index.ivf_rebuild_if_
    drifted`, these make table health a cheap cron decision, not an
    operator judgment call.  Returns the decision record either way."""
    _, n_files, _ = pruned_paths(table, [])
    version = latest_version(table)
    dv_rel = {
        os.path.relpath(d, table) for d in live_dv_dirs(table, version)
    }
    # per-dir attribution: a dir referenced by several commits (a head
    # that is itself a restore) must count its rows once, not once per
    # referencing entry — the same law _snapshot_payloads enforces
    _, data_rows = _snapshot_payloads(table, version)
    dv_rows = 0
    for v in _list_versions(table):
        e = _read_entry(table, v)
        if set(e.get("dv_dirs") or []) & dv_rel:
            dv_rows += e.get("n_deleted") or 0
    ratio = (dv_rows / data_rows) if data_rows else 0.0
    fragmented = n_files > max_live_files
    dv_debt = ratio > max_dv_ratio
    rec = {
        "files_before": n_files,
        "dv_rows": dv_rows,
        "dv_ratio": round(ratio, 6),
        "fragmented": fragmented,
        "dv_debt": dv_debt,
        "compacted": False,
    }
    if not (fragmented or dv_debt):
        return rec
    compact(
        spark,
        table,
        txn=txn,
        cluster_by=cluster_by,
        zorder=zorder,
        num_files=num_files,
        target_file_bytes=target_file_bytes,
        bloom_cols=bloom_cols,
        bloom_bits=bloom_bits,
    )
    rec["compacted"] = True
    rec["files_after"] = pruned_paths(table, [])[1]
    return rec


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
    alone (MERGE's WHEN NOT MATCHED INSERT degenerate case).

    MERGE is read-modify-write, so the snapshot basis is captured HERE,
    before the base read — any commit landing between this read and the
    publish (append or overwrite alike) raises
    :class:`ConcurrentWriteConflict` instead of being silently dropped
    by the merged overwrite."""
    from ..operators.cdc import merge_latest

    basis = (_list_versions(table) or [0])[-1]
    try:
        base = read_version(spark, table)
    except FileNotFoundError:
        merged = updates
    else:
        merged = merge_latest(base, updates, keys, order_col, tiebreak)
    return commit_write(
        merged, table, mode="overwrite", txn=txn, read_version=basis,
        # MERGE changes live rows; like the COW kernel it publishes a
        # whole-snapshot overwrite, so it carries the same DML flag for
        # drift accounting (_appends_since_rebuild)
        meta={"cow_dml": True},
    )


def delete_where(
    spark: SparkSession,
    table: str,
    predicates: list[tuple],
    txn: str | None = None,
) -> dict:
    """Copy-on-write DELETE (the GDPR/right-to-erasure primitive):
    remove every row matching a conjunction of simple predicates
    ``(col, op, literal)`` — ops as in :func:`read_where` — as ONE
    atomic overwrite commit, rewriting only the files the predicate can
    touch.

    The same two-tier commit stats that power read-side skipping power
    the WRITE side here: files whose recorded min/max PROVE no row
    matches are HARD-LINKED into the new commit directory (zero bytes
    copied or scanned — the protocol's existing link-based atomicity,
    now applied to data files), and only the may-match files flow
    through Spark's scan → anti-filter → write.  At 100 TB with
    clustered layout (OPTIMIZE ZORDER), a keyed delete rewrites a
    handful of files and links the rest; without stats it degrades to a
    full rewrite, never to wrong answers.  Linked files carry their old
    per-file stats forward; their row counts come from parquet FOOTERS
    only (no data pages read).  Pre-stats commits are conservatively
    rewritten wholesale.

    SQL NULL semantics: ``DELETE WHERE p`` removes rows where ``p`` is
    TRUE — rows where ``p`` evaluates NULL are KEPT (the keep filter is
    ``NOT coalesce(p, FALSE)``).

    Read-modify-write concurrency: the snapshot basis is captured before
    classification; an intervening commit from another writer raises
    :class:`ConcurrentWriteConflict` at publish (overwrite rules).  A
    provably-empty delete (every file pruned) is a NO-OP: no commit is
    published.  Returns ``{"version", "rows_deleted", "files_rewritten",
    "files_linked"}``."""
    return _cow_rewrite(
        spark,
        table,
        predicates,
        lambda src, pred: src.filter(~_coalesce_false(pred)),
        txn,
        count_key="rows_deleted",
        affected=lambda src, pred, n_in, n_new: n_in - n_new,
    )


def delete_where_dv(
    spark: SparkSession,
    table: str,
    predicates: list[tuple],
    txn: str | None = None,
) -> dict:
    """Merge-on-read DELETE — positional deletion vectors (the Delta
    DV / Iceberg positional-delete pattern), the other half of the
    COW/MOR write-amplification tradeoff :func:`delete_where` anchors:

    * **COW** rewrites every may-match FILE to drop a few rows — write
      cost ∝ touched file bytes, reads stay plain scans;
    * **MOR (this)** records only the matching rows' (file URI, row
      index) tombstones as ONE ``delete_dv`` commit — write cost ∝
      deleted rows, and every read anti-joins the tombstones out
      (:func:`_apply_dv`) until an overwrite commit (OPTIMIZE/compact,
      MERGE, COW DML) materializes them back into clean files.

    Right for small, frequent deletes over large clustered files (the
    GDPR drip); wrong for bulk deletes, where COW's rewrite is paid once
    instead of taxing every read.  Uses the same two-tier stats pruning
    as the COW path to SCAN only may-match files; rows already
    tombstoned are excluded from the new commit (re-deleting is
    idempotent and counts report true logical deletions).  Time travel:
    a read below the delete's version ignores it (replay collects only
    dv commits <= the target).  Returns ``{"version", "rows_deleted",
    "files_scanned"}``."""
    from pyspark.sql import functions as F

    existing = _txn_committed_version(table, txn)
    if existing is not None:
        return {
            "version": existing,
            "rows_deleted": None,
            "files_scanned": None,
        }
    if not _list_versions(table):
        return {"version": None, "rows_deleted": 0, "files_scanned": 0}
    basis = _list_versions(table)[-1]
    kept, n_kept, _ = pruned_paths(table, predicates, None)
    if not kept:
        return {"version": basis, "rows_deleted": 0, "files_scanned": 0}
    pred = _predicate_column(predicates)
    matches = (
        spark.read.parquet(*kept)
        .filter(_coalesce_false(pred))
        .select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.row_index").alias("row_index"),
        )
    )
    dvs = live_dv_dirs(table, None)
    if dvs:
        tomb = spark.read.parquet(*dvs).select("file_path", "row_index")
        matches = matches.join(tomb, ["file_path", "row_index"], "left_anti")
    staging = f"dv{uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(table, _DATA_DIR, staging)
    matches.write.mode("error").parquet(data_dir)
    import pyarrow.parquet as pq

    n_del = sum(
        pq.ParquetFile(os.path.join(data_dir, f)).metadata.num_rows
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    if n_del == 0:
        import shutil

        shutil.rmtree(data_dir)
        return {"version": basis, "rows_deleted": 0, "files_scanned": n_kept}
    entry = {
        "action": "delete_dv",
        "dirs": [],  # no data dirs — replay-neutral for every data reader
        "dv_dirs": [f"{_DATA_DIR}/{staging}"],
        "n_rows": 0,
        "n_deleted": n_del,
        "stats": {},
        "file_stats": {},
    }
    version = _publish_entry(table, entry, txn, read_version=basis)
    return {
        "version": version,
        "rows_deleted": n_del,
        "files_scanned": n_kept,
    }


def update_where(
    spark: SparkSession,
    table: str,
    predicates: list[tuple],
    set_exprs: dict[str, str],
    txn: str | None = None,
) -> dict:
    """Copy-on-write UPDATE: for every row matching the predicate
    conjunction, replace each ``set_exprs`` column with its SQL
    expression (evaluated against the row — ``{"v": "v * 2", "status":
    "'fixed'"}``); non-matching rows pass through byte-identical.  Same
    stats-routed COW kernel as :func:`delete_where`: provably-untouched
    files hard-link (zero bytes moved), only may-match files rewrite,
    one atomic overwrite commit, txn-idempotent, conflict-checked.
    ``rows_updated`` counts predicate-TRUE rows (NULL predicate rows
    pass through unchanged, SQL semantics), measured with one extra
    aggregate over the SAME may-match file set the rewrite scans.
    Completes the DML triad with :func:`merge_upsert` (keyed) and
    :func:`delete_where` (predicate removal)."""
    from pyspark.sql import functions as F

    def transform(src, pred):
        matched = _coalesce_false(pred)
        out = src
        for col, expr in set_exprs.items():
            if col not in src.columns:
                raise ValueError(f"unknown SET column: {col!r}")
            out = out.withColumn(
                col,
                F.when(matched, F.expr(expr).cast(src.schema[col].dataType))
                .otherwise(F.col(col)),
            )
        return out

    return _cow_rewrite(
        spark,
        table,
        predicates,
        transform,
        txn,
        count_key="rows_updated",
        affected=lambda src, pred, n_in, n_new: src.filter(
            _coalesce_false(pred)
        ).count(),
    )


def _coalesce_false(pred):
    from pyspark.sql import functions as F

    return F.coalesce(pred, F.lit(False))


def _predicate_column(predicates: list[tuple]):
    """Conjunction of simple ``(col, op, literal)`` predicates as one
    Spark Column — ops as in :func:`read_where`."""
    from pyspark.sql import functions as F

    _OPS = {
        "=": lambda c, v: c == v,
        "<": lambda c, v: c < v,
        "<=": lambda c, v: c <= v,
        ">": lambda c, v: c > v,
        ">=": lambda c, v: c >= v,
        "between": lambda c, v: c.between(v[0], v[1]),
        "in": lambda c, v: c.isin(list(v)),
    }
    pred = F.lit(True)
    for col, op, value in predicates:
        pred = pred & _OPS[op](F.col(col), value)
    return pred


def _cow_rewrite(
    spark: SparkSession,
    table: str,
    predicates: list[tuple],
    transform,
    txn: str | None,
    count_key: str,
    affected,
) -> dict:
    """Shared copy-on-write kernel behind :func:`delete_where` /
    :func:`update_where`: classify live files against the per-file
    stats, run ``transform(src, pred)`` over the may-match files only,
    hard-link the rest, publish one overwrite commit.  ``affected(src,
    pred, n_in, n_new)`` derives the reported row count (delete: footer
    difference, free; update: one aggregate over the may-match set)."""
    existing = _txn_committed_version(table, txn)
    if existing is not None:
        return {
            "version": existing,
            count_key: None,  # idempotent replay: counts not re-derived
            "files_rewritten": None,
            "files_linked": None,
        }
    if not _list_versions(table):
        # DML on a table with zero commits is a well-defined no-op (there
        # are no rows to touch), not an incidental FileNotFoundError from
        # the stats replay (round-8 advice)
        return {
            "version": None,
            count_key: 0,
            "files_rewritten": 0,
            "files_linked": 0,
        }
    basis = _list_versions(table)[-1]
    dvs = live_dv_dirs(table, None)
    if dvs:
        # live positional deletes: hard-linking an untouched file into
        # the new commit would RESURRECT its tombstoned rows (tombstones
        # key on the OLD path; links get a new one), so COW DML over a
        # DV-bearing table MATERIALIZES — read the snapshot DV-applied,
        # transform everything, land one clean overwrite (replay resets
        # the DVs).  The link optimization resumes on the next call.
        snap = read_version(spark, table)
        pred = _predicate_column(predicates)
        out = transform(snap, pred)
        n_in = snap.count()
        version = commit_write(
            out, table, mode="overwrite", txn=txn, read_version=basis,
            meta={"cow_dml": True},
        )
        n_new = _read_entry(table, version).get("n_rows")
        n_files = sum(
            len(payload["file_stats"] or {1: None})
            for payload in _live_stats(table, basis).values()
        )
        return {
            "version": version,
            count_key: affected(snap, pred, n_in, n_new),
            "files_rewritten": n_files,
            "files_linked": 0,
        }
    rewrite: list[str] = []  # file paths (or whole pre-stats dirs) to scan
    linked: list[tuple[str, dict]] = []  # (path, per-file bounds) to link
    for d, payload in _live_stats(table, None).items():
        stats = payload["stats"]
        fs = payload["file_stats"]
        dir_may_match = all(
            _predicate_may_match(stats.get(col), op, value)
            for col, op, value in predicates
        )
        if not fs:
            # pre-stats commit: no per-file evidence — rewrite wholesale
            # (dir bounds could prune it, but without file stats a link
            # would lose the stats payload; correctness first)
            rewrite.append(os.path.join(table, d))
            continue
        for base, bounds in sorted(fs.items()):
            may = dir_may_match and all(
                _predicate_may_match(bounds.get(col), op, value)
                for col, op, value in predicates
            )
            path = os.path.join(table, d, base)
            if may:
                rewrite.append(path)
            else:
                linked.append((path, bounds))
    if not rewrite:
        # no file can contain a matching row: provably a no-op
        return {
            "version": basis,
            count_key: 0,
            "files_rewritten": 0,
            "files_linked": 0,
        }

    staging = f"v{uuid.uuid4().hex[:12]}"
    data_dir = os.path.join(table, _DATA_DIR, staging)
    src = spark.read.parquet(*rewrite)
    pred = _predicate_column(predicates)
    out = transform(src, pred)
    out.write.mode("error").parquet(data_dir)
    n_new, dir_stats, file_stats = _staged_stats(spark, data_dir)

    # rewritten-input row count from parquet FOOTERS (no data pages)
    import pyarrow.parquet as pq

    n_in = 0
    for p in rewrite:
        if os.path.isdir(p):  # pre-stats whole directory
            for name in os.listdir(p):
                if name.endswith(".parquet"):
                    n_in += pq.ParquetFile(os.path.join(p, name)).metadata.num_rows
        else:
            n_in += pq.ParquetFile(p).metadata.num_rows
    n_affected = affected(src, pred, n_in, n_new)

    # hard-link the provably-untouched files into the commit dir and
    # fold their stats + footer row counts into the entry
    n_rows = n_new
    for path, bounds in linked:
        base = os.path.basename(path)
        target = os.path.join(data_dir, base)
        if os.path.exists(target):  # spark part names embed job UUIDs
            raise RuntimeError(f"file name collision linking {base}")
        os.link(path, target)
        file_stats[base] = bounds
        n_rows += pq.ParquetFile(path).metadata.num_rows
        for c, b in bounds.items():
            if b is None:
                continue
            lo, hi = b
            d0 = dir_stats.setdefault(c, [None, None])
            if lo is not None and (d0[0] is None or lo < d0[0]):
                d0[0] = lo
            if hi is not None and (d0[1] is None or hi > d0[1]):
                d0[1] = hi

    entry = {
        "action": "overwrite",
        "dirs": [f"{_DATA_DIR}/{staging}"],
        "n_rows": n_rows,
        "stats": dir_stats,
        "file_stats": file_stats,
        count_key: n_affected,
        # COW DML is a row-level edit published as a whole-snapshot
        # overwrite: drift accounting (_appends_since_rebuild) must COUNT
        # it as a data change, never mistake it for a rebuild that would
        # zero accumulated debt (round-13 advice)
        "meta": {"cow_dml": True},
    }
    version = _publish_entry(table, entry, txn, read_version=basis)
    return {
        "version": version,
        count_key: n_affected,
        "files_rewritten": len(rewrite),
        "files_linked": len(linked),
    }


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
        elif entry["action"] == "delete_dv":
            # positional deletes subtract LOGICALLY: snapshot_rows stays
            # the count a read_version would return, while the physical
            # files keep the rows until an overwrite materializes
            n = -(entry.get("n_deleted") or 0)
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


def vacuum(
    table: str,
    retention_seconds: float = 6 * 3600,
    min_retained_version: int | None = None,
) -> list[str]:
    """Remove data directories referenced by NO committed version —
    leftovers of writes that crashed before their commit — plus orphaned
    log staging files.  By default time travel stays intact: every dir
    reachable from ANY commit is kept.  Only artifacts older than
    ``retention_seconds`` are removed (Delta-style retention): an
    unreferenced dir younger than that may belong to a LIVE writer
    between its data write and its log commit, and deleting it would
    corrupt the commit it is about to make.  Returns the removed paths.

    ``min_retained_version`` (round-8 verdict #7) additionally EXPIRES
    history below a protected-versions floor — the snapshot-isolation
    contract between vacuum and time travel:

    * The floor persists in the log (monotonic, atomic) BEFORE any
      deletion, so a crash between the two steps leaves a floor with
      extra data, never readable versions with missing data.
    * Data dirs reachable from ANY retained snapshot (>= floor) survive;
      only dirs ALL of whose referencing snapshots expired are removed
      (still subject to ``retention_seconds``).  Append-only history
      keeps every dir reachable, so expiry reclaims space exactly where
      overwrite/COW commits superseded files.
    * Every read of a version below the floor — ``read_version``,
      ``read_where``, ``change_feed``, ``read_changes_since`` — raises
      :class:`VersionExpiredError` naming the floor, instead of a
      confusing missing-parquet error or a silently partial snapshot.
    * Callers owning concurrent readers must pin the floor BELOW any
      version a reader still holds: the floor is the writer's
      declaration that no reader needs history under it (the same
      caller-owned contract as the persisted-run release handles).
    """
    import shutil
    import time

    cutoff = time.time() - retention_seconds
    versions = _list_versions(table)
    if min_retained_version is not None:
        if not versions:
            # a floor on a zero-commit table would pre-expire versions
            # 1..N-1 of whatever is committed afterwards, despite never
            # having been vacuumed (round-9 advice) — nothing exists to
            # expire, so refuse rather than persist a landmine
            raise ValueError(
                f"min_retained_version={min_retained_version} on a table "
                "with no commits — nothing to expire"
            )
        if min_retained_version > versions[-1]:
            raise ValueError(
                f"min_retained_version={min_retained_version} is above the "
                f"latest version {versions[-1]} — refusing to expire the "
                "current snapshot"
            )
        min_retained_version = _write_retention_floor(
            table, min_retained_version
        )
    floor = _retention_floor(table)
    referenced: set[str] = set()
    for v in versions:
        if v >= floor:
            # dirs REACHABLE from a retained snapshot: live_dirs replays
            # from the start, so pre-floor append dirs still count
            referenced.update(
                os.path.relpath(p, table) for p in live_dirs(table, v)
            )
            # positional-delete tombstone dirs reachable from a retained
            # snapshot are load-bearing for its correctness — a vacuumed
            # DV would silently resurrect deleted rows
            referenced.update(
                os.path.relpath(p, table) for p in live_dv_dirs(table, v)
            )
        # below the floor: the entry's own dirs are protected only if
        # some retained snapshot still reaches them (handled above)
    data_root = os.path.join(table, _DATA_DIR)
    removed = []
    if os.path.isdir(data_root):
        for name in sorted(os.listdir(data_root)):
            rel = f"{_DATA_DIR}/{name}"
            path = os.path.join(data_root, name)
            if name == _INFLIGHT_DIR:
                # the DataSource writer's SHARED task-staging area: live
                # writers of other commits may have fresh files here, so
                # reap stale files individually, never the directory
                for f in sorted(os.listdir(path)):
                    fp = os.path.join(path, f)
                    if os.path.getmtime(fp) < cutoff:
                        os.unlink(fp)
                        removed.append(fp)
                continue
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


def _snapshot_payloads(table: str, version: int | None):
    """(per-dir payloads, total rows) of a snapshot — the pieces a
    metadata-only RESTORE/CLONE re-references.  Each live dir's rows
    are counted exactly ONCE (from its payload's per-dir count — a data
    commit stages exactly the dir it counts, and snapshot entries record
    per-dir counts in ``per_dir``), never once per referencing commit:
    a snapshot whose head is itself a restore re-references the original
    append's dirs, and summing every intersecting entry would double-
    count them (r11 advice).  Legacy multi-dir entries without per-dir
    counts fall back to counting the staging ENTRY once."""
    payloads = _live_stats(table, version)
    n_rows = 0
    unattributed = [d for d, p in payloads.items() if p.get("n_rows") is None]
    for d, p in payloads.items():
        n_rows += p.get("n_rows") or 0
    if unattributed:
        target = latest_version(table) if version is None else version
        counted: set[int] = set()
        stager: dict[str, tuple[int, int]] = {}
        for v in _list_versions(table):
            if v > target:
                break
            e = _read_entry(table, v)
            for d in e.get("dirs") or []:
                stager.setdefault(d, (v, e.get("n_rows") or 0))
        for d in unattributed:
            s = stager.get(d)
            if s and s[0] not in counted:
                counted.add(s[0])
                n_rows += s[1]
    return payloads, n_rows


def _snapshot_entry(payloads: dict, n_rows: int, meta: dict) -> dict:
    """Assemble the multi-dir overwrite entry both RESTORE and CLONE
    publish: dir-level bounds merge conservatively for legacy readers of
    ``entry["stats"]``; full per-file stats and Bloom bitmaps ride the
    ``per_dir`` payloads so pruning granularity survives."""
    merged: dict[str, list] = {}
    for p in payloads.values():
        for c, b in (p.get("stats") or {}).items():
            if not b:
                continue
            lo, hi = b
            m = merged.setdefault(c, [None, None])
            if lo is not None and (m[0] is None or lo < m[0]):
                m[0] = lo
            if hi is not None and (m[1] is None or hi > m[1]):
                m[1] = hi
    return {
        "action": "overwrite",
        "dirs": sorted(payloads),
        "n_rows": n_rows,
        "stats": merged,
        "file_stats": {},  # per-dir fidelity lives in per_dir
        "per_dir": {
            d: {
                "stats": p.get("stats") or {},
                "file_stats": p.get("file_stats"),
                "bloom": p.get("bloom"),
                # per-dir row count travels with the snapshot so chained
                # restores/clones never re-attribute rows per entry
                "n_rows": p.get("n_rows"),
            }
            for d, p in payloads.items()
        },
        "meta": meta,
    }


def restore_table(
    spark: SparkSession, table: str, version: int, txn: str | None = None
) -> dict:
    """RESTORE TO VERSION (Delta's ``RESTORE``, r11): make an old
    snapshot the new head by publishing ONE commit that re-references
    its data directories — metadata-only, instant, zero data copied or
    moved.  The bad deploy's overwrite stays in history (time travel
    still reads it); vacuum keeps the re-referenced dirs alive because
    they are reachable from the new head.  Per-file stats and Bloom
    bitmaps travel with the restored dirs (``per_dir``), so pruning
    granularity is exactly what the restored version had.

    One honest carve-out: a snapshot with LIVE deletion vectors cannot
    be re-referenced by an overwrite entry (overwrite resets DV replay,
    which would resurrect the tombstoned rows), so restore MATERIALIZES
    it — one rewrite commit, flagged in the return and the commit meta.
    Returns ``{"version", "restored_from", "metadata_only"}``."""
    versions = _list_versions(table)
    if version not in versions:
        raise ValueError(f"version {version} not in {versions}")
    _check_not_expired(table, version)
    if live_dv_dirs(table, version):
        snap = read_version(spark, table, version)
        v = commit_write(
            snap,
            table,
            mode="overwrite",
            txn=txn,
            meta={"restore_of": version, "materialized": True},
        )
        return {"version": v, "restored_from": version, "metadata_only": False}
    payloads, n_rows = _snapshot_payloads(table, version)
    entry = _snapshot_entry(payloads, n_rows, {"restore_of": version})
    v = _publish_entry(table, entry, txn, read_version=versions[-1])
    return {"version": v, "restored_from": version, "metadata_only": True}


def clone_table(
    spark: SparkSession,
    table: str,
    target: str,
    version: int | None = None,
    txn: str | None = None,
) -> int:
    """SHALLOW-style CLONE (r11): fork a snapshot into a NEW table by
    hard-linking its live parquet files — O(files) metadata operations,
    zero bytes copied (same inodes; ``shutil.copy2`` fallback only if
    the target crosses a filesystem), and the clone's first commit
    carries the source's per-dir stats + Bloom payloads verbatim, so
    pruning works identically.  Writes to either side never affect the
    other: the clone has its own log, and an overwrite there merely
    drops its links.  Snapshots with live deletion vectors materialize
    (same carve-out and reasoning as :func:`restore_table`).  Returns
    the clone's first committed version."""
    import shutil as _shutil

    if os.path.isdir(_log_path(target)) and _list_versions(target):
        raise ValueError(f"clone target {target} already has commits")
    if live_dv_dirs(table, version):
        snap = read_version(spark, table, version)
        return commit_write(
            snap,
            target,
            mode="overwrite",
            txn=txn,
            meta={"clone_of": table, "clone_version": version,
                  "materialized": True},
        )
    payloads, n_rows = _snapshot_payloads(table, version)
    for d in payloads:
        src_dir = os.path.join(table, d)
        dst_dir = os.path.join(target, d)
        os.makedirs(dst_dir, exist_ok=True)
        for f in os.listdir(src_dir):
            src = os.path.join(src_dir, f)
            dst = os.path.join(dst_dir, f)
            if not os.path.isfile(src) or os.path.exists(dst):
                continue
            try:
                os.link(src, dst)
            except OSError:  # pragma: no cover - cross-device fallback
                _shutil.copy2(src, dst)
    entry = _snapshot_entry(
        payloads,
        n_rows,
        {"clone_of": table, "clone_version": version},
    )
    return _publish_entry(target, entry, txn, read_version=0)
