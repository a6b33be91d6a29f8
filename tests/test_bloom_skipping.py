"""Per-file Bloom skipping on the versioned table (r11): point lookups
on unsorted high-cardinality keys skip files that min/max zone maps are
blind to.  The load-bearing law is JVM parity — the driver-side
pure-Python XXH64 must reproduce Spark's xxhash64 bit-for-bit, or
pruning would silently drop files that contain the probe."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_pipeline_zeal_spark.functions import xxh64 as X
from data_pipeline_zeal_spark.sources import versioned as V

LONGS = [0, 1, -1, 42, -42, 7_000_000_000, -7_000_000_000,
         2**63 - 1, -(2**63), 123456789]
STRINGS = ["", "a", "abc", "hello world", "naïve café — ünïcode ✓",
           "x" * 7, "y" * 8, "z" * 31, "w" * 32, "long " * 20]


@pytest.fixture()
def table():
    t = tempfile.mkdtemp(prefix="bloom_")
    yield t
    shutil.rmtree(t, ignore_errors=True)


def test_xxh64_long_parity_with_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v long")
    got = {
        r.v: r.h
        for r in df.select("v", F.xxhash64("v").alias("h")).collect()
    }
    for v in LONGS:
        assert X.spark_xxhash64([v]) == got[v], v


def test_xxh64_string_parity_with_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = {
        r.s: r.h
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in STRINGS:
        assert X.spark_xxhash64([s]) == got[s], repr(s)


def test_xxh64_fold_parity_matches_write_expression(spark):
    """The EXACT write-side expression — xxhash64(col, CAST(i AS
    BIGINT)) — against the driver-side two-field fold, for both key
    types and every hash index the default layout uses."""
    lv = spark.createDataFrame([(v,) for v in LONGS], "v long")
    sv = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    for i in range(6):
        gl = {
            r.v: r.h
            for r in lv.select(
                "v", F.xxhash64("v", F.lit(i).cast("long")).alias("h")
            ).collect()
        }
        for v in LONGS:
            assert X.spark_xxhash64([v, i]) == gl[v], (v, i)
        gs = {
            r.s: r.h
            for r in sv.select(
                "s", F.xxhash64("s", F.lit(i).cast("long")).alias("h")
            ).collect()
        }
        for s in STRINGS:
            assert X.spark_xxhash64([s, i]) == gs[s], (s, i)


def _round_robin_table(spark, table, n=4000, files=8):
    """Keys interleave across files (id % files) so every file's min/max
    spans the whole key range — zone maps prune NOTHING here."""
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("payload")
    )
    V.commit_write(
        df.repartition(files, "k"),  # hash layout: every file spans the range
        table,
        mode="overwrite",
        bloom_cols=["k"],
    )
    return df


def test_bloom_skips_files_zone_maps_cannot(spark, table):
    _round_robin_table(spark, table)
    # min/max alone keeps everything: ranges fully overlap
    probe = [("k", "=", 1234)]
    _, kept, skipped = V.pruned_paths(table, probe)
    assert kept == 1 and skipped == 7, (kept, skipped)
    # an absent key (outside the domain but inside every range) is
    # proven absent everywhere at the default false-positive odds
    _, kept_a, skipped_a = V.pruned_paths(table, [("k", "=", -5)])
    assert kept_a <= 1 and skipped_a >= 7
    # the read stays correct over the pruned slice
    got = V.read_where(spark, table, probe).collect()
    assert len(got) == 1 and got[0].payload == 1234 * 7


def test_bloom_never_false_negative(spark, table):
    """Absence proofs only: EVERY present key's file must be kept — the
    law that makes bloom pruning an I/O optimization, not a semantic
    change."""
    df = _round_robin_table(spark, table, n=2000)
    for k in range(0, 2000, 97):
        rows = V.read_where(spark, table, [("k", "=", k)]).collect()
        assert len(rows) == 1 and rows[0].k == k, k


def test_bloom_in_predicate_and_string_keys(spark, table):
    df = spark.createDataFrame(
        [(f"user-{i}", i) for i in range(1000)], "uid string, n long"
    )
    V.commit_write(
        df.repartition(4, "uid"),
        table,
        mode="overwrite",
        bloom_cols=["uid"],
    )
    # IN over two present keys keeps at most their two files
    probe = [("uid", "in", ["user-3", "user-7"])]
    _, kept, skipped = V.pruned_paths(table, probe)
    assert kept <= 2 and skipped >= 2, (kept, skipped)
    assert V.read_where(spark, table, probe).count() == 2
    # absent string key: all files proven absent
    _, kept_a, _ = V.pruned_paths(table, [("uid", "=", "user-99999")])
    assert kept_a == 0


def test_pre_bloom_commits_stay_conservative(spark, table):
    """A commit written WITHOUT bloom_cols keeps all its files on point
    probes — mixed tables degrade to zone-map behavior, never to wrong
    answers."""
    df = spark.range(100).select(F.col("id").alias("k"))
    V.commit_write(df.coalesce(1), table, mode="overwrite")
    V.commit_write(
        spark.range(100, 200).select(F.col("id").alias("k")).coalesce(1),
        table,
        mode="append",
        bloom_cols=["k"],
    )
    # key 5 lives in the no-bloom commit: kept there, bloom-skipped in
    # the bloomed commit (its zone map [100,200) already excludes 5,
    # so prune attribution aside, the READ must find it)
    rows = V.read_where(spark, table, [("k", "=", 5)]).collect()
    assert len(rows) == 1
    # a key absent everywhere: the no-bloom file must still be kept
    # when its zone map cannot exclude (probe inside [0,100))
    _, kept, _ = V.pruned_paths(table, [("k", "=", 55)])
    assert kept >= 1
    assert V.read_where(spark, table, [("k", "=", 55)]).count() == 1


def test_xxh64_randomized_parity_law(spark):
    """Beyond the fixture vectors: a seeded random batch of longs and
    strings (varied lengths crossing every XXH64 tail path: <4, <8,
    8-31, >=32 bytes, multi-byte unicode) must hash identically through
    the JVM and the pure-Python prober.  Parity is load-bearing for
    bloom pruning correctness, so the law gets breadth, not just
    points."""
    import random

    rng = random.Random(0xB10053ED)
    longs = [rng.randrange(-(2**63), 2**63) for _ in range(200)]
    alphabet = "abcdefghij0123456789 _-√ü漢字"
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 70)))
        for _ in range(200)
    ]
    lv = spark.createDataFrame([(i, v) for i, v in enumerate(longs)],
                               "i int, v long")
    got = {r.i: r.h for r in lv.select(
        "i", F.xxhash64("v", F.lit(3).cast("long")).alias("h")).collect()}
    for i, v in enumerate(longs):
        assert X.spark_xxhash64([v, 3]) == got[i], v
    sv = spark.createDataFrame([(i, s) for i, s in enumerate(strings)],
                               "i int, s string")
    got_s = {r.i: r.h for r in sv.select(
        "i", F.xxhash64("s").alias("h")).collect()}
    for i, s in enumerate(strings):
        assert X.spark_xxhash64([s]) == got_s[i], repr(s)


def test_xxh64_int_parity_with_spark(spark):
    """Int/short/byte columns take the JVM's 4-byte hashInt path, NOT
    hashLong — the r11 advisor's latent hazard.  The write side records
    the hash family per column and the prober dispatches on it; this
    pins the int leg bit-for-bit against the exact write expression."""
    ints = [0, 1, -1, 42, -42, 2**31 - 1, -(2**31), 123456, -987654]
    iv = spark.createDataFrame([(v,) for v in ints], "v int")
    for i in range(6):
        got = {
            r.v: r.h
            for r in iv.select(
                "v", F.xxhash64("v", F.lit(i).cast("long")).alias("h")
            ).collect()
        }
        for v in ints:
            mine = X._to_signed(X.xxh64_long(i, X.xxh64_int(v, 42)))
            assert mine == got[v], (v, i)
            # and the packaged prober agrees with itself via kind="int"
            assert X.bloom_positions(v, 6, 1 << 62, "int")[i] == mine % (1 << 62)


def test_bloom_int_column_end_to_end(spark, table):
    """An IntegerType bloom column must prune AND stay false-negative-
    free — before the typed dispatch, the probe hashed via hashLong and
    could silently skip a file containing the key."""
    df = spark.range(2000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 3).alias("payload"),
    )
    V.commit_write(
        df.repartition(8, "k"), table, mode="overwrite", bloom_cols=["k"]
    )
    # the commit entry records the hash family
    head = V._read_entry(table, V.latest_version(table))
    assert (head.get("bloom") or {}).get("types") == {"k": "int"}
    # every present key is found (no false negatives through hashInt)
    for k in range(0, 2000, 83):
        rows = V.read_where(spark, table, [("k", "=", k)]).collect()
        assert len(rows) == 1 and rows[0].payload == k * 3, k
    # and pruning still bites on the hash layout
    _, kept, skipped = V.pruned_paths(table, [("k", "=", 777)])
    assert kept == 1 and skipped == 7, (kept, skipped)


def test_bloom_rejects_unhashable_column_types(spark, table):
    """Declaring bloom_cols on a type whose probe literal cannot replicate
    the JVM hash path (double/date/bool) must fail LOUDLY at write time —
    the alternative is silent false negatives at read time."""
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("x")
    )
    with pytest.raises(TypeError, match="Bloom-indexed"):
        V.commit_write(df, table, mode="overwrite", bloom_cols=["x"])


def test_auto_sized_bloom_recovers_selectivity_on_big_files(spark, table):
    """r12: a fixed 8192-bit bitmap saturates past ~1.4k keys/file (the
    lakehouse scale probe measured present-key probes keeping EVERY
    file at 6.25k keys/file).  bloom_bits="auto" sizes ~10 bits per key
    of the largest file, restoring ~single-file point lookups at any
    file size, still absence-proof-only."""
    n, files = 50_000, 8
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    V.commit_write(
        df.repartition(files, "k"), table, mode="overwrite",
        bloom_cols=["k"], bloom_bits="auto",
    )
    head = V._read_entry(table, V.latest_version(table))
    m = head["bloom"]["m"]
    # 50k/8 = 6250 keys/file -> need >= 62500 bits -> 65536
    assert m == 65536
    # present keys: near-single-file (allow a stray false positive)
    for key in (0, n // 2, n - 1):
        _, kept, _ = V.pruned_paths(table, [("k", "=", key)])
        assert kept <= 2, (key, kept)
        got = V.read_where(spark, table, [("k", "=", key)]).collect()
        assert len(got) == 1 and got[0].v == key * 7
    # absent keys still prove absent everywhere
    _, kept_a, _ = V.pruned_paths(table, [("k", "=", -5)])
    assert kept_a == 0


def test_bloom_binary_column_parity(spark, table):
    """Binary bloom columns hash through hashUnsafeBytes — same path as
    strings but without UTF-8 encoding; pin the parity and the
    end-to-end point lookup."""
    bvals = [b"", b"a", b"\x00\x01\x02", b"x" * 9, bytes(range(40))]
    bv = spark.createDataFrame([(v,) for v in bvals], "b binary")
    got = {
        bytes(r.b): r.h
        for r in bv.select("b", F.xxhash64("b", F.lit(2).cast("long"))
                           .alias("h")).collect()
    }
    for v in bvals:
        assert X.spark_xxhash64([v, 2]) == got[v], v

    df = spark.createDataFrame(
        [(i, ("key-%04d" % i).encode()) for i in range(500)],
        "n long, k binary",
    )
    V.commit_write(
        df.repartition(4, "k"), table, mode="overwrite", bloom_cols=["k"]
    )
    head = V._read_entry(table, V.latest_version(table))
    assert head["bloom"]["types"] == {"k": "binary"}
    probe = [("k", "=", b"key-0123")]
    _, kept, skipped = V.pruned_paths(table, probe)
    assert kept <= 2 and skipped >= 2
    rows = V.read_where(spark, table, probe).collect()
    assert len(rows) == 1 and rows[0].n == 123
    _, kept_a, _ = V.pruned_paths(table, [("k", "=", b"absent")])
    assert kept_a == 0
