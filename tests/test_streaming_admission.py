"""End-to-end streaming near-dup admission: micro-batches of candidate
documents flow through ``dedup_admission_sink`` into a versioned table;
the dedup index evolves so a batch-2 near-dup of a batch-1 ADMISSION is
rejected, and micro-batch replays are exactly-once via the txn log."""

from __future__ import annotations

import os

from data_pipeline_zeal_spark.operators import dedup
from data_pipeline_zeal_spark.sources import versioned as V

SCHEMA = "doc_id long, text string"


def _text(tag: str, n: int = 30) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


def test_streaming_admission_evolving_index(spark, tmp_path, monkeypatch):
    src = str(tmp_path / "incoming")
    table = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    # shingle-once pin: count every signature computation for the life of
    # the sink — seed corpus must be signed EXACTLY once (at creation),
    # each batch exactly once (its own docs); the index side must never
    # be re-signed (it is read back from the persisted signature table)
    sig_calls = []
    real_sig = dedup._minhash_signatures
    monkeypatch.setattr(
        dedup,
        "_minhash_signatures",
        lambda docs, *a, **k: (sig_calls.append(1), real_sig(docs, *a, **k))[1],
    )

    X, Y, Z = _text("x"), _text("y"), _text("z")
    Y_near = Y.replace("y15", "swapped")   # near-dup of Y (jaccard ~0.9)
    X_near = X.replace("x3", "other")

    corpus = spark.createDataFrame([(1000, X)], SCHEMA)

    # batch 1: doc 1 near-dups the seed corpus (reject), doc 2 is fresh
    # (admit), doc 3 near-dups doc 2 WITHIN the batch (self-dedup keeps 2)
    spark.createDataFrame(
        [(1, X_near), (2, Y), (3, Y.replace("y20", "alt"))], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    # batch 2: doc 4 near-dups ADMITTED doc 2 (reject — the index grew),
    # doc 5 is fresh (admit)
    spark.createDataFrame(
        [(4, Y_near), (5, Z)], SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src + "/b2")
    # one file per micro-batch, deterministic order via mtime
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert len(files) == 2
    os.utime(files[0], (1_700_000_000, 1_700_000_000))
    os.utime(files[1], (1_700_000_100, 1_700_000_100))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            dedup.dedup_admission_sink(corpus, table, threshold=0.5)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    admitted = {r.doc_id for r in V.read_version(spark, table).collect()}
    assert admitted == {2, 5}, admitted
    # two commits, one per non-empty micro-batch, each txn-stamped
    hist = V.history(table)
    assert len(hist) == 2

    # the persisted signature index: 1 seed commit + 1 per batch, holding
    # signatures for the seed doc and every admitted survivor, nothing else
    idx = table + "_sigidx"
    assert len(V.history(idx)) == 3
    idx_rows = V.read_version(spark, idx).collect()
    assert {r.doc_id for r in idx_rows} == {1000, 2, 5}
    assert all(r.sh for r in idx_rows)  # shingle sets travel with the sigs
    # corpus shingled exactly once across N batches: 1 seed + 2 batch-side
    # signings (self-dedup's exact path signs nothing), index side zero
    assert len(sig_calls) == 3, len(sig_calls)
    # sink re-creation (stream restart) adopts the seed commit — corpus
    # is NOT re-signed and the index history does not grow
    dedup.dedup_admission_sink(
        spark.createDataFrame([(1000, X)], SCHEMA), table, threshold=0.5
    )
    assert len(V.history(idx)) == 3
    assert len(sig_calls) == 4  # the sig frame is built lazily...
    # ...but commit_write's txn check short-circuits before any job runs;
    # the index table contents are untouched
    assert {r.doc_id for r in V.read_version(spark, idx).collect()} == {
        1000, 2, 5,
    }
    # exactly-once: replaying a micro-batch commit is a no-op
    b2 = V.read_version(spark, table)
    v = V.commit_write(
        b2.filter("doc_id = 5"), table, mode="append", txn="dedup-admit-1"
    )
    assert v == hist[-1]["version"]  # adopted, not re-appended
    assert {r.doc_id for r in V.read_version(spark, table).collect()} == {2, 5}


def test_admission_index_hashes_shingles(spark, tmp_path):
    """r11: the persisted signature index stores xxhash64 shingle images
    (array<bigint>), not raw n-gram text — same admitted set, several-
    fold fewer persisted bytes (8 bytes/shingle vs the shingle string)."""
    from pyspark.sql import functions as F

    table = str(tmp_path / "adm")
    X = _text("longword", 40)  # long words -> long raw shingle strings
    corpus = spark.createDataFrame([(1000, X)], SCHEMA)
    dedup.dedup_admission_sink(corpus, table)

    idx = table + "_sigidx"
    idx_df = V.read_version(spark, idx)
    assert dict(idx_df.dtypes)["sh"] == "array<bigint>"
    # size claim: 8 bytes per hashed shingle vs the raw shingle text
    raw = dedup._minhash_signatures(corpus, 32, 3)
    raw_bytes = raw.select(
        F.sum(
            F.aggregate(
                F.transform("sh", lambda s: F.length(s).cast("long")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
        )
    ).first()[0]
    hashed_bytes = idx_df.select(F.sum(F.size("sh") * 8)).first()[0]
    assert hashed_bytes < raw_bytes / 2, (hashed_bytes, raw_bytes)


def test_admission_seed_fingerprint_txn(spark, tmp_path):
    """r10 advice: the seed commit's txn is a corpus content fingerprint,
    not '{query_name}-sigseed' — a grown seed re-signs instead of
    silently adopting stale signatures, and a different query_name over
    the same table does NOT duplicate the seed."""
    table = str(tmp_path / "adm2")
    idx = table + "_sigidx"
    X, Y, Y_near = _text("x"), _text("y"), _text("y").replace("y15", "sw")
    c1 = spark.createDataFrame([(1, X)], SCHEMA)
    dedup.dedup_admission_sink(c1, table)
    assert len(V.history(idx)) == 1
    # same seed content under a different query_name: adopted, not doubled
    dedup.dedup_admission_sink(c1, table, query_name="other-sink")
    assert len(V.history(idx)) == 1
    # grown seed: fresh fingerprint txn -> the new doc IS signed, and its
    # near-dups are rejected by a subsequent batch
    c2 = spark.createDataFrame([(1, X), (2, Y)], SCHEMA)
    sink = dedup.dedup_admission_sink(c2, table)
    assert len(V.history(idx)) == 2
    assert {r.doc_id for r in V.read_version(spark, idx).collect()} == {1, 2}
    sink(spark.createDataFrame([(3, Y_near)], SCHEMA), 0)
    assert V.latest_version(table) == 1  # commit exists...
    admitted = {r.doc_id for r in V.read_version(spark, table).collect()}
    assert admitted == set()  # ...but the grown seed's near-dup was rejected
