"""Focused pins for the r14 optimization-round internals: each change
claims VALUE-identical results by construction — these tests hold the
construction to it."""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import functions as F

from data_pipeline_zeal_spark.io import local_frame


def test_local_commit_stats_match_spark_path(spark, tmp_path):
    """commit_write's driver-side stats fast path (local single-file
    commits) must record byte-identical entry stats to the Spark
    aggregate path, including NaN (sorts above everything in Spark) and
    NULL handling and ISO timestamp serialization."""
    from data_pipeline_zeal_spark.sources import versioned as V

    rows = [
        (1, 2.5, datetime.datetime(2024, 1, 5, 3, 0, 0)),
        (7, float("nan"), None),
        (None, -1.0, datetime.datetime(1995, 6, 1)),
    ]
    schema = "a int, b double, g timestamp"
    fast_t = str(tmp_path / "fast")
    slow_t = str(tmp_path / "slow")
    lf = local_frame(spark, rows, schema)
    assert lf.isLocal()
    v1 = V.commit_write(lf, fast_t, mode="overwrite")
    # repartition(1) defeats isLocal -> generic Spark-job path
    v2 = V.commit_write(lf.repartition(1), slow_t, mode="overwrite")
    e1, e2 = V._read_entry(fast_t, v1), V._read_entry(slow_t, v2)
    assert e1["n_rows"] == e2["n_rows"] == 3

    def _canon(stats):
        out = {}
        for c, (lo, hi) in stats.items():
            out[c] = [
                "nan" if isinstance(lo, float) and math.isnan(lo) else lo,
                "nan" if isinstance(hi, float) and math.isnan(hi) else hi,
            ]
        return out

    assert _canon(e1["stats"]) == _canon(e2["stats"])
    # NaN specifically: max must be NaN (Spark ordering), min must not
    assert math.isnan(e1["stats"]["b"][1])
    assert e1["stats"]["b"][0] == -1.0


def test_local_commit_stages_one_file(spark, tmp_path):
    from data_pipeline_zeal_spark.sources import versioned as V

    t = str(tmp_path / "t")
    V.commit_write(
        local_frame(spark, [(i,) for i in range(64)], "a int"), t,
        mode="overwrite",
    )
    [d] = V.live_dirs(t)  # already table-joined
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 1


def test_local_commit_string_columns_fall_back(spark, tmp_path):
    """String stat columns must keep the Spark path (Java vs Python
    collation differs on supplementary-plane chars) — the fast path
    returns None and the generic job records the same stats shape."""
    from data_pipeline_zeal_spark.sources import versioned as V

    lf = local_frame(spark, [(1, "a"), (2, "\U0001F600")], "a int, s string")
    t = str(tmp_path / "t")
    v = V.commit_write(lf, t, mode="overwrite")
    # the fast path must have declined (string stat column): pointing it
    # at the real staged dir returns None, not a stats tuple
    [d] = V.live_dirs(t)
    assert V._local_staged_stats(lf, d) is None
    e = V._read_entry(t, v)
    assert e["stats"]["s"][0] == "a"  # computed by the Spark path


def test_bm25_build_stats_row_matches_retokenizing_form(spark, tmp_path):
    """build_bm25_index's stats row now derives sum_dl from the postings
    (Σtf) and n_docs from a tokenization-free count; it must equal the
    old Σ greatest(size(tokens(text)), 0) form on a corpus with NULL
    text and zero-token docs."""
    from data_pipeline_zeal_spark.functions.textfn import tokens
    from data_pipeline_zeal_spark.operators import retrieval as R
    from data_pipeline_zeal_spark.sources import versioned as V

    docs = local_frame(
        spark,
        [
            (1, "alpha beta beta", "en", "web", 15),
            (2, None, "en", "web", 0),
            (3, "", "de", "web", 0),
            (4, "gamma", "en", "cc", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    t = str(tmp_path / "idx")
    R.build_bm25_index(docs, t, n_buckets=4)
    [srow] = V.read_version(spark, t + "_stats").collect()
    ref = docs.select(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(
            F.greatest(F.size(tokens("text")), F.lit(0)).cast("double")
        ).alias("sum_dl"),
    ).collect()[0]
    assert srow.n_docs == ref.n_docs == 4.0
    assert srow.sum_dl == ref.sum_dl == 4.0  # alpha beta beta gamma
    assert srow.n_buckets == 4


def test_factored_cosine_is_bit_identical(spark):
    """cosine_from_parts(dot(a,b), norm(a), norm(b)) must equal
    cosine(a, b) bit-for-bit (same fold order, same multiplication
    order) — the contract every r14 scoring-join rewrite leans on."""
    import random

    from data_pipeline_zeal_spark.functions.vector import (
        cosine, cosine_from_parts, dot, norm,
    )

    rng = random.Random(7)
    rows = [
        (
            [rng.uniform(-1, 1) for _ in range(16)],
            [rng.uniform(-1, 1) for _ in range(16)],
        )
        for _ in range(200)
    ] + [([0.0] * 16, [1.0] * 16)]
    df = local_frame(spark, rows, "a array<double>, b array<double>")
    out = df.select(
        cosine(F.col("a"), F.col("b")).alias("plain"),
        cosine_from_parts(
            dot(F.col("a"), F.col("b")),
            norm(F.col("a")),
            norm(F.col("b")),
        ).alias("factored"),
    ).collect()
    for r in out:
        assert r.plain == r.factored  # exact, not approx
