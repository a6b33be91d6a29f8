"""[EXT] Corpus-curation operators — the training-data pipeline surface.

The steps a pre-training data pipeline runs between "raw documents" and
"training mixture": deterministic train/test splitting, stratified
sampling, per-source capping, sequential token packing, quality-filter
chains (Gopher/C4-style), mixture re-weighting, benchmark-contamination
checks, and embedding-level semantic dedup (SemDeDup-style).

Scale notes (100 TB bar):
* Every sampling/split op keys on ``md5(doc_id)`` — a uniform, engine-
  portable hash.  No ``rand()``: results are reproducible across runs,
  retries and engines, which is what makes held-out splits trustworthy.
* Splits/filters are map-only (no shuffle); capping and packing shuffle
  once on their partition key (``source``) — the natural layout key a
  curated corpus is already bucketed by.  Token-crunching ops
  (packing, quality filters, contamination) guard their input with
  ``with_min_parallelism`` — a no-op at scale, where scans already have
  thousands of splits, but it keeps single-file fixture scans from
  serializing the CPU-bound tokenize on one core.
* The contamination check broadcasts only the *deduplicated benchmark
  n-gram set* (benchmarks are ~10⁵ grams — tiny); the corpus side streams
  through one explode + hash join, never a theta join.
* Semantic dedup reuses the banded sign-LSH pair generator at scale
  (``dedup.embedding_near_dup_pairs(method="lsh")``) and min-label
  connected components; the exact path is the small-input/oracle anchor.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textfn import tokens
from ..io import with_min_parallelism
from . import dedup

#: Width of the hex-prefix used for hash bucketing: 4 hex chars = 65536
#: buckets, enough resolution for per-mille sampling fractions.
_BUCKET_CHARS = 4
_BUCKET_SPACE = 16 ** _BUCKET_CHARS


def hash_bucket(key: Column | str) -> Column:
    """Deterministic [0, 65536) bucket as a zero-padded hex prefix of
    ``md5(key)``.  Lexicographic compare on the hex prefix == numeric
    compare on the bucket, and the same expression is portable SQL
    (``substr(md5(CAST(k AS VARCHAR)), 1, 4)``)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, _BUCKET_CHARS)


def frac_threshold(frac: float) -> str:
    """Hex threshold t such that P[hash_bucket < t] ≈ frac."""
    n = max(0, min(_BUCKET_SPACE, int(frac * _BUCKET_SPACE)))
    return format(n, f"0{_BUCKET_CHARS}x")


def hash_split(documents: DataFrame, test_frac: float = 0.1) -> DataFrame:
    """Deterministic train/test split on ``md5(doc_id)`` (reference has no
    split op — this is the [EXT] training-data surface; the hash-mod split
    is the standard reproducible alternative to ``rand()``).

    Map-only: no shuffle, no state; re-runs and backfills land every
    document in the same split forever."""
    thr = frac_threshold(test_frac)
    return documents.select(
        "doc_id",
        "lang",
        "source",
        F.when(hash_bucket("doc_id") < thr, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    ).orderBy("doc_id")


def stratified_sample(
    documents: DataFrame, fractions: dict[str, float], strat_col: str = "lang"
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep-fraction via the
    same hash bucketing as :func:`hash_split` (strata not listed in
    ``fractions`` are dropped).  This is ``df.sampleBy`` with
    reproducibility guarantees — map-only, engine-portable, stable under
    retries, so downstream mixtures are exactly re-creatable."""
    thr: Column = F.lit(frac_threshold(0.0))
    for stratum, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strat_col) == stratum, F.lit(frac_threshold(frac))
        ).otherwise(thr)
    return (
        documents.filter(hash_bucket("doc_id") < thr)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def source_cap(documents: DataFrame, k: int = 10) -> DataFrame:
    """Cap each source at ``k`` documents, chosen by hash order (a
    deterministic uniform sample, not head-of-file bias).  One shuffle on
    ``source``; per-source state in the rank window is O(1).  Heavily
    skewed sources (one domain = half the corpus) rank within their own
    partition only — no global sort."""
    w = Window.partitionBy("source").orderBy(hash_bucket("doc_id"), "doc_id")
    return (
        documents.select(
            "doc_id", "source", F.row_number().over(w).cast("int").alias("sample_rank")
        )
        .filter(F.col("sample_rank") <= k)
        .orderBy("source", "doc_id")
    )


def pack_chunks(documents: DataFrame, target_tokens: int = 256) -> DataFrame:
    """Sequential token packing: within each source (ordered by doc_id),
    assign documents to consecutive chunks of ~``target_tokens`` tokens —
    the "pack documents into context windows" step before tokenization.

    chunk_id = floor(running_token_count_before_this_doc / target), so a
    document always lands in exactly one chunk and chunk boundaries are
    deterministic.  One shuffle on ``source``; the running sum is a
    single-pass window (no self-join)."""
    n_tok = F.size(tokens("text"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    # tokenization is the CPU cost and happens BEFORE the window's source
    # shuffle — spread it even when the fixture scan is a single split
    per_doc = with_min_parallelism(documents).select(
        "doc_id", "source", n_tok.alias("n_tok")
    ).withColumn(
        "chunk_id", F.floor(cum_before / F.lit(float(target_tokens))).cast("int")
    )
    return (
        per_doc.groupBy("source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "chunk_id")
    )


def quality_filter_chain(
    documents: DataFrame,
    min_tokens: int = 24,
    max_tokens: int = 10_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 8.0,
    max_dup_token_ratio: float = 0.6,
) -> DataFrame:
    """Gopher/C4-style quality filter chain: token-count bounds, mean word
    length bounds, and a repetition bound (fraction of tokens that are
    repeats of an earlier token).  Emits per-document metrics + per-rule
    flags + the combined keep bit, so the pipeline can audit *why* a
    document was dropped.  Map-only — scales linearly, zero shuffle."""
    toks = tokens("text")
    n_tok = F.size(toks)
    denom = F.greatest(n_tok, F.lit(1))
    mean_word_len = F.round(
        F.length(F.regexp_replace(F.col("text"), r"\s+", "")) / denom, 6
    )
    dup_ratio = F.round(1 - F.size(F.array_distinct(toks)) / denom, 6)
    metrics = with_min_parallelism(documents).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        dup_ratio.alias("dup_token_ratio"),
    )
    len_ok = (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    mwl_ok = (F.col("mean_word_len") >= min_mean_word_len) & (
        F.col("mean_word_len") <= max_mean_word_len
    )
    rep_ok = F.col("dup_token_ratio") <= max_dup_token_ratio
    return metrics.select(
        "*",
        len_ok.cast("int").alias("len_ok"),
        mwl_ok.cast("int").alias("mwl_ok"),
        rep_ok.cast("int").alias("rep_ok"),
        (len_ok & mwl_ok & rep_ok).cast("int").alias("keep"),
    ).orderBy("doc_id")


def mixture_weights(documents: DataFrame, by: str = "lang") -> DataFrame:
    """Per-group mixture statistics: corpus share and the resampling weight
    that would flatten the mixture to uniform (weight = total /
    (n_groups × group_count); >1 ⇒ upsample, <1 ⇒ downsample).  Two
    map-side-combined aggregates + a broadcast of a 1-row frame."""
    counts = documents.groupBy(by).agg(F.count(F.lit(1)).alias("doc_count"))
    totals = counts.agg(
        F.sum("doc_count").alias("total_docs"),
        F.count(F.lit(1)).alias("n_groups"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            by,
            "doc_count",
            F.round(F.col("doc_count") / F.col("total_docs"), 6).alias("share"),
            F.round(
                F.col("total_docs") / (F.col("n_groups") * F.col("doc_count")), 6
            ).alias("weight"),
        )
        .orderBy(by)
    )


def _distinct_ngrams(tok: Column, n: int) -> Column:
    """Deduplicated word n-grams; documents shorter than n yield none
    (strict n-grams — unlike ``word_shingles``' whole-doc fallback — so
    the overlap semantics match a plain SQL formulation)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tok) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(tok) < n, F.array().cast("array<string>")).otherwise(grams)
    )


def ngram_contamination(
    documents: DataFrame, n: int = 8, benchmark_mod: int = 7
) -> DataFrame:
    """Benchmark-contamination check: corpus documents sharing at least one
    word ``n``-gram with the benchmark set (here: doc_id ≡ 0 mod
    ``benchmark_mod`` stands in for an eval set; in production the
    benchmark frame is passed in).  Returns (doc_id, matched_grams).

    Scale shape: the benchmark side collapses to a DISTINCT gram set and
    is broadcast (eval suites are ~10⁵ grams); the corpus side is one
    explode + broadcast-hash-join + per-doc count.  Grams are deduped
    per document BEFORE the explode so matched_grams counts distinct
    grams with a plain count(*) and the exchange stays minimal."""
    grams = with_min_parallelism(documents).select(
        "doc_id", F.explode(_distinct_ngrams(tokens("text"), n)).alias("gram")
    )
    is_bench = F.col("doc_id") % benchmark_mod == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    return (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("matched_grams"))
        .orderBy("doc_id")
    )


def ngram_containment(
    documents: DataFrame,
    n: int = 8,
    benchmark_mod: int = 7,
    threshold: float = 0.5,
) -> DataFrame:
    """Per-pair n-gram CONTAINMENT of each benchmark document inside each
    training document: |grams(train) ∩ grams(bench)| / |grams(bench)|.

    The decontamination score the binary shared-gram check
    (:func:`ngram_contamination`) cannot express: a short eval question
    embedded verbatim in a long web page has Jaccard ≈ 0 (the big page's
    gram set swamps the union) but containment ≈ 1 — which is why
    production decontamination (GPT-3 appendix C-style) thresholds
    containment, not Jaccard.  Returns (doc_id, bench_id, containment)
    for pairs at or above ``threshold``.

    SCALE: pair generation is a posting join on the gram — only pairs
    that actually share a gram materialize, and the benchmark side
    (eval suites; tiny) is broadcast, so the corpus grams stream through
    one broadcast-hash join and a (doc, bench)-keyed count.  Grams are
    deduped per document before the join; the denominator frame is
    #bench-docs rows."""
    grams = with_min_parallelism(documents).select(
        "doc_id", F.explode(_distinct_ngrams(tokens("text"), n)).alias("gram")
    )
    is_bench = F.col("doc_id") % benchmark_mod == 0
    bench = grams.filter(is_bench).select(
        F.col("doc_id").alias("bench_id"), "gram"
    )
    bench_size = bench.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("n_bench_grams")
    )
    shared = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(F.broadcast(bench_size), "bench_id")
        .select(
            "doc_id",
            "bench_id",
            F.round(F.col("n_shared") / F.col("n_bench_grams"), 6).alias(
                "containment"
            ),
        )
        .filter(F.col("containment") >= threshold)
        .orderBy("doc_id", "bench_id")
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.4,
    method: str = "auto",
    bands: int | None = None,
    planes_per_band: int | None = None,
    n_cells: int | None = None,
    nassign: int = 4,
) -> DataFrame:
    """SemDeDup-style semantic dedup over the embedding table: cosine
    near-dup pairs → connected components → keep the minimum vec_id per
    component.  Returns every vec_id with its cluster id and survivor bit.

    Pair generation delegates to :func:`dedup.embedding_near_dup_pairs`
    (exact theta-join at fixture scale / oracle; banded sign-LSH at 100 TB
    via ``method="lsh"``); clustering is the shared min-label-propagation
    kernel (``dedup.connected_components``).

    When the band layout is not given, the LSH path SOLVES it from the
    threshold via the s-curve collision probability
    (:func:`similarity.derive_band_layout`): recall >= 0.85 at the
    threshold with background candidate volume budgeted < ~9 % of pairs.
    A fixed layout is wrong at both ends — the lean 4x6 at threshold 0.4
    runs at ~23 % recall, while round 5's 8x3 patch admitted ~65 % of all
    pairs as verify candidates.

    ``method="cells"`` is the paper's own blocking: dedup WITHIN k-means
    cells only (``nassign`` multi-assignment for boundary recall), whose
    candidate volume is O(n * cell size) rather than any fraction of n² —
    the scale-safe choice at low thresholds on clustered corpora.

    ``method="auto"`` inherits :func:`dedup.embedding_near_dup_pairs`'s
    THRESHOLD-AWARE dispatch (round-7 directive #1): exact at fixture row
    counts; above that, lsh only when the solver can hold the background
    candidate rate under 2 % of pairs (threshold >= ~0.6), else cells —
    so this function's low default threshold (0.4) auto-routes large
    corpora onto the structurally-linear cell-blocked path."""
    pairs = dedup.embedding_near_dup_pairs(
        embeddings,
        threshold,
        method=method,
        bands=bands,
        planes_per_band=planes_per_band,
        n_cells=n_cells,
        nassign=nassign,
    )
    clusters = dedup.connected_components(
        pairs.select("vec_a", "vec_b"), src="vec_a", dst="vec_b"
    ).select(F.col("doc_id").alias("vec_id"), "cluster_id")
    return (
        embeddings.select("vec_id")
        .join(clusters, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "vec_id") == F.col("vec_id"))
            .cast("int")
            .alias("is_survivor"),
        )
        .orderBy("vec_id")
    )


def token_length_histogram(documents: DataFrame, bin_width: int = 16) -> DataFrame:
    """Token-count histogram in fixed-width bins — the first profiling pass
    before choosing packing/filter thresholds.  Map-only bin assignment,
    one tiny aggregate (rows = occupied bins)."""
    n_tok = F.size(tokens("text"))
    return (
        with_min_parallelism(documents)
        .select((F.floor(n_tok / bin_width)).cast("long").alias("bin"), n_tok.alias("t"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("t").alias("total_tokens"))
        .select(
            "bin",
            (F.col("bin") * bin_width).cast("long").alias("bin_lo"),
            "n_docs",
            "total_tokens",
        )
        .orderBy("bin")
    )


def curation_summary(documents: DataFrame, test_frac: float = 0.1) -> DataFrame:
    """End-to-end curation funnel: raw → quality filter → exact dedup →
    train/test split, reported as one survivor count per stage.

    Composes :func:`quality_filter_chain`, the md5 dedup kernel and
    :func:`hash_split` — the real pipeline a corpus build runs, collapsed
    to its audit row-counts.  Every stage is the operator's own (scalable)
    plan; the summary aggregates are single-row."""
    kept = (
        quality_filter_chain(documents)
        .filter(F.col("keep") == 1)
        .select("doc_id")
    )
    kept_docs = documents.join(kept, "doc_id", "left_semi")
    survivors = kept_docs.select("doc_id", F.md5("text").alias("h")).groupBy(
        "h"
    ).agg(F.min("doc_id").alias("doc_id"))
    split = survivors.select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
            < frac_threshold(test_frac),
            F.lit("test"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )

    def _stage(df: DataFrame, stage_id: int, stage: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(stage_id).alias("stage_id"), F.lit(stage).alias("stage"), "n_docs"
        )

    return (
        _stage(documents, 1, "raw")
        .unionByName(_stage(kept_docs, 2, "quality"))
        .unionByName(_stage(survivors, 3, "dedup"))
        .unionByName(_stage(split.filter(F.col("split") == "train"), 4, "train"))
        .unionByName(_stage(split.filter(F.col("split") == "test"), 5, "test"))
        .orderBy("stage_id")
    )


def weighted_sample(
    documents: DataFrame, k: int = 50, weight_col: str = "n_chars"
) -> DataFrame:
    """Deterministic weighted sample without replacement
    (Efraimidis-Spirakis A-ES): each document draws a hash-derived uniform
    u in (0, 1] and the k smallest ``-ln(u) / weight`` keys win — exactly
    a weighted sample, yet fully reproducible (no ``rand()``), so mixture
    re-draws and backfills pick identical rows.

    Scale shape: the key is map-only arithmetic on an md5 prefix (the
    same portable-hash trick as :func:`hash_split`), and selection is a
    global top-k — Spark plans TakeOrderedAndProject (per-partition heaps
    + driver merge of k rows), never a full sort."""
    u13 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("double")
    # (0, 1]: 13 hex chars = 52 bits, exact in a double
    u = (u13 + F.lit(1.0)) / F.lit(float(16**13 + 1))
    key = -F.log(u) / F.col(weight_col)
    return (
        documents.select(
            "doc_id",
            "lang",
            "source",
            F.col(weight_col).alias("weight"),
            F.round(key, 9).alias("sample_key"),
        )
        .orderBy("sample_key", "doc_id")
        .limit(k)
    )


def boilerplate_profile(
    documents: DataFrame, n: int = 3, min_docs: int = 3
) -> DataFrame:
    """Cross-document boilerplate detection (the RefinedWeb/CCNet move:
    text fragments repeated across many pages are navigation chrome or
    templates, not content).  A word ``n``-gram occurring in at least
    ``min_docs`` distinct documents is boilerplate; per document, report
    its distinct-gram count, how many of those grams are boilerplate,
    and the boilerplate fraction — the score a curation pipeline
    thresholds on before training.

    Scale shape: grams are deduped per document BEFORE the explode
    (bounds the exchange at distinct-grams-per-doc and lets document
    frequency be a plain ``count(*)``); the doc-frequency aggregate
    hashes on the gram — a uniform key with map-side combine; the flag
    rejoins the gram frame on that same key (co-partitioned, AQE picks
    the local strategy) and collapses straight back to one row per doc.
    Nothing is quadratic and no token list survives past its stage."""
    # tokenize-once: the gram frame has two consumers (doc-frequency agg +
    # flag join) and declarative reuse does not survive their divergent
    # projections — checkpoint the INTERMEDIATE (same pattern as
    # source_divergence), keeping the final result lazy so callers can
    # still introspect its plan.
    grams = (
        with_min_parallelism(documents)
        .select(
            "doc_id", F.explode(_distinct_ngrams(tokens("text"), n)).alias("gram")
        )
        .localCheckpoint(eager=True)
    )
    doc_freq = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("doc_count"))
    flagged = (
        grams.join(doc_freq, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("doc_count") >= min_docs, 1).otherwise(0)
            ).alias("n_boilerplate"),
        )
    )
    ng = F.coalesce(F.col("n_grams"), F.lit(0))
    nb = F.coalesce(F.col("n_boilerplate"), F.lit(0))
    return (
        documents.select("doc_id")
        .join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            ng.alias("n_grams"),
            nb.alias("n_boilerplate"),
            F.round(
                F.when(ng == 0, F.lit(0.0)).otherwise(nb.cast("double") / ng), 6
            ).alias("boilerplate_frac"),
        )
        .orderBy("doc_id")
    )


def source_divergence(documents: DataFrame) -> DataFrame:
    """Per-source KL divergence of the unigram token distribution against
    the corpus-wide distribution — the mixture-tuning diagnostic: a source
    with high KL is lexically unlike the blend (over- or under-sampling
    it shifts the training distribution most).

    Scale shape: tokens explode ONCE; everything downstream re-aggregates
    that frame — (source, token) counts, token marginals, source totals —
    so the corpus is scanned a single time.  The grand total attaches as
    a broadcast 1-row frame; all shuffle keys ((source, token), token,
    source) are uniform hash keys with map-side combine.  KL needs no
    smoothing here by construction: every source token is in the corpus
    marginal, so the denominator can't be zero."""
    tok = with_min_parallelism(documents).select(
        "source", F.explode(tokens("text")).alias("token")
    )
    # Materialized: three downstream aggregates consume this frame, and it
    # is (sources x vocabulary)-sized — orders smaller than the corpus —
    # so one checkpoint beats three full re-tokenizations of every shard.
    st = (
        tok.groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    corpus_marginal = st.groupBy("token").agg(F.sum("c").alias("ct"))
    source_totals = st.groupBy("source").agg(F.sum("c").alias("n_src"))
    grand_total = st.agg(F.sum("c").alias("n_tot"))
    p_src = F.col("c") / F.col("n_src")
    p_corpus = F.col("ct") / F.col("n_tot")
    return (
        st.join(corpus_marginal, "token")
        .join(source_totals, "source")
        .crossJoin(F.broadcast(grand_total))
        .groupBy("source")
        .agg(
            F.max("n_src").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.round(F.sum(p_src * F.log(p_src / p_corpus)), 6).alias("kl_vs_corpus"),
        )
        .orderBy("source")
    )


def effective_tokens_by_source(documents: DataFrame) -> DataFrame:
    """Training-budget readout per source: raw token count vs the token
    count that SURVIVES exact dedup (lowest doc_id per identical text) —
    "how much of this source is actually new data".  The number a data
    buyer looks at before paying for another crawl of the same site.

    One md5 groupBy for survivors (uniform 128-bit key), a left-semi join
    back, and one per-source aggregate of map-side token counts
    (``size(tokens)`` is a projection, never an explode)."""
    from ..functions.textfn import tokens
    from .dedup import exact_dedup

    n_tok = F.size(tokens("text"))
    raw = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tok).alias("raw_tokens"),
    )
    kept = (
        exact_dedup(documents)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_surviving_docs"),
            F.sum(n_tok).alias("effective_tokens"),
        )
    )
    return (
        raw.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "raw_tokens",
            F.coalesce("n_surviving_docs", F.lit(0)).alias("n_surviving_docs"),
            F.coalesce("effective_tokens", F.lit(0)).alias("effective_tokens"),
            F.round(
                F.coalesce("effective_tokens", F.lit(0))
                / F.col("raw_tokens"),
                6,
            ).alias("effective_ratio"),
        )
        .orderBy("source")
    )


def shuffle_shards(documents: DataFrame, n_shards: int = 8) -> DataFrame:
    """Deterministic global shuffle into training shards: every document
    gets a pseudo-random but REPRODUCIBLE (shard, position) from its
    md5 — the "shuffle 100 TB once, read in order forever" primitive a
    training run needs (sequential shard reads, no runtime randomness,
    identical order on every rerun/backfill).

    Shard = md5 bucket mod ``n_shards`` (uniform, key-derived);
    position = rank of the md5 WITHIN the shard — a shard-PARTITIONED
    window, so each shard sorts only its own ~1/n of the corpus and
    nothing funnels through one reducer.  Every expression is portable
    SQL (same md5 prefix trick as :func:`hash_split`), so the whole
    assignment is oracle-checkable."""
    h = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(n_shards))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        documents.select(
            "doc_id", h.alias("h"), shard.cast("int").alias("shard")
        )
        .withColumn("position", (F.row_number().over(w) - 1).cast("long"))
        .select("doc_id", "shard", "position")
        .orderBy("shard", "position")
    )


def split_leakage(documents: DataFrame, test_frac: float = 0.1) -> DataFrame:
    """Train/test leakage audit for the hash split: the split is keyed on
    ``doc_id``, so EXACT-TEXT duplicates can legally straddle the
    boundary — every test document whose md5 text hash also appears in
    train is evaluation data the model saw verbatim.  Reports the counts
    and the leaked share of the test split: the check a training run must
    pass before trusting its eval numbers (run exact dedup first or
    switch the split key to the text hash to drive it to zero).

    One scan assigns split + text hash; a window count of train members
    per hash under a single text-hash shuffle marks leaked test docs —
    no self-join, no second scan."""
    from pyspark.sql import Window

    thr = frac_threshold(test_frac)
    tagged = with_min_parallelism(documents).select(
        "doc_id",
        F.md5(F.col("text")).alias("text_hash"),
        F.when(hash_bucket("doc_id") < thr, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    train_copies = F.sum(
        (F.col("split") == "train").cast("long")
    ).over(Window.partitionBy("text_hash"))
    marked = tagged.withColumn("in_train", train_copies > 0)
    return marked.agg(
        F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
        F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
        F.sum(
            ((F.col("split") == "test") & F.col("in_train")).cast("long")
        ).alias("n_leaked"),
        F.round(
            F.sum(((F.col("split") == "test") & F.col("in_train")).cast("long"))
            / F.greatest(
                F.sum((F.col("split") == "test").cast("long")), F.lit(1)
            ),
            6,
        ).alias("leak_rate"),
    )


def decontaminate(
    documents: DataFrame, n: int = 8, benchmark_mod: int = 7
) -> DataFrame:
    """The removal half of :func:`ngram_contamination`: the surviving
    training corpus after dropping every document that shares at least one
    word ``n``-gram with the benchmark set (and the benchmark documents
    themselves).  Returns (doc_id, lang, source) of survivors — what
    actually ships to the trainer after the decontamination pass.

    Same scale shape as the check: broadcast benchmark gram set, one
    explode + broadcast join to find contaminated ids, then a LEFT ANTI
    join back — corpus rows never shuffle, only the (small) contaminated
    id set does."""
    grams = with_min_parallelism(documents).select(
        "doc_id", F.explode(_distinct_ngrams(tokens("text"), n)).alias("gram")
    )
    is_bench = F.col("doc_id") % benchmark_mod == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    contaminated = (
        grams.filter(~is_bench)
        .join(F.broadcast(bench), "gram")
        .select("doc_id")
        .distinct()
    )
    return (
        documents.filter(~is_bench)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def build_gram_bloom(
    grams: DataFrame, m_bits: int = 1 << 20, k_hashes: int = 7
):
    """Aggregate a Bloom-filter bitmap over a single-column ``gram`` frame,
    entirely distributed: each gram sets ``k_hashes`` bit positions
    (``xxhash64(gram, seed) mod m_bits``), positions pack into 64-bit words
    via a map-side-combined ``bit_or`` aggregate keyed on the word index,
    and the driver collects AT MOST ``m_bits / 64`` rows — the collect is
    bounded by the FILTER size, never by the data (2^20 bits = 16 Ki words
    = 128 KiB regardless of whether the gram side is 10^5 or 10^10 rows).

    Returns a ``numpy.uint64`` array of ``m_bits // 64`` words.  Standard
    Bloom property: no false negatives; false-positive rate ≈
    (1 - e^(-k·n/m))^k, so size ``m_bits`` ≈ 10–16 bits per expected
    distinct gram for ~1 % FPR."""
    import numpy as np

    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    positions = grams.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64("gram", F.lit(i)), F.lit(m_bits)).alias(
                        f"p{i}"
                    )
                    for i in range(k_hashes)
                ]
            )
        ).alias("pos")
    )
    words = (
        positions.select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(1L, int(pos % 64))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()  # bounded: <= m_bits/64 rows (the bitmap itself)
    )
    bitmap = np.zeros(m_bits // 64, dtype=np.uint64)
    for r in words:
        bitmap[r.w] = np.uint64(r.bits & 0xFFFFFFFFFFFFFFFF)
    return bitmap


def _bloom_membership_udf(bitmap, k_hashes: int):
    """Arrow-batched membership test against a driver-built Bloom bitmap.
    The k probe POSITIONS are computed JVM-side (``xxhash64`` columns), so
    Python does only the vectorized bit lookups — one fancy-index + mask
    per batch over a ``numpy.uint64`` word array shipped once per task in
    the closure (m_bits/8 bytes; 128 KiB at the default size)."""
    import numpy as np

    words = bitmap

    @F.pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        if not len(pos):
            return pd.Series([], dtype=bool)
        P = np.array(pos.tolist(), dtype=np.int64)  # (batch, k) positions
        # guard the caller contract: the position arrays must carry
        # exactly the k the bitmap was built with, else probes silently
        # test the wrong bit pattern (round-8 advice).  A real raise, not
        # assert — python -O must not strip the guard (round-9 advice).
        if P.shape[1] != k_hashes:
            raise ValueError(
                f"probe arrays carry {P.shape[1]} positions, bitmap built "
                f"with k_hashes={k_hashes}"
            )
        w = words[P >> 6]
        bit = np.uint64(1) << (P & 63).astype(np.uint64)
        return pd.Series(((w & bit) != 0).all(axis=1))

    return might_contain


def decontaminate_bloom(
    documents: DataFrame,
    n: int = 8,
    benchmark_mod: int = 7,
    m_bits: int = 1 << 20,
    k_hashes: int = 7,
    confirm_broadcast: bool = True,
) -> DataFrame:
    """Bloom-prefiltered decontamination — identical OUTPUT to
    :func:`decontaminate` (Bloom filters admit false positives but never
    false negatives, and every bloom-positive gram is exact-confirmed
    against the true benchmark set before a document is dropped), with the
    scale shape for benchmark/held-out sides too large to broadcast raw:

    1. The benchmark gram set folds into an ``m_bits`` Bloom bitmap via
       one distributed ``bit_or`` aggregate (:func:`build_gram_bloom`) —
       the driver never holds the gram set, only the fixed-size bitmap.
    2. The corpus gram stream is prefiltered MAP-SIDE by the bitmap
       (vectorized Arrow batches, k JVM-computed hash positions per gram);
       at a calibrated ~1 % FPR this drops ~99 % of clean grams before any
       join, so the exchange downstream carries only true matches + FPs.
    3. Surviving grams exact-confirm via the same broadcast hash join as
       the exact path, eliminating the FPs; anti-join drops contaminated
       documents.

    At 100 TB: a 10^9-gram held-out side is ~50+ GB of raw strings —
    un-broadcastable — but its 1 %-FPR bloom is ~1.8 GB shipped once per
    executor, and the confirm join's build side only has to serve the
    bloom-positive trickle.  ``confirm_broadcast`` selects the confirm
    join's physical shape (round-8 advice: the documented 100 TB shape
    must be selectable, not just described): True (default, right for
    fixture-scale benchmark sets) broadcasts the raw gram set; False runs
    a gram-keyed shuffle hash join instead — the bloom prefilter already
    shrank the probe side ~100x, so both sides of that shuffle are the
    bloom-positive trickle plus the benchmark grams, never the corpus.
    """
    grams = with_min_parallelism(documents).select(
        "doc_id", F.explode(_distinct_ngrams(tokens("text"), n)).alias("gram")
    )
    is_bench = F.col("doc_id") % benchmark_mod == 0
    bench = grams.filter(is_bench).select("gram").distinct()
    bitmap = build_gram_bloom(bench, m_bits, k_hashes)
    might_contain = _bloom_membership_udf(bitmap, k_hashes)
    pos = F.array(
        *[
            F.pmod(F.xxhash64("gram", F.lit(i)), F.lit(m_bits))
            for i in range(k_hashes)
        ]
    )
    suspects = grams.filter(~is_bench).filter(might_contain(pos))
    confirm_side = F.broadcast(bench) if confirm_broadcast else bench
    contaminated = (
        suspects.join(confirm_side, "gram").select("doc_id").distinct()
    )
    return (
        documents.filter(~is_bench)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def decontaminate_fuzzy(
    documents: DataFrame,
    benchmark_mod: int = 7,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """NEAR-duplicate decontamination: drop corpus documents whose text
    near-duplicates a held-out/benchmark document at shingle-Jaccard >=
    ``threshold`` — catching paraphrased or lightly-edited contamination
    that exact n-gram matching (:func:`decontaminate` /
    :func:`decontaminate_bloom`) misses.  The fuzzy tier of the standard
    decontamination ladder (exact grams -> fuzzy near-dup).

    Pure composition: :func:`~.dedup.incremental_dedup` with the
    benchmark slice as the "existing corpus" side — the cross-frame
    MinHash/LSH bucket join, exact-Jaccard verification, and anti-join
    are the audited admission-filter kernels, so the scale shape is
    inherited (band-keyed uniform shuffles; the benchmark side is banded
    once and is the natural side to persist as a reusable index).
    Returns the surviving (doc_id, lang, source) rows, same contract as
    the exact path."""
    from . import dedup

    is_bench = F.col("doc_id") % benchmark_mod == 0
    bench = documents.filter(is_bench)
    rest = documents.filter(~is_bench)
    survivors = dedup.incremental_dedup(
        rest,
        bench,
        threshold=threshold,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    return survivors.select("doc_id", "lang", "source").orderBy("doc_id")


def epoch_plan(
    documents: DataFrame,
    target_tokens: int,
    by: str = "source",
    alpha: float = 0.3,
) -> DataFrame:
    """Training-run epoch plan: given a total token budget and a
    temperature-``alpha`` mixture (same q_i ∝ p_i^alpha recipe as
    :func:`temperature_mixture`, but weighted by TOKENS, not documents),
    how many tokens each group must contribute and how many EPOCHS
    (repeats) of the group that implies — the repetition plan a data
    loader executes (epochs > 1 = upsampling; < 1 = subsample).

    Same scale shape as the mixture ops: one group aggregate over
    whitespace token counts (map-side combined, group cardinality is
    enum-small) plus two 1-row broadcast attaches."""
    toks = documents.groupBy(by).agg(
        F.sum(F.size(tokens("text"))).alias("available_tokens")
    )
    powed = toks.withColumn("powed", F.pow("available_tokens", F.lit(alpha)))
    z = powed.agg(F.sum("powed").alias("z"))
    share = F.col("powed") / F.col("z")
    target = share * F.lit(float(target_tokens))
    return (
        powed.join(F.broadcast(z))
        .select(
            by,
            "available_tokens",
            F.round(share, 6).alias("token_share"),
            F.round(target, 2).alias("target_tokens"),
            # an all-empty group has 0 available tokens and 0 share;
            # pin its epochs to 0.0 instead of inheriting 0/0 semantics
            F.round(
                F.when(F.col("available_tokens") > 0,
                       target / F.col("available_tokens")).otherwise(0.0),
                4,
            ).alias("epochs"),
        )
        .orderBy(by)
    )


def temperature_mixture(
    documents: DataFrame, by: str = "lang", alpha: float = 0.3
) -> DataFrame:
    """Temperature-scaled sampling mixture (the mT5/XLM-R alpha-sampling
    recipe, public): resample group shares as ``q_i ∝ p_i^alpha`` —
    ``alpha=1`` keeps the natural mixture, ``alpha→0`` flattens toward
    uniform, the standard 0.3 boosts low-resource groups without drowning
    the head.  Returns per group the natural share, the temperature share,
    and the up/downsampling factor a weighted sampler applies.

    Same scale shape as :func:`mixture_weights`: one group-count
    aggregate (map-side-combined, group cardinality is enum-small) plus
    two 1-row broadcast attaches (total and the power-sum normalizer)."""
    counts = documents.groupBy(by).agg(F.count(F.lit(1)).alias("doc_count"))
    totals = counts.agg(F.sum("doc_count").alias("total_docs"))
    # q_i = p_i^a / sum p_j^a == c_i^a / sum c_j^a (the total^a cancels),
    # so the power branch never needs the totals join
    powed_counts = counts.withColumn("powed", F.pow("doc_count", F.lit(alpha)))
    z = powed_counts.agg(F.sum("powed").alias("z"))
    p = F.col("doc_count") / F.col("total_docs")
    return (
        powed_counts.join(F.broadcast(z))
        .join(F.broadcast(totals))
        .select(
            by,
            "doc_count",
            F.round(p, 6).alias("share"),
            F.round(F.col("powed") / F.col("z"), 6).alias("temp_share"),
            F.round((F.col("powed") / F.col("z")) / p, 6).alias(
                "sample_factor"
            ),
        )
        .orderBy(by)
    )


def perplexity_filter(
    documents: DataFrame,
    alpha: float = 0.5,
    cutpoints: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    cutoffs: tuple[float, float] | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020, public): score
    every document with the corpus-trained bigram LM
    (:func:`text.bigram_logprob`), split the score distribution at the
    ``cutpoints`` quantiles, and label documents ``head`` / ``middle`` /
    ``tail`` — the standard LM-quality gate that keeps the most-fluent
    buckets (``kept`` = not tail) for pretraining.

    Returns (doc_id, n_bigrams, bits_per_bigram, ppl_bucket, kept).
    Documents with fewer than two tokens carry no bigram and drop out
    (the scorer's contract).

    SCALE: the scoring side is :func:`text.bigram_logprob`'s shape
    (Zipf-bounded count joins).  The default quantile computation is the
    EXACT ``percentile`` aggregate — the oracle anchor, same role as
    ``price_quantiles`` — which buffers the per-doc score column; at
    100 TB pass precomputed ``cutoffs`` (from a held-out sample or the GK
    sketch in ``operators.sketch``) and the whole filter is map-only
    after scoring.  Cutoffs attach as a 1-row broadcast either way."""
    from . import text

    scored = text.bigram_logprob(documents, alpha=alpha)
    if cutoffs is None:
        # the score frame feeds BOTH the percentile aggregate and the
        # bucket projection — checkpoint the (#docs)-row table once so
        # the bigram-LM training subplan doesn't execute twice
        scored = scored.localCheckpoint(eager=True)
        cuts = scored.agg(
            F.percentile(
                "bits_per_bigram",
                F.array(F.lit(cutpoints[0]), F.lit(cutpoints[1])),
            ).alias("q")
        ).select(
            F.col("q")[0].alias("c_head"), F.col("q")[1].alias("c_middle")
        )
        scored = scored.join(F.broadcast(cuts))
    else:
        scored = scored.withColumn(
            "c_head", F.lit(float(cutoffs[0]))
        ).withColumn("c_middle", F.lit(float(cutoffs[1])))
    bits = F.col("bits_per_bigram")
    bucket = (
        F.when(bits <= F.col("c_head"), F.lit("head"))
        .when(bits <= F.col("c_middle"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.select(
            "doc_id",
            "n_bigrams",
            "bits_per_bigram",
            bucket.alias("ppl_bucket"),
            (bits <= F.col("c_middle")).cast("int").alias("kept"),
        )
        .orderBy("doc_id")
    )


def dsir_weights(
    documents: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    dim: int = 128,
    alpha: float = 0.5,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
    public): log importance weight per document under hashed-unigram
    bag-of-words models of a TARGET distribution (here the rows whose
    ``target_col`` equals ``target_value``; production callers filter by a
    curated exemplar set) versus the RAW corpus:

        log w(x) = sum_f c_f(x) * [log p_tgt(f) - log p_raw(f)]

    with add-``alpha`` smoothing over the ``dim`` hashed feature buckets.
    High-weight documents look like the target; feed the weights to
    :func:`weighted_sample` to realize the resampled corpus.  Returns
    (doc_id, n_tokens, log_weight) — zero-token docs drop out.

    SCALE: one tokenize+hash explode into a map-side-combined
    (doc_id, bucket) count — the only corpus-sized shuffle; both bucket
    models aggregate to ``dim`` rows and attach as broadcasts, so the
    per-doc weight is a broadcast join + one aggregate.  Buckets use the
    portable md5-prefix hash (:func:`hash_bucket` trick), making the
    whole pipeline plain SQL and oracle-checkable."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("token")), 1, 4), 16, 10).cast("long"),
        F.lit(dim),
    ).cast("int")
    tok = (
        with_min_parallelism(documents)
        .select(
            "doc_id",
            (F.col(target_col) == target_value).alias("is_tgt"),
            F.explode(tokens("text")).alias("token"),
        )
        .select("doc_id", "is_tgt", bucket.alias("bucket"))
    )
    docb = tok.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c"),
        # per-doc constant; max is a no-op carry that avoids a re-join
        F.max("is_tgt").alias("is_tgt"),
    )
    raw = docb.groupBy("bucket").agg(F.sum("c").alias("c_raw"))
    tgt = (
        docb.filter("is_tgt")
        .groupBy("bucket")
        .agg(F.sum("c").alias("c_tgt"))
    )
    model = (
        raw.join(tgt, "bucket", "left")
        .withColumn("c_tgt", F.coalesce("c_tgt", F.lit(0)))
    )
    totals = model.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    lr = F.log(
        (F.col("c_tgt") + F.lit(alpha))
        / (F.col("t_tgt") + F.lit(alpha * dim))
    ) - F.log(
        (F.col("c_raw") + F.lit(alpha))
        / (F.col("t_raw") + F.lit(alpha * dim))
    )
    bucket_lr = model.join(F.broadcast(totals)).select(
        "bucket", lr.alias("log_ratio")
    )
    return (
        docb.join(F.broadcast(bucket_lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(F.sum(F.col("c") * F.col("log_ratio")), 6).alias(
                "log_weight"
            ),
        )
        .orderBy("doc_id")
    )
