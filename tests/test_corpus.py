"""Behavioral invariants for the corpus-curation operators (cross-engine
value parity is covered query-by-query in test_oracle_parity)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from data_pipeline_zeal_spark import plans
from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import corpus

SF_SMALL = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_SMALL, "documents")


def test_hash_split_deterministic_and_calibrated(spark):
    split = corpus.hash_split(_docs(spark), test_frac=0.1)
    rows = {r.doc_id: r.split for r in split.collect()}
    again = {r.doc_id: r.split for r in corpus.hash_split(_docs(spark), 0.1).collect()}
    assert rows == again  # same hash -> same split, forever
    test_frac = sum(1 for v in rows.values() if v == "test") / len(rows)
    assert 0.05 <= test_frac <= 0.2  # 500 docs: wide tolerance around 0.1


def test_hash_split_is_map_only(spark):
    s = plans.summarize(corpus.hash_split(_docs(spark)).drop("ordered"))
    # the only exchange allowed is the presentation-order sort
    assert s.shuffles <= 1


def test_stratified_sample_subset_and_strata(spark):
    fracs = {"en": 0.1, "de": 0.5}
    sampled = corpus.stratified_sample(_docs(spark), fracs).collect()
    assert {r.lang for r in sampled} <= set(fracs)
    by_lang = Counter(r.lang for r in sampled)
    totals = Counter(r.lang for r in _docs(spark).select("lang").collect())
    for lang, frac in fracs.items():
        got = by_lang[lang] / totals[lang]
        assert abs(got - frac) < 0.15, (lang, got)


def test_source_cap_bounds_every_source(spark):
    capped = corpus.source_cap(_docs(spark), k=10).collect()
    per_source = Counter(r.source for r in capped)
    assert max(per_source.values()) <= 10
    assert len(per_source) == 20  # no source vanishes
    assert all(1 <= r.sample_rank <= 10 for r in capped)


def test_pack_chunks_partitions_tokens_exactly(spark):
    docs = _docs(spark)
    chunk_sum = {
        r.source: r
        for r in corpus.pack_chunks(docs, target_tokens=256)
        .groupBy("source")
        .agg(
            F.sum("chunk_tokens").alias("tok"),
            F.sum("n_docs").alias("docs"),
            F.min("chunk_id").alias("min_chunk"),
            F.max("chunk_id").alias("max_chunk"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .collect()
    }
    truth = {
        r.source: r
        for r in docs.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("tok"),
            F.count(F.lit(1)).alias("docs"),
        )
        .collect()
    }
    assert set(chunk_sum) == set(truth) and len(truth) == 20
    for source, r in chunk_sum.items():
        # every token and every doc lands in exactly one chunk
        assert r["tok"] == truth[source]["tok"]
        assert r["docs"] == truth[source]["docs"]
        # chunk ids start at 0 and are consecutive
        assert r["min_chunk"] == 0
        assert r["max_chunk"] + 1 == r["n_chunks"]


def test_quality_filter_flags_compose(spark):
    rows = corpus.quality_filter_chain(_docs(spark)).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)  # non-vacuous at sf0.001
    for r in rows:
        assert r.keep == (r.len_ok and r.mwl_ok and r.rep_ok)


def test_mixture_weights_flatten_to_uniform(spark):
    w = corpus.mixture_weights(_docs(spark), by="lang").collect()
    assert abs(sum(r.share for r in w) - 1.0) < 1e-4
    total = sum(r.doc_count for r in w)
    for r in w:
        # weight * count restores the uniform per-group allocation
        assert abs(r.weight * r.doc_count - total / len(w)) < 0.01 * total


def test_contamination_excludes_benchmark_docs(spark):
    hits = corpus.ngram_contamination(_docs(spark), n=8, benchmark_mod=7).collect()
    assert hits  # fixture plants shared 8-grams
    assert all(r.doc_id % 7 != 0 for r in hits)
    assert all(r.matched_grams >= 1 for r in hits)


def test_semantic_dedup_one_survivor_per_cluster(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    out = corpus.semantic_dedup(emb, threshold=0.4, method="exact").collect()
    assert len(out) == emb.count()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r)
        assert r.is_survivor == int(r.cluster_id == r.vec_id)
    for cid, members in by_cluster.items():
        assert sum(m.is_survivor for m in members) == 1
        assert cid == min(m.vec_id for m in members)


def test_semantic_dedup_lsh_path_has_no_theta_join(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    df = corpus.semantic_dedup(emb, threshold=0.4, method="lsh")
    plan = plans.explain_mode(df, "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_split_leakage_detects_straddling_duplicates(spark):
    from data_pipeline_zeal_spark.operators import corpus

    # craft doc_ids whose hash buckets land one copy of a duplicate text
    # on each side of the 10% split boundary
    from data_pipeline_zeal_spark.operators.corpus import (
        frac_threshold,
        hash_bucket,
    )
    from pyspark.sql import functions as F

    thr = frac_threshold(0.1)
    base = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    ).withColumn("b", hash_bucket("doc_id"))
    rows = {r.doc_id: r.b for r in base.collect()}
    test_ids = [i for i, b in rows.items() if b < thr]
    train_ids = [i for i, b in rows.items() if b >= thr]
    assert test_ids and train_ids
    docs = spark.createDataFrame(
        [
            (test_ids[0], "dup text", "en", "s", 8),    # test copy
            (train_ids[0], "dup text", "en", "s", 8),   # train copy -> leak
            (train_ids[1], "unique a", "en", "s", 8),
            (test_ids[1] if len(test_ids) > 1 else test_ids[0] + 0,
             "unique b", "en", "s", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    row = corpus.split_leakage(docs, test_frac=0.1).collect()[0]
    assert row.n_leaked == 1
    assert row.n_test >= 1 and row.n_train >= 2
    assert row.leak_rate == round(1 / row.n_test, 6)


def test_decontaminate_complements_contamination_report(spark):
    """Survivors = non-benchmark docs minus exactly the ids the
    contamination check reports."""
    from data_pipeline_zeal_spark.operators import corpus
    from data_pipeline_zeal_spark.io import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    flagged = {
        r.doc_id
        for r in corpus.ngram_contamination(docs, n=8, benchmark_mod=7).collect()
    }
    survivors = {
        r.doc_id
        for r in corpus.decontaminate(docs, n=8, benchmark_mod=7).collect()
    }
    non_bench = {
        r.doc_id for r in docs.select("doc_id").collect() if r.doc_id % 7 != 0
    }
    assert survivors == non_bench - flagged
    assert survivors.isdisjoint(flagged)


def test_decontaminate_bloom_matches_exact(spark):
    """The bloom-prefiltered path must emit byte-identical survivors to
    the exact path: blooms admit false positives (removed by the exact
    confirm join) but never false negatives."""
    docs = _docs(spark)
    exact = corpus.decontaminate(docs, n=8, benchmark_mod=7).collect()
    bloom = corpus.decontaminate_bloom(docs, n=8, benchmark_mod=7).collect()
    assert bloom == exact


def test_decontaminate_bloom_shuffle_confirm_matches_exact(spark):
    """confirm_broadcast=False (the 100 TB shape: held-out gram set too
    large to broadcast raw) drops the broadcast hint from the confirm
    join (AQE may still pick broadcast at fixture scale — the point is
    the hint no longer FORCES it); the OUTPUT must stay byte-identical
    to the exact path."""
    docs = _docs(spark)
    exact = corpus.decontaminate(docs, n=8, benchmark_mod=7).collect()
    shuffled_df = corpus.decontaminate_bloom(
        docs, n=8, benchmark_mod=7, confirm_broadcast=False
    )
    assert shuffled_df.collect() == exact


def test_decontaminate_bloom_saturated_filter_still_exact(spark):
    """A deliberately undersized bitmap (256 bits for thousands of grams
    — near-100 % FPR) floods the confirm join with false positives; the
    OUTPUT must not change, only the prefilter's selectivity."""
    docs = _docs(spark)
    exact = corpus.decontaminate(docs, n=8, benchmark_mod=7).collect()
    tiny = corpus.decontaminate_bloom(
        docs, n=8, benchmark_mod=7, m_bits=256, k_hashes=3
    ).collect()
    assert tiny == exact


def test_build_gram_bloom_properties(spark):
    """Bitmap size is fixed by m_bits (the driver collect is bounded by
    the FILTER, not the data); every inserted gram tests positive (no
    false negatives); a disjoint probe set shows a low FP rate at the
    calibrated size."""
    import numpy as np

    docs = _docs(spark)
    grams = docs.limit(50).select(
        F.explode(
            corpus._distinct_ngrams(corpus.tokens("text"), 8)
        ).alias("gram")
    ).distinct()
    m_bits, k = 1 << 16, 5
    bm = corpus.build_gram_bloom(grams, m_bits=m_bits, k_hashes=k)
    assert bm.shape == (m_bits // 64,) and bm.dtype == np.uint64

    pos = F.array(
        *[
            F.pmod(F.xxhash64("gram", F.lit(i)), F.lit(m_bits))
            for i in range(k)
        ]
    )
    member = corpus._bloom_membership_udf(bm, k)
    hits = grams.select(member(pos).alias("m")).collect()
    assert all(r.m for r in hits)  # no false negatives, ever

    probes = spark.range(2000).select(
        F.concat(F.lit("zz-not-a-gram-"), F.col("id")).alias("gram")
    )
    fp = probes.select(member(pos).alias("m")).filter("m").count()
    assert fp / 2000 < 0.05  # ~((1-e^(-kn/m))^k) ~= tiny at 16 bits/gram

    # the k-width contract guard must be a real raise (survives -O), not
    # an assert (round-9 advice): probing with k-1 positions fails loudly
    import pytest

    bad_pos = F.array(
        *[
            F.pmod(F.xxhash64("gram", F.lit(i)), F.lit(m_bits))
            for i in range(k - 1)
        ]
    )
    with pytest.raises(Exception, match="probe arrays carry") as ei:
        grams.select(member(bad_pos).alias("m")).collect()
    assert not isinstance(ei.value, AssertionError)


def test_temperature_mixture_laws(spark):
    """alpha=1 reproduces the natural mixture; alpha<1 moves every
    group's temp share toward uniform (tail up, head down); shares sum
    to 1 either way."""
    from data_pipeline_zeal_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, "x", "big" if i < 90 else "small", "s", 1) for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    flat = {r.lang: r for r in corpus.temperature_mixture(docs, alpha=1.0).collect()}
    assert abs(flat["big"].temp_share - 0.9) < 1e-6
    assert abs(flat["big"].sample_factor - 1.0) < 1e-6
    temp = {r.lang: r for r in corpus.temperature_mixture(docs, alpha=0.3).collect()}
    assert temp["small"].temp_share > 0.1      # tail boosted
    assert temp["big"].temp_share < 0.9        # head damped
    assert abs(sum(r.temp_share for r in temp.values()) - 1.0) < 1e-5
    assert temp["small"].sample_factor > 1.0 > temp["big"].sample_factor


def test_basket_rules_laws(spark):
    """Association-rule invariants on the fixture: confidence in (0, 1],
    support matches the pair kernel, and lift is symmetric across the two
    directions of a pair (lift(A->B) == lift(B->A) by definition)."""
    from data_pipeline_zeal_spark.operators import etl

    li = load_table(spark, SF_SMALL, "lineitem")
    rules = etl.basket_association_rules(li, min_support=2, top_n=10_000)
    rows = rules.collect()
    assert rows, "fixture must produce rules"
    assert all(0 < r.confidence <= 1.0 for r in rows)
    assert all(r.support >= 2 for r in rows)
    by_pair = {(r.antecedent, r.consequent): r for r in rows}
    for (a, b), r in by_pair.items():
        mirror = by_pair.get((b, a))
        if mirror is not None:
            assert abs(r.lift - mirror.lift) < 1e-6
            assert r.support == mirror.support


def test_compression_ratio_signal(spark):
    """Closed-form pins for the zlib repetition signal: pure repetition
    compresses to a tiny ratio, high-entropy text stays near (or above) 1,
    prose sits in between; empty text yields NULL."""
    import random
    import string

    from data_pipeline_zeal_spark.operators import text as textops

    random.seed(3)
    noise = "".join(random.choice(string.ascii_letters + " ") for _ in range(2000))
    rows = [
        (1, "spam " * 400),
        (2, noise),
        (3, "The quick brown fox jumps over the lazy dog. " * 40),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.compression_ratio for r in textops.compression_ratio(df).collect()}
    assert got[1] < 0.05          # repetition collapses
    assert got[2] > 0.7           # noise barely compresses
    assert got[1] < got[3] < got[2]
    assert got[4] is None
    # determinism: identical on rerun
    again = {r.doc_id: r.compression_ratio for r in textops.compression_ratio(df).collect()}
    assert got == again


def test_perplexity_filter_tertiles_and_cutoff_path(spark):
    """Tertile buckets cover ~1/3 of scored docs each, kept == not-tail,
    and the explicit-cutoffs scale path reproduces the exact-percentile
    default bit-for-bit when handed the same cutoffs."""
    out = corpus.perplexity_filter(_docs(spark), alpha=0.5).collect()
    n = len(out)
    assert n > 0
    by_bucket = Counter(r.ppl_bucket for r in out)
    assert set(by_bucket) == {"head", "middle", "tail"}
    for share in by_bucket.values():
        assert abs(share / n - 1 / 3) < 0.1  # ties can shift boundaries
    for r in out:
        assert r.kept == (0 if r.ppl_bucket == "tail" else 1)
    # recover the cutoffs the default run used and replay via the
    # map-only path production would take at 100 TB
    c_head = max(r.bits_per_bigram for r in out if r.ppl_bucket == "head")
    c_mid = max(r.bits_per_bigram for r in out if r.ppl_bucket == "middle")
    replay = corpus.perplexity_filter(
        _docs(spark), alpha=0.5, cutoffs=(c_head, c_mid)
    ).collect()
    assert {(r.doc_id, r.ppl_bucket) for r in replay} >= {
        (r.doc_id, r.ppl_bucket) for r in out
    }


def test_dsir_weights_favor_target_slice(spark):
    """DSIR's defining property: documents FROM the target slice score a
    higher mean log-weight than the rest (the hashed-unigram models are
    trained on exactly that contrast); weights are finite and the op is
    deterministic."""
    docs = _docs(spark)
    w = corpus.dsir_weights(docs, target_col="lang", target_value="en")
    joined = {
        r.doc_id: (r.log_weight, r.lang)
        for r in w.join(docs.select("doc_id", "lang"), "doc_id").collect()
    }
    tgt = [lw for lw, lang in joined.values() if lang == "en"]
    rest = [lw for lw, lang in joined.values() if lang != "en"]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)
    again = {r.doc_id: r.log_weight for r in corpus.dsir_weights(
        docs, target_col="lang", target_value="en").collect()}
    assert {k: v[0] for k, v in joined.items()} == again


def test_decontaminate_fuzzy_catches_paraphrased_contamination(spark):
    """A corpus doc that near-duplicates a benchmark doc (one word
    swapped — high shingle Jaccard, but no exact long-n-gram overlap
    run) is dropped; an unrelated doc survives; benchmark docs never
    appear in the output."""
    base = " ".join(f"tok{i}" for i in range(30))
    near = base.replace("tok15", "swapped")
    rows = [
        (7, base, "en", "bench", len(base)),       # benchmark (id % 7 == 0)
        (8, near, "en", "crawl", len(near)),       # fuzzy contamination
        (9, "totally different text entirely here", "en", "crawl", 36),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id for r in corpus.decontaminate_fuzzy(
        docs, benchmark_mod=7, threshold=0.5).collect()}
    assert out == {9}
