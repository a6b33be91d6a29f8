"""Data-quality audit checks: each constraint must count its violations
exactly, and the audit union must carry the pass flag per check."""

from __future__ import annotations

from data_pipeline_zeal_spark.operators import quality as dq


def test_each_check_counts_violations(spark):
    child = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", None), (2, "a", -1.0), (9, "zz", 200.0)],
        "k long, cat string, v double",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")

    result = {
        r.check: (r.n_checked, r.n_violations, r.passed)
        for r in dq.audit(
            [
                dq.unique_key(child, ["k"]),          # k=1 twice -> 1 extra
                dq.not_null(child, "v"),              # one null
                dq.in_range(child, "v", 0.0, 100.0),  # -1 and 200 out
                dq.accepted_values(child, "cat", ["a", "b"]),  # zz bad
                dq.foreign_key(child, "k", parent, "pk"),      # k=9 orphan
            ]
        ).collect()
    }
    assert result["unique:k"] == (4, 1, False)
    assert result["not_null:v"] == (4, 1, False)
    assert result["range:v"] == (4, 2, False)
    assert result["accepted:cat"] == (4, 1, False)
    assert result["fk:k->pk"] == (4, 1, False)


def test_clean_data_passes_all(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    out = dq.audit(
        [
            dq.unique_key(df, ["k"]),
            dq.not_null(df, "v"),
            dq.in_range(df, "v", 0.0, 10.0),
            dq.foreign_key(df, "k", parent, "pk"),
        ]
    ).collect()
    assert all(r.passed and r.n_violations == 0 for r in out)
    assert [r.check for r in out] == sorted(r.check for r in out)


def test_fk_ignores_null_child_keys(spark):
    child = spark.createDataFrame([(None,), (1,)], "k long")
    parent = spark.createDataFrame([(1,)], "pk long")
    r = dq.foreign_key(child, "k", parent, "pk").collect()[0]
    assert (r.n_checked, r.n_violations) == (2, 0)


def test_empty_frame_all_checks_pass(spark):
    """Zero rows = zero violations = passed (not NULL): SUM over an empty
    frame is NULL and must be coalesced."""
    df = spark.createDataFrame([], "k long, v double, cat string")
    parent = spark.createDataFrame([(1,)], "pk long")
    out = dq.audit(
        [
            dq.unique_key(df, ["k"]),
            dq.not_null(df, "v"),
            dq.in_range(df, "v", 0.0, 10.0),
            dq.accepted_values(df, "cat", ["a"]),
            dq.foreign_key(df, "k", parent, "pk"),
        ]
    ).collect()
    assert all(r.passed is True for r in out)
    assert all((r.n_checked, r.n_violations) == (0, 0) for r in out)


def test_unique_key_null_keys_are_violations(spark):
    """count(*) - count(DISTINCT k) semantics: every NULL-key row is a
    violation (matches the DuckDB oracle's formulation)."""
    df = spark.createDataFrame([(None,), (None,), (1,), (2,)], "k long")
    r = dq.audit([dq.unique_key(df, ["k"])]).collect()[0]
    assert (r.n_checked, r.n_violations, r.passed) == (4, 2, False)


def test_column_profile_counts_nulls_and_numerics(spark):
    from data_pipeline_zeal_spark.operators import quality

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 4.5), (4, "b", 2.0)],
        "id long, cat string, x double",
    )
    out = {r.col_name: r for r in quality.column_profile(df, ["cat", "x"]).collect()}
    assert (out["cat"].n_rows, out["cat"].n_null, out["cat"].n_distinct) == (4, 1, 2)
    assert out["cat"].min_value is None  # non-numeric: no range
    assert out["x"].null_rate == 0.25
    assert (out["x"].min_value, out["x"].max_value) == (1.5, 4.5)


def test_profile_drift_flags(spark):
    from data_pipeline_zeal_spark.operators import quality

    before = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(10)], "id long, cat string, x double"
    )
    # after: nulls appear in x (rate 0.5 > 0.05) and cat cardinality
    # triples (ratio 3 > 2); id stays stable
    after = spark.createDataFrame(
        [(i, "abc"[i % 3], float(i) if i % 2 else None) for i in range(10)],
        "id long, cat string, x double",
    )
    out = {
        r.col_name: r
        for r in quality.profile_drift(before, after, ["id", "cat", "x"]).collect()
    }
    assert out["id"].drifted == 0
    assert out["cat"].drifted == 1 and out["cat"].distinct_ratio == 3.0
    assert out["x"].drifted == 1 and out["x"].null_rate_delta == 0.5


def test_profile_approx_mode_has_no_expand(spark):
    from data_pipeline_zeal_spark import plans
    from data_pipeline_zeal_spark.operators import quality

    df = spark.createDataFrame(
        [(1, "a", 1.0)], "id long, cat string, x double"
    )
    exact = plans.explain_mode(
        quality.column_profile(df, ["id", "cat", "x"], method="exact"), "simple"
    )
    approx = plans.explain_mode(
        quality.column_profile(df, ["id", "cat", "x"], method="approx"), "simple"
    )
    # k exact distincts force Catalyst's Expand (k copies of the scan's
    # rows through the shuffle); the HLL path must stay single-pass
    assert "Expand" in exact
    assert "Expand" not in approx


def test_profile_drift_identical_all_null_column_not_flagged(spark):
    from data_pipeline_zeal_spark.operators import quality

    df = spark.createDataFrame(
        [(1, None), (2, None)], "id long, x double"
    )
    out = {
        r.col_name: r
        for r in quality.profile_drift(df, df, ["id", "x"]).collect()
    }
    # bit-identical snapshots: nothing drifts, even the all-NULL column
    # whose 0/0 distinct ratio used to trip the low-side threshold
    assert out["x"].n_distinct_before == 0 and out["x"].drifted == 0
    assert out["id"].drifted == 0


def test_duplicated_spans_hand_computed(spark):
    from data_pipeline_zeal_spark.operators import text

    # n=3 windows; doc 1 repeats "a b c" internally, doc 2 shares it,
    # doc 3 is unique, doc 4 is shorter than the window
    docs = spark.createDataFrame(
        [
            (1, "a b c d a b c"),   # windows: abc bcd cda dab abc
            (2, "x a b c y"),       # windows: xab abc bcy
            (3, "p q r s"),         # windows: pqr qrs
            (4, "t u"),             # too short: no windows
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.duplicated_spans(docs, n=3).collect()}
    assert (out[1].n_windows, out[1].n_dup_windows) == (5, 2)  # both "a b c"
    assert (out[2].n_windows, out[2].n_dup_windows) == (3, 1)
    assert (out[3].n_windows, out[3].n_dup_windows) == (2, 0)
    assert (out[4].n_windows, out[4].n_dup_windows, out[4].dup_span_frac) == (
        0, 0, 0.0,
    )
    assert out[1].dup_span_frac == 0.4


def test_gopher_flags_rule_boundaries(spark):
    from data_pipeline_zeal_spark.operators import text

    fifty = " ".join(["the", "cat", "sat", "with", "dogs"] * 10)  # 50 words
    out = {
        r.doc_id: r
        for r in text.gopher_flags(
            spark.createDataFrame(
                [
                    (1, fifty),                       # passes everything
                    (2, "short text only"),           # fails word count
                    (3, " ".join(["####"] * 60)),     # symbolic, no alpha/stops
                ],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert out[1].passes_gopher == 1 and out[1].n_words == 50
    assert out[2].word_count_ok == 0 and out[2].passes_gopher == 0
    r3 = out[3]
    assert (r3.symbol_ratio_ok, r3.alpha_word_ok, r3.stopwords_ok) == (0, 0, 0)
    # mean word length 4.0 is inside the band even for the junk doc
    assert r3.mean_word_len_ok == 1


def test_bpe_token_estimate_hand_computed(spark):
    from data_pipeline_zeal_spark.operators import text

    out = {
        r.doc_id: r
        for r in text.bpe_token_estimate(
            spark.createDataFrame(
                [
                    (1, "hello world"),        # 2 pretokens, 5 chars each -> 2+2
                    (2, "it's extraordinary"), # it / 's / extraordinary(13->4)
                    (3, "a b2 #!"),            # letter, digit-mix, symbols
                    (4, ""),                   # empty
                ],
                "doc_id long, text string",
            )
        ).collect()
    }
    r1 = out[1]
    assert (r1.n_ws_tokens, r1.n_pretokens, r1.est_bpe_tokens) == (2, 2, 4)
    r2 = out[2]
    # pretokens: "it", "'s", " extraordinary" -> 1 + 1 + ceil(13/4)=4 -> 6
    assert (r2.n_pretokens, r2.est_bpe_tokens) == (3, 6)
    r3 = out[3]
    # "a", " b", "2", " #!" -> 4 pretokens, each <=4 chars -> 4 est
    assert (r3.n_pretokens, r3.est_bpe_tokens) == (4, 4)
    assert (out[4].n_pretokens, out[4].est_bpe_tokens, out[4].bpe_per_word) == (
        0, 0, 0.0,
    )


def test_bigram_logprob_closed_form(spark):
    """Two-doc corpus small enough to hand-compute the smoothed bigram
    probabilities: doc 1 = 'a b a b', doc 2 = 'a b'."""
    import math

    from data_pipeline_zeal_spark.operators import text

    out = {
        r.doc_id: r
        for r in text.bigram_logprob(
            spark.createDataFrame(
                [(1, "a b a b"), (2, "a b"), (3, "solo")],
                "doc_id long, text string",
            ),
            alpha=0.5,
        ).collect()
    }
    # corpus: C(a)=3, C(b)=3, C(solo)=1, V=3
    # C(a,b)=3, C(b,a)=1
    p_ab = (3 + 0.5) / (3 + 0.5 * 3)  # 3.5/4.5
    p_ba = (1 + 0.5) / (3 + 0.5 * 3)  # 1.5/4.5
    exp1 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    assert out[1].n_bigrams == 3
    assert abs(out[1].bits_per_bigram - round(exp1, 6)) < 1e-6
    assert out[2].n_bigrams == 1
    assert abs(out[2].bits_per_bigram - round(-math.log2(p_ab), 6)) < 1e-6
    assert 3 not in out  # single-token doc has no bigram


def test_bigram_logprob_prehash_matches_exact(spark):
    """The 8-byte-key scale path must reproduce the exact-string scores
    on a collision-free fixture."""
    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators import text
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    exact = {
        r.doc_id: (r.n_bigrams, r.bits_per_bigram)
        for r in text.bigram_logprob(docs).collect()
    }
    hashed = {
        r.doc_id: (r.n_bigrams, r.bits_per_bigram)
        for r in text.bigram_logprob(docs, prehash=True).collect()
    }
    assert exact == hashed


def test_functional_dependency_check(spark):
    """FD violations = determinant keys with >1 distinct non-null
    dependent; NULL determinant tuples are excluded from checked keys."""
    from data_pipeline_zeal_spark.operators import quality as dq

    df = spark.createDataFrame(
        [
            ("a", 1), ("a", 1),          # consistent key
            ("b", 1), ("b", 2),          # violating key
            ("c", None),                 # single NULL dependent: no violation
            (None, 9),                   # NULL determinant: excluded
        ],
        "k string, v int",
    )
    row = dq.functional_dependency(df, ["k"], "v").collect()[0]
    assert row.check == "fd:k->v"
    assert row.n_checked == 3       # a, b, c — NULL key excluded
    assert row.n_violations == 1    # only b
    # empty frame: 0 checked, 0 violations (coalesced, not NULL)
    empty = dq.functional_dependency(
        spark.createDataFrame([], "k string, v int"), ["k"], "v"
    ).collect()[0]
    assert (empty.n_checked, empty.n_violations) == (0, 0)


def test_k_anonymity_classes(spark):
    """Class sizes and the k floor on a closed-form frame; NULL quasi
    values form their own (attackable) class; empty quasi list raises."""
    import pytest

    from data_pipeline_zeal_spark.operators import quality as dq

    df = spark.createDataFrame(
        [("us", "a"), ("us", "a"), ("us", "a"), ("us", "b"),
         ("de", "a"), (None, "a")],
        "country string, segment string",
    )
    rows = {
        (r.country, r.segment): (r.group_size, r.violates)
        for r in dq.k_anonymity(df, ["country", "segment"], k=2).collect()
    }
    assert rows[("us", "a")] == (3, 0)
    assert rows[("us", "b")] == (1, 1)
    assert rows[("de", "a")] == (1, 1)
    assert rows[(None, "a")] == (1, 1)  # NULL is a joinable signature
    with pytest.raises(ValueError):
        dq.k_anonymity(df, [], k=2)


def test_l_diversity_homogeneity_attack(spark):
    """A class can pass the k floor yet violate l-diversity when every
    member shares one sensitive value; NULL sensitives don't count as
    diversity; empty quasi list raises."""
    import pytest

    from data_pipeline_zeal_spark.operators import quality as dq

    df = spark.createDataFrame(
        [
            ("us", "flu"), ("us", "flu"), ("us", "flu"),  # homogeneous
            ("de", "flu"), ("de", "cold"),                # diverse
            ("fr", None), ("fr", None),                   # all-NULL
        ],
        "country string, diagnosis string",
    )
    rows = {
        r.country: (r.group_size, r.distinct_sensitive, r.violates)
        for r in dq.l_diversity(
            df, ["country"], "diagnosis", l=2
        ).collect()
    }
    assert rows["us"] == (3, 1, 1)  # k=3 but homogeneous: the attack
    assert rows["de"] == (2, 2, 0)
    assert rows["fr"] == (2, 0, 1)  # NULLs carry no diversity
    with pytest.raises(ValueError):
        dq.l_diversity(df, [], "diagnosis", l=2)


def test_quality_classifier_learns_separable_task(spark):
    """On a task with disjoint vocabularies the trained filter must be
    near-perfect — the semantic gate for the trainer (the fixture's
    en-vs-rest labels have a measured naive-Bayes ceiling of only ~0.62,
    so fixture accuracy cannot gate learning)."""
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.operators import text

    rows = []
    for i in range(400):
        good = i % 2 == 0
        words = (
            ["alpha", "beta", "gamma", "delta"]
            if good
            else ["omega", "sigma", "theta", "kappa"]
        )
        txt = " ".join(words[j % 4] for j in range(i % 7 + 3))
        rows.append((i, txt, "en" if good else "xx", "s", len(txt)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    w, b = text.train_quality_classifier(docs, F.col("lang") == "en")
    scored = {r.doc_id: r.keep for r in
              text.quality_classifier_scores(docs, w, b).collect()}
    acc = sum(1 for i in range(400) if scored[i] == (1 if i % 2 == 0 else 0)) / 400
    assert acc >= 0.95, acc
    # determinism: bounded hash-ordered sample, zero-init full-batch GD
    assert (w, b) == text.train_quality_classifier(docs, F.col("lang") == "en")


def test_classifier_eval_distributed_laws(spark):
    """The registered confusion-row evaluation of the distributed
    classifier trainer (r10): counts partition the corpus, the accuracy
    column is exactly (tp+tn)/n, and accuracy never drops below the
    majority baseline (the fixture's honest gate — its en-vs-rest labels
    sit AT the naive-Bayes ceiling, so majority IS the expected optimum;
    the separable-task test above carries the 'it learns' claim)."""
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators import text

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # the REGISTERED parameters: the majority-floor law is a convergence
    # property (mid-descent iterates can sit on the all-positive side of
    # the oscillation), so the gate must test the configuration the
    # driver actually runs
    row = text.quality_classifier_eval_distributed(
        docs, F.col("lang") == "en", iters=8, lr=50.0
    ).collect()[0]
    assert row.tp + row.fp + row.fn + row.tn == row.n_docs
    assert row.tp + row.fn == row.n_positive
    assert row.accuracy == round((row.tp + row.tn) / row.n_docs, 6)
    majority = max(row.n_positive, row.n_docs - row.n_positive) / row.n_docs
    assert row.accuracy >= round(majority, 6) - 1e-9


def test_quality_classifier_distributed_trainer_matches_driver(spark):
    """The distributed trainer (one broadcast-join + bounded-collect
    gradient step per iteration) must converge to the driver kernel's
    weights on the same sample with the same iteration count — the two
    computations differ only in float summation order, so parity is
    np.allclose at 1e-8, not bit equality.  Includes a zero-token doc
    (bias-gradient-only path) and runs the sample_size=None branch (the
    100 TB shape: no driver-side cap)."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.operators import text

    rows = []
    for i in range(120):
        good = i % 2 == 0
        words = (
            ["alpha", "beta", "gamma", "delta"]
            if good
            else ["omega", "sigma", "theta", "kappa"]
        )
        txt = " ".join(words[j % 4] for j in range(i % 7 + 3))
        rows.append((i, txt, "en" if good else "xx", "s", len(txt)))
    rows.append((120, "", "xx", "s", 0))  # zero-token doc
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    kw = dict(dim=512, iters=25, lr=1.0, l2=1e-3)
    w_drv, b_drv = text.train_quality_classifier(
        docs, F.col("lang") == "en", sample_size=121, **kw
    )
    w_dst, b_dst = text.train_quality_classifier_distributed(
        docs, F.col("lang") == "en", sample_size=None, **kw
    )
    assert set(w_drv) == set(w_dst)
    wd = np.array([w_drv[k] for k in sorted(w_drv)])
    ws = np.array([w_dst[k] for k in sorted(w_drv)])
    assert np.allclose(wd, ws, atol=1e-8), np.abs(wd - ws).max()
    assert abs(b_drv - b_dst) < 1e-8


def test_quality_classifier_fixture_hits_bayes_ceiling(spark):
    """On the real fixture the en-vs-rest unigram distributions overlap
    heavily; the gate is honest: beat the base rate and land within 5
    points of the naive-Bayes train ceiling computed from the same
    data."""
    import re
    from collections import Counter

    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.io import load_table
    from data_pipeline_zeal_spark.operators import text

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = docs.select("doc_id", "text", "lang").collect()
    y = {r.doc_id: int(r.lang == "en") for r in rows}
    base = max(sum(y.values()), len(y) - sum(y.values())) / len(y)

    # naive-Bayes multinomial ceiling on the same documents
    ce = Counter(); cr = Counter()
    for r in rows:
        toks = re.split(r"\s+", r.text.strip()) if r.text.strip() else []
        (ce if y[r.doc_id] else cr).update(toks)
    vocab = set(ce) | set(cr)
    te, tr = sum(ce.values()) + len(vocab), sum(cr.values()) + len(vocab)
    prior = np.log(sum(y.values()) / (len(y) - sum(y.values())))
    nb_hits = 0
    for r in rows:
        toks = re.split(r"\s+", r.text.strip()) if r.text.strip() else []
        s = prior + sum(
            np.log((ce[t] + 1) / te) - np.log((cr[t] + 1) / tr) for t in toks
        )
        nb_hits += int((s > 0) == bool(y[r.doc_id]))
    ceiling = nb_hits / len(y)

    w, b = text.train_quality_classifier(docs, F.col("lang") == "en")
    scored = {r.doc_id: r.keep for r in
              text.quality_classifier_scores(docs, w, b).collect()}
    acc = sum(1 for d, k in scored.items() if k == y[d]) / len(y)
    # the sf0.001 slice's ceiling EQUALS its base rate (0.614): a linear
    # model cannot beat majority voting here, so the honest gates are
    # "never worse than majority" + "within 5 points of the ceiling"
    assert acc >= base, (acc, base)
    assert acc >= ceiling - 0.05, (acc, ceiling)


def test_quality_classifier_zero_token_doc_scores_bias(spark):
    import math

    from pyspark.sql import functions as F

    from data_pipeline_zeal_spark.operators import text

    docs = spark.createDataFrame(
        [(0, "alpha beta", "en", "s", 10), (1, "   ", "xx", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    w, b = text.train_quality_classifier(docs, F.col("lang") == "en")
    got = {r.doc_id: r.quality_prob for r in
           text.quality_classifier_scores(docs, w, b).collect()}
    assert got[1] == round(1.0 / (1.0 + math.exp(-b)), 6)
