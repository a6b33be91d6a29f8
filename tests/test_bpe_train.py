"""The distributed BPE merge trainer must reproduce the classic in-memory
reference algorithm (Sennrich et al. 2016) exactly — same pair counts,
same lexicographic tie-breaks, same greedy left-to-right merge
application — on corpora small enough to run both.
"""

from __future__ import annotations

from collections import Counter

from data_pipeline_zeal_spark.io import load_table
from data_pipeline_zeal_spark.operators import text as text_ops

SF_SMALL = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """15-line textbook BPE trainer: the ground truth."""
    vocab = {tuple(w): c for w, c in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        # max count, ties broken lexicographically (smallest pair wins)
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1], pairs[best]))
        a, b = best
        new_vocab = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _spark_merges(spark, rows, n_merges):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return [
        (r.merge_rank, r.left, r.right, r.pair_count)
        for r in text_ops.bpe_train_merges(docs, n_merges=n_merges).collect()
    ]


def test_bpe_matches_reference_on_classic_corpus(spark):
    rows = [
        (1, "low low low low low"),
        (2, "lower lower"),
        (3, "newest newest newest newest newest newest"),
        (4, "widest widest widest"),
    ]
    counts: Counter = Counter()
    for _, t in rows:
        counts.update(t.split())
    want = _reference_bpe(dict(counts), 8)
    got = _spark_merges(spark, rows, 8)
    assert got == want
    # sanity: the classic example's famous first merges appear
    assert ("e", "s") in {(m[1], m[2]) for m in want}


def test_bpe_matches_reference_on_fixture_sample(spark):
    """Real fixture text (first 40 docs at sf0.001): byte-identical merge
    table between the distributed trainer and the reference."""
    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(40)
    )
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    counts: Counter = Counter()
    for _, t in rows:
        counts.update(w for w in t.split() if len(w) <= 64)
    want = _reference_bpe(dict(counts), 6)
    got = _spark_merges(spark, rows, 6)
    assert got == want


def test_bpe_merge_is_greedy_left_to_right(spark):
    """aaaa with merge (a,a) must become [aa, aa], never overlap."""
    got = _spark_merges(spark, [(1, "aaaa aaaa aaaa")], 2)
    # round 1 merges (a,a) with count 9 (3 per word, left-to-right pairs);
    # round 2 merges (aa,aa)
    assert got[0][1:] == ("a", "a", 9)
    assert got[1][1:] == ("aa", "aa", 3)


def _reference_encode(word: str, merges: list[tuple[str, str]]) -> int:
    """Textbook BPE encoder: apply each merge in rank order with one
    greedy left-to-right pass; return the symbol count."""
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return len(sym)


def test_bpe_encode_matches_reference_on_classic_corpus(spark):
    """Train 6 merges on the Sennrich-style toy corpus, then encode it:
    every per-doc token count must equal the textbook encoder's."""
    import re

    rows = [
        (0, "low low low low low"),
        (1, "lower lower newest newest newest"),
        (2, "newest newest newest widest widest widest"),
        (3, "low lowest newest"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (a, b) for _, a, b, _ in _spark_merges(spark, rows, n_merges=6)
    ]
    got = {r.doc_id: r for r in
           text_ops.bpe_encode_lengths(docs, merges=merges).collect()}
    for doc_id, txt in rows:
        words = re.split(r"\s+", txt.strip()) if txt.strip() else []
        exp_tokens = sum(_reference_encode(w, merges) for w in words)
        exp_chars = sum(len(w) for w in words)
        assert got[doc_id].n_words == len(words)
        assert got[doc_id].n_chars == exp_chars
        assert got[doc_id].n_bpe_tokens == exp_tokens, (doc_id, txt)
        if exp_tokens:
            assert got[doc_id].chars_per_token == round(
                exp_chars / exp_tokens, 6
            )
        else:
            assert got[doc_id].chars_per_token is None


def test_bpe_encode_matches_reference_on_fixture(spark):
    """Self-contained form (trains its own merges) against a full pure-
    Python recompute of the sf0.001 fixture — exact ground truth for
    train + encode composed."""
    import re

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = [(r.doc_id, r.text) for r in
            docs.select("doc_id", "text").collect()]
    wc: Counter = Counter()
    for _, t in rows:
        for w in re.split(r"\s+", t.strip()) if t.strip() else []:
            if 0 < len(w) <= 64:
                wc[w] += 1
    merges = [(a, b) for _, a, b, _ in _reference_bpe(wc, 10)]
    got = {r.doc_id: r.n_bpe_tokens for r in
           text_ops.bpe_encode_lengths(docs, n_merges=10).collect()}
    for doc_id, t in rows:
        words = re.split(r"\s+", t.strip()) if t.strip() else []
        exp = sum(
            len(w) if len(w) > 64 else _reference_encode(w, merges)
            for w in words
        )
        assert got[doc_id] == exp, doc_id


def test_bpe_encode_long_word_bypass(spark):
    """Words above max_word_len skip the fold and count as raw chars —
    the O(len^2) fold guard.  Both encoders honor it."""
    long_word = "a" * 100
    docs = spark.createDataFrame(
        [(0, "aa aa aa " + long_word)], "doc_id long, text string"
    )
    for encoder in ("expr", "arrow"):
        got = text_ops.bpe_encode_lengths(
            docs, merges=[("a", "a")], max_word_len=64, encoder=encoder
        ).collect()[0]
        # three "aa" words encode to 1 symbol each; the long word is 100
        assert got.n_bpe_tokens == 3 + 100, encoder
        assert got.n_chars == 6 + 100, encoder


def test_bpe_encoder_auto_dispatch():
    """auto = expr while the chain is shallow, arrow past the depth cap."""
    cap = text_ops._BPE_EXPR_CHAIN_MAX
    assert text_ops._select_bpe_encoder(0) == "expr"
    assert text_ops._select_bpe_encoder(cap) == "expr"
    assert text_ops._select_bpe_encoder(cap + 1) == "arrow"
    assert text_ops._select_bpe_encoder(32000) == "arrow"


def test_bpe_encode_arrow_matches_expr_on_fixture(spark):
    """The Arrow kernel and the expression chain must agree row-for-row
    on real fixture text with the trained table (the registered-query
    shape, n_merges=10)."""
    docs = load_table(spark, SF_SMALL, "documents")
    merges = [
        (r["left"], r["right"])
        for r in text_ops.bpe_train_merges(docs, n_merges=10).collect()
    ]
    want = {
        r.doc_id: (r.n_words, r.n_chars, r.n_bpe_tokens, r.chars_per_token)
        for r in text_ops.bpe_encode_lengths(
            docs, merges=merges, encoder="expr"
        ).collect()
    }
    got = {
        r.doc_id: (r.n_words, r.n_chars, r.n_bpe_tokens, r.chars_per_token)
        for r in text_ops.bpe_encode_lengths(
            docs, merges=merges, encoder="arrow"
        ).collect()
    }
    assert got == want


def _synthetic_rank_consistent_merges(n: int) -> list[tuple[str, str]]:
    """Train a >=n-merge rank-consistent table in pure Python over a
    deterministic synthetic vocab (varied bigrams so training never runs
    dry) — the cheap way to get tokenizer-depth tables in a test."""
    import random

    rng = random.Random(20260815)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    wc = {
        "".join(rng.choice(alphabet) for _ in range(rng.randint(4, 20))):
        rng.randint(1, 50)
        for _ in range(4000)
    }
    merges = [(a, b) for _, a, b, _ in _reference_bpe(wc, n)]
    assert len(merges) == n, "synthetic corpus ran dry"
    return merges


def test_bpe_min_rank_loop_equals_rank_order_hypothesis():
    """The Arrow kernel's equivalence LAW, fuzzed without Spark: for any
    rank-consistent merge table (i.e. one produced by training) and any
    word — including words with characters training never saw — the
    min-rank-pair loop must equal applying every merge in rank order
    with one greedy left-to-right pass each.  Rank-consistency is what
    makes them equal: a merge only creates adjacencies involving its own
    output symbol, whose consuming merges are later-ranked."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_pipeline_zeal_spark.operators.text import _bpe_encode_word_len

    alphabet = "abcd"
    words_strategy = st.text(alphabet=alphabet + "xyz", min_size=0, max_size=24)

    @settings(max_examples=200, deadline=None)
    @given(
        corpus=st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=10),
            min_size=1,
            max_size=30,
        ),
        n_merges=st.integers(min_value=1, max_value=25),
        words=st.lists(words_strategy, min_size=1, max_size=10),
    )
    def law(corpus, n_merges, words):
        wc = Counter(corpus)
        merges = [(a, b) for _, a, b, _ in _reference_bpe(dict(wc), n_merges)]
        ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
        for w in words:
            assert _bpe_encode_word_len(w, ranks, 64) == _reference_encode(
                w, merges
            ), (w, merges)

    law()


def test_bpe_encode_arrow_at_tokenizer_depth(spark):
    """The weak-mark fix: a 1000-merge table must encode through the
    Arrow kernel (auto-dispatch), match the textbook encoder exactly,
    and must NOT build the nested expression chain — pinned by the plan
    carrying ArrowEvalPython and zero higher-order `aggregate` folds."""
    merges = _synthetic_rank_consistent_merges(1000)
    rows = [
        (0, "low lower lowest"),
        (1, "abc0 xyz9 qqqq"),
        (2, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.bpe_encode_lengths(docs, merges=merges)  # auto->arrow
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "aggregate(" not in plan  # no chain fold was built
    got = {r.doc_id: r.n_bpe_tokens for r in out.collect()}
    import re

    for doc_id, txt in rows:
        words = re.split(r"\s+", txt.strip()) if txt.strip() else []
        exp = sum(_reference_encode(w, merges) for w in words)
        assert got[doc_id] == exp, (doc_id, txt)


def test_bpe_inmem_trainer_matches_distributed(spark):
    """r11: the in-memory trainer (word-count stage + lazy-deletion-heap
    merge loop) must produce the IDENTICAL merge table — ranks, pairs,
    counts — as the distributed per-round loop on the same corpus: same
    weighting, same greedy application, same (count desc, pair asc)
    tie-break."""
    docs = load_table(spark, SF_SMALL, "documents")
    dist = [
        (r.left, r.right, r.pair_count)
        for r in text_ops.bpe_train_merges(docs, n_merges=10).collect()
    ]
    inmem = text_ops.bpe_train_merges_inmem(docs, n_merges=10)
    assert inmem == dist and len(inmem) == 10


def test_bpe_inmem_trainer_saturates_cleanly(spark):
    """Training past pair exhaustion stops at the corpus's natural depth
    (89 merges on the fixture vocabulary) instead of looping or
    emitting zero-count merges."""
    docs = load_table(spark, SF_SMALL, "documents")
    m = text_ops.bpe_train_merges_inmem(docs, n_merges=512)
    assert 16 < len(m) < 512
    assert all(n > 0 for _, _, n in m)
    # ranks are well-ordered: a merge's inputs exist when it runs (the
    # rank-consistency the encoder's equivalence law depends on)
    enc = text_ops.bpe_encode_lengths(
        docs, merges=[(a, b) for a, b, _ in m], encoder="arrow"
    )
    assert enc.count() == docs.count()


def test_registered_deep_row_dispatches_arrow(spark):
    """r10 directive #3 structural pin: the registered
    text_bpe_encode_deep shape (48 inmem-trained merges, encoder=auto)
    must route to the Arrow pandas_udf kernel — plan carries
    ArrowEvalPython and builds NO nested expression-chain fold."""
    docs = load_table(spark, SF_SMALL, "documents")
    trained = text_ops.bpe_train_merges_inmem(docs, n_merges=48)
    assert len(trained) == 48  # deep: 3x past the expr-chain cap
    out = text_ops.bpe_encode_lengths(
        docs, merges=[(a, b) for a, b, _ in trained], encoder="auto"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "aggregate(" not in plan
