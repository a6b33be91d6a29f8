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
