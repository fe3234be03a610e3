"""BPE trainer/encoder contracts: merge-list parity with an independent
reference implementation (the naive recount-every-round form of the
Sennrich algorithm, written separately from the operator's
incremental-update form), encode round-trip, determinism, compression
monotonicity, and the scan-local plan shape."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pgdedupe_spark.operators.bpe import (
    _EOW,
    bpe_encode,
    bpe_vocab,
    train_bpe,
    word_frequencies,
)

TEXTS = [
    "the lowest low lower than the newest widest low",
    "newer and newest words widen the widest low estimates",
    "lower lowest newest newest low low low widest",
    "esteemed estimates widen lower and lower still",
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Naive reference: recount ALL pairs from scratch every round, merge
    the (count-max, lexicographically-smallest) pair. O(rounds × corpus),
    deliberately simple — the oracle for the operator's incremental
    bookkeeping."""
    vocab = {tuple(w) + (_EOW,): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, f in vocab.items():
            for i in range(len(w) - 1):
                pairs[(w[i], w[i + 1])] += f
        if not pairs:
            break
        best = min(pairs, key=lambda p: (-pairs[p], p))
        merges.append(best)
        new_vocab = {}
        for w, f in vocab.items():
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and (w[i], w[i + 1]) == best:
                    out.append(w[i] + w[i + 1])
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            new_vocab[nw] = new_vocab.get(nw, 0) + f
        vocab = new_vocab
    return merges


def _reference_word_freqs():
    c = Counter()
    for t in TEXTS:
        c.update(re.findall("[a-z0-9]+", t.lower()))
    return dict(c)


def test_word_frequencies_match_local(spark, corpus):
    got = {r.word: r.freq for r in word_frequencies(corpus, "text").collect()}
    assert got == _reference_word_freqs()


def test_train_bpe_matches_reference_merge_sequence(spark, corpus):
    """The incremental trainer must produce the EXACT merge sequence of
    the naive reference (same ties, same order) — any drift in the
    pair-count bookkeeping shows up as a diverging merge list."""
    merges = train_bpe(corpus, "text", n_merges=40)
    want = _reference_bpe(_reference_word_freqs(), 40)
    assert merges == want
    assert len(merges) == 40
    assert bpe_vocab(merges) == [a + b for a, b in merges]


def test_train_bpe_exhausts_gracefully(spark, corpus):
    """Asking for more merges than the corpus supports stops when no
    positive-count pair remains instead of looping or emitting junk."""
    merges = train_bpe(corpus, "text", n_merges=10_000)
    assert len(merges) < 10_000
    # fully merged: every word is now a single symbol, so re-running the
    # reference at that length agrees
    assert merges == _reference_bpe(_reference_word_freqs(), len(merges))


def test_bpe_encode_roundtrip_and_parity(spark, corpus):
    """Distributed encode == driver-side greedy encode per word, and
    stripping the end-of-word marker reconstructs the original words in
    order (lossless segmentation)."""
    merges = train_bpe(corpus, "text", n_merges=25)
    out = {r.doc_id: list(r.tokens) for r in bpe_encode(corpus, "doc_id", "text", merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}

    from pgdedupe_spark.operators.bpe import _encode_word

    for i, text in enumerate(TEXTS):
        words = re.findall("[a-z0-9]+", text.lower())
        want = [t for w in words for t in _encode_word(w, ranks)]
        assert out[i] == want, i
        joined = "".join(out[i]).replace(_EOW, " ").split()
        assert joined == words, i


def test_bpe_encode_deterministic_and_partition_independent(spark, corpus):
    merges = train_bpe(corpus, "text", n_merges=25)
    a = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tokens)
        for r in bpe_encode(corpus, "doc_id", "text", merges).collect()
    )
    b = sorted(
        (r.doc_id, tuple(r.tokens), r.n_tokens)
        for r in bpe_encode(corpus.repartition(7), "doc_id", "text", merges).collect()
    )
    assert a == b


def test_bpe_compression_monotone(spark, corpus):
    """More merges can never token-lengthen a corpus: n_tokens is
    non-increasing in the merge count (each merge only ever replaces two
    adjacent symbols with one)."""
    sizes = []
    for n in (0, 5, 20, 60):
        merges = train_bpe(corpus, "text", n_merges=n)
        total = bpe_encode(corpus, "doc_id", "text", merges).agg(
            F.sum("n_tokens")
        ).collect()[0][0]
        sizes.append(total)
    assert sizes == sorted(sizes, reverse=True), sizes
    assert sizes[-1] < sizes[0]


def test_bpe_encode_plan_is_scan_local(spark, corpus):
    """The 100 TB property: encoding is one mapInPandas projection over
    the scan — no Exchange anywhere in the plan."""
    merges = train_bpe(corpus, "text", n_merges=10)
    plan = (
        bpe_encode(corpus, "doc_id", "text", merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_bpe_save_load_roundtrip(spark, corpus, tmp_path):
    from pgdedupe_spark.operators.bpe import load_bpe, save_bpe

    merges = train_bpe(corpus, "text", n_merges=15)
    p = str(tmp_path / "bpe.json")
    save_bpe(merges, p)
    assert load_bpe(p) == merges
