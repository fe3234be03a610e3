"""Unigram-LM (SentencePiece-style) tokenizer: trainer + Viterbi encode
(operators/unigram.py, new r11 — the BPE sibling, VERDICT r10 #7).
Parity is pinned against an independently written brute-force segmenter
(every segmentation enumerated), the same strategy test_bpe.py uses."""

from __future__ import annotations

import itertools

from pgdedupe_spark.operators.unigram import (
    _UNK_LOGP,
    _viterbi,
    load_unigram,
    save_unigram,
    train_unigram,
    unigram_encode,
)


def _brute_force_segment(word: str, logp: dict) -> list[str]:
    """Independent reference: enumerate EVERY segmentation via cut-point
    subsets, score it (unknown single chars at the floor, unknown longer
    pieces illegal), pick max score, then fewest pieces, then the
    lexicographically smallest sequence."""
    n = len(word)
    best = None
    for mask in range(2 ** (n - 1)) if n > 1 else [0]:
        cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
        pieces = [word[a:b] for a, b in itertools.pairwise(cuts)]
        score = 0.0
        ok = True
        for p in pieces:
            if p in logp:
                score += logp[p]
            elif len(p) == 1:
                score += _UNK_LOGP
            else:
                ok = False
                break
        if not ok:
            continue
        cand = (-score, len(pieces), pieces)
        if best is None or cand < best:
            best = cand
    assert best is not None
    return best[2]


def test_viterbi_matches_brute_force_on_random_vocabs():
    import random

    rng = random.Random(11)
    alphabet = "abcd"
    for trial in range(40):
        # random vocab over a tiny alphabet, random log-probs
        pieces = {"a", "b", "c", "d"}
        for _ in range(rng.randint(2, 10)):
            ln = rng.randint(2, 4)
            pieces.add("".join(rng.choice(alphabet) for _ in range(ln)))
        logp = {p: -rng.uniform(0.5, 8.0) for p in pieces}
        word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 9)))
        got = _viterbi(word, logp, max_len=max(map(len, logp)))
        want = _brute_force_segment(word, logp)
        assert got == want, (trial, word, got, want)
        assert "".join(got) == word


def test_viterbi_unknown_chars_fall_back_to_char_pieces():
    logp = {"a": -1.0, "ab": -0.5}
    assert _viterbi("abz", logp, 2) == ["ab", "z"]
    assert _viterbi("zzz", logp, 2) == ["z", "z", "z"]


def test_train_learns_frequent_words_as_single_pieces(spark):
    rows = [(i, "international trade flows through international ports") for i in range(30)]
    rows += [(100 + i, "xq zv jk wp") for i in range(2)]  # rare noise
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_unigram(df, "text", vocab_size=60, max_piece_len=13)
    vocab = dict(model)
    assert "international" in vocab  # dominant word survives whole
    # single-char coverage floor is never pruned
    corpus_chars = set("internationaltradeflowsthroughportsxqzvjkwp")
    assert corpus_chars <= {p for p in vocab if len(p) == 1} | {
        p for p in vocab
    }
    enc = unigram_encode(df, "doc_id", "text", model)
    out = {r.doc_id: r for r in enc.collect()}
    assert out[0].tokens[0] == "international"
    assert out[0].n_tokens == len(out[0].tokens)
    # lossless: concatenation restores the word stream
    assert "".join(out[0].tokens) == "internationaltradeflowsthroughinternationalports"


def test_train_is_deterministic_and_bounded(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = train_unigram(df, "text", vocab_size=120)
    m2 = train_unigram(df, "text", vocab_size=120)
    assert m1 == m2  # bit-identical across runs
    n_single = sum(1 for p, _ in m1 if len(p) == 1)
    assert len(m1) <= max(120, n_single)
    assert len(m1) > n_single  # learned some multi-char pieces


def test_save_load_bit_exact_and_encode_stable(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = train_unigram(df, "text", vocab_size=100)
    p = str(tmp_path / "unigram.json")
    save_unigram(model, p)
    assert load_unigram(p) == model
    a = sorted(map(tuple, unigram_encode(df, "doc_id", "text", model).collect()))
    b = sorted(
        map(tuple, unigram_encode(df, "doc_id", "text", load_unigram(p)).collect())
    )
    assert a == b


def test_encode_plan_is_exchange_free(spark):
    """The tokenization sweep must be a single projection-shaped pass —
    no Exchange anywhere in the encode plan (the 100 TB shape, same pin
    as the BPE probe)."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = [("a", -1.0), ("b", -1.5), ("ab", -0.7)]
    enc = unigram_encode(df, "doc_id", "text", model)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "ab")], "doc_id long, text string"
    )
    model = [("a", -1.0), ("b", -1.5), ("ab", -0.7)]
    out = {r.doc_id: r for r in unigram_encode(df, "doc_id", "text", model).collect()}
    assert list(out[1].tokens) == [] and out[1].n_tokens == 0
    assert list(out[2].tokens) == [] and out[2].n_tokens == 0
    assert list(out[3].tokens) == ["ab"]


def test_soft_em_fills_budget_better_than_hard(spark):
    """Hard (Viterbi) EM kills every piece the best segmentations skip,
    collapsing the vocabulary; the full forward-backward E-step keeps
    fractional mass on useful alternatives, so the learned vocabulary
    approaches the budget. Both remain deterministic."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    soft = train_unigram(df, "text", vocab_size=120, em="soft")
    hard = train_unigram(df, "text", vocab_size=120, em="hard")
    assert len(soft) > len(hard), (len(soft), len(hard))
    n_single = sum(1 for p, _ in soft if len(p) == 1)
    assert len(soft) <= max(120, n_single)
    assert soft == train_unigram(df, "text", vocab_size=120, em="soft")


def test_soft_em_likelihood_non_decreasing():
    """EM's defining guarantee on a fixed vocabulary: corpus
    log-likelihood never decreases across M-steps (no pruning between
    rounds here — pruning may legitimately lower it)."""
    import math

    from pgdedupe_spark.operators.unigram import _seed_vocab, _soft_counts

    words = [("banana", 5), ("bandana", 3), ("nab", 2), ("anna", 4)]
    logp = _seed_vocab(words, seed_size=40, max_piece_len=4)
    lls = []
    for _ in range(4):
        counts, ll = _soft_counts(words, logp, 4)
        lls.append(ll)
        total = sum(counts.values())
        logp = {p: math.log(c / total) for p, c in counts.items() if c > 0}
    for a, b in zip(lls, lls[1:]):
        assert b >= a - 1e-9, lls


def test_soft_counts_match_brute_force_expectations():
    """Independent reference for the E-step: enumerate every segmentation,
    weight by its probability, accumulate expected piece counts — must
    match the forward-backward computation to float precision."""
    import itertools
    import math

    from pgdedupe_spark.operators.unigram import _soft_counts

    logp = {"a": -1.0, "b": -2.0, "ab": -1.2, "ba": -1.8, "aba": -2.5}
    words = [("abab", 3), ("ba", 2)]

    def brute(word):
        n = len(word)
        segs = []
        for mask in range(2 ** (n - 1)) if n > 1 else [0]:
            cuts = [0] + [i + 1 for i in range(n - 1) if mask >> i & 1] + [n]
            pieces = [word[a:b] for a, b in itertools.pairwise(cuts)]
            if all(p in logp for p in pieces):
                segs.append((pieces, math.exp(sum(logp[p] for p in pieces))))
        z = sum(w for _, w in segs)
        exp_counts: dict[str, float] = {}
        for pieces, w in segs:
            for p in pieces:
                exp_counts[p] = exp_counts.get(p, 0.0) + w / z
        return exp_counts

    want: dict[str, float] = {}
    for word, f in words:
        for p, c in brute(word).items():
            want[p] = want.get(p, 0.0) + f * c
    got, _ = _soft_counts(words, logp, max_len=3)
    assert set(got) == set(want)
    for p in want:
        assert abs(got[p] - want[p]) < 1e-9, (p, got[p], want[p])


def test_distributed_estep_parity_and_train(spark):
    """VERDICT r11 #7: the distributed E-step (mapInPandas partials +
    sorted driver merge) must agree with the driver-side loop — hard-EM
    counts and the seed are integer-sum exact (bit-identical); soft-EM
    expectations to float tolerance; and a full distribute=True train
    learns the SAME vocabulary with allclose log-probs, bit-stable
    across runs."""
    import math

    from pyspark.sql import functions as F

    from pgdedupe_spark.operators.bpe import word_frequencies
    from pgdedupe_spark.operators.unigram import (
        _estep_distributed,
        _seed_vocab,
        _seed_vocab_distributed,
        _soft_counts,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wq = (
        word_frequencies(df, "text")
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(2000)
    )
    words = [(r.word, int(r.freq)) for r in wq.collect()]
    wdf = wq.select("word", "freq").repartition(32, "word").sortWithinPartitions("word")

    # seed: integer sums → bit-identical
    seed_d = _seed_vocab_distributed(wdf, seed_size=256, max_piece_len=8)
    seed_l = _seed_vocab(words, seed_size=256, max_piece_len=8)
    assert seed_d == seed_l

    # soft E-step: same support, expectations and LL to tolerance
    cd, lld = _estep_distributed(wdf, seed_l, 8, "soft")
    cl, lll = _soft_counts(words, seed_l, 8)
    assert set(cd) == set(cl)
    assert math.isclose(lld, lll, rel_tol=1e-9)
    for p in cl:
        assert math.isclose(cd[p], cl[p], rel_tol=1e-9, abs_tol=1e-12), p

    # hard E-step: integer-valued counts → exact
    hd, _ = _estep_distributed(wdf, seed_l, 8, "hard")
    hl: dict[str, float] = {}
    from pgdedupe_spark.operators.unigram import _viterbi as vit

    for w, f in words:
        for p in vit(w, seed_l, 8):
            hl[p] = hl.get(p, 0.0) + f
    assert hd == hl

    # end-to-end: same vocabulary, allclose probs, bit-stable reruns
    m_local = train_unigram(df, "text", vocab_size=120)
    m_dist = train_unigram(df, "text", vocab_size=120, distribute=True)
    m_dist2 = train_unigram(df, "text", vocab_size=120, distribute=True)
    assert m_dist == m_dist2
    assert [p for p, _ in m_dist] == [p for p, _ in m_local]
    for (p, a), (_, b) in zip(m_dist, m_local):
        assert math.isclose(a, b, rel_tol=1e-9), p
