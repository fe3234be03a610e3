"""Trainable unigram-LM (SentencePiece-style) tokenizer — the BPE
sibling (VERDICT r10 #7). Kudo 2018, "Subword Regularization: Improving
Neural Network Translation Models with Multiple Subword Candidates"
(public paper) arranged for Spark's execution model, mirroring
``operators/bpe.py``:

* **Training** runs on the *word-frequency table*, not the corpus: one
  distributed ``groupBy(word).count()`` (the only shuffle), then a
  bounded collect of the top ``max_words`` rows (freq desc, word asc —
  deterministic) feeds the driver-side EM + prune loop. Driver cost is
  O(em_iters × Σ|word|² ) over the bounded word set, independent of
  corpus row count — the same practical arrangement every production
  SentencePiece trainer uses (it too reduces to a word/sentence
  frequency table first).
* **EM** is the hard (Viterbi) variant: the E-step segments each word
  with the current piece log-probs and accumulates frequency-weighted
  piece counts; the M-step renormalizes. Pruning between rounds drops
  the lowest-count MULTI-char pieces (single characters are never
  pruned — they are the coverage floor, as in the paper §3.2) in
  ``prune_frac`` chunks until ``vocab_size`` remains. This is the
  count-based prune simplification of Kudo's likelihood-loss prune —
  documented, deterministic, and adequate for vocabulary learning; the
  exact-loss refinement changes which borderline pieces survive, not
  the algorithm's dataflow shape.
* **Encoding** is scan-local: ``mapInPandas`` with a per-batch
  word→tokens memo (Viterbi runs once per DISTINCT word per batch). No
  shuffle, no state — a single projection-shaped pass, which is what a
  100 TB tokenization sweep needs (pinned Exchange-free by the bench
  probe's plan shape, like ``bpe_encode_probe``).

Determinism: every tie breaks lexicographically (seed-piece selection:
count desc, piece asc; Viterbi: score, then FEWER pieces, then the
lexicographically smaller token sequence), so the same corpus always
yields the same vocabulary and the same encoding — pinned in
tests/test_unigram.py against an independently written reference
segmenter, plus the registry-wide determinism gate.

Word tokenization matches ``operators/text.py`` / ``operators/bpe.py``
(lower-cased ``[a-z0-9]+`` runs) so the tokenizer composes with the
rest of the text family. Model persistence uses canonical JSON with
``float.hex`` log-probs (the ml/persistence.py discipline) so a
saved/loaded model encodes bit-identically.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

from pgdedupe_spark.operators.bpe import word_frequencies

# log-prob floor for characters absent from the trained vocabulary
# (unseen at training time): worse than every real piece, so Viterbi
# uses real pieces whenever one covers the span, but coverage never
# fails. A constant (not data-dependent) keeps encode a pure function
# of (text, model).
_UNK_LOGP = -100.0


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize the
    summed log-prob; ties prefer FEWER pieces, then the lexicographically
    smaller token sequence (scanning candidate start positions in
    deterministic order makes the argmax stable). Characters not in the
    vocabulary fall back to single-char pieces at the _UNK_LOGP floor."""
    n = len(word)
    # dp[i] = (score, n_pieces, tokens_tuple) for word[:i]
    dp: list[tuple[float, int, tuple[str, ...]] | None] = [None] * (n + 1)
    dp[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        best: tuple[float, int, tuple[str, ...]] | None = None
        for j in range(max(0, i - max_len), i):
            prev = dp[j]
            if prev is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = _UNK_LOGP  # single-char coverage floor
            cand = (prev[0] + lp, prev[1] + 1, prev[2] + (piece,))
            if (
                best is None
                or cand[0] > best[0]
                or (cand[0] == best[0] and cand[1] < best[1])
                or (cand[0] == best[0] and cand[1] == best[1] and cand[2] < best[2])
            ):
                best = cand
        dp[i] = best
    assert dp[n] is not None  # single-char fallback guarantees coverage
    return list(dp[n][2])


def _seed_vocab(
    words: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Initial piece inventory: every substring of length ≤ max_piece_len
    counted with its word frequency; keep ALL single chars plus the top
    ``seed_size`` multi-char substrings (count desc, piece asc). Initial
    log-probs are the normalized substring counts."""
    counts: dict[str, int] = {}
    for w, f in words:
        n = len(w)
        for i in range(n):
            for l in range(1, min(max_piece_len, n - i) + 1):
                p = w[i : i + l]
                counts[p] = counts.get(p, 0) + f
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[:seed_size]
    kept = dict(chars)
    kept.update(dict(multi))
    total = sum(kept.values())
    return {p: math.log(c / total) for p, c in kept.items()}


def _logsumexp(vals: list[float]) -> float:
    if not vals:
        return float("-inf")
    m = max(vals)
    if m == float("-inf"):
        return m
    return m + math.log(sum(math.exp(v - m) for v in vals))


def _word_soft_counts(
    w: str, logp: dict[str, float], max_len: int
) -> tuple[list[tuple[str, float]], float]:
    """Forward-backward over ONE word: the (piece, expectation)
    contributions in deterministic (j, i) scan order — UNWEIGHTED by
    frequency — plus the word's log-partition z (−inf when the word is
    unsegmentable). Shared by the driver-side and distributed E-steps so
    their per-word arithmetic is identical by construction."""
    n = len(w)
    alpha = [float("-inf")] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = []
        for j in range(max(0, i - max_len), i):
            if alpha[j] == float("-inf"):
                continue
            lp = logp.get(w[j:i])
            if lp is None:
                if i - j > 1:
                    continue
                lp = _UNK_LOGP
            acc.append(alpha[j] + lp)
        alpha[i] = _logsumexp(acc)
    z = alpha[n]
    if z == float("-inf"):
        return [], z
    beta = [float("-inf")] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = []
        for jj in range(i + 1, min(n, i + max_len) + 1):
            if beta[jj] == float("-inf"):
                continue
            lp = logp.get(w[i:jj])
            if lp is None:
                if jj - i > 1:
                    continue
                lp = _UNK_LOGP
            acc.append(lp + beta[jj])
        beta[i] = _logsumexp(acc)
    contribs: list[tuple[str, float]] = []
    for j in range(n):
        if alpha[j] == float("-inf"):
            continue
        for i in range(j + 1, min(n, j + max_len) + 1):
            piece = w[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = _UNK_LOGP
            e = math.exp(alpha[j] + lp + beta[i] - z)
            if e > 0.0:
                contribs.append((piece, e))
    return contribs, z


def _soft_counts(
    words: list[tuple[str, int]], logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Full forward-backward E-step (Kudo 2018's EM, not the Viterbi
    approximation): expected piece counts over ALL segmentations of each
    word, plus the corpus log-likelihood — everything in log-space so a
    200-char token cannot underflow. Expected count of piece w[j:i] is
    freq · exp(α_j + lp + β_i − α_n)."""
    counts: dict[str, float] = {}
    ll = 0.0
    for w, f in words:
        contribs, z = _word_soft_counts(w, logp, max_len)
        if z == float("-inf"):
            continue
        ll += f * z
        for piece, e in contribs:
            counts[piece] = counts.get(piece, 0.0) + f * e
    return counts, ll


# reserved LL marker key for the distributed E-step partials: words are
# lowercased [a-z0-9]+ runs, so no real piece can start with NUL
_LL_KEY = "\x00ll"


def _estep_distributed(
    words_df: DataFrame, logp: dict[str, float], max_len: int, em: str
) -> tuple[dict[str, float], float]:
    """Distributed E-step (VERDICT r11 #7): the bpe_encode pattern — one
    ``mapInPandas`` pass over the (word, freq) table with the model
    riding the closure (vocab-sized, broadcast by pickling), each task
    emitting its piece-count partials (+ one LL marker row), then a
    bounded collect of ≤ (vocab+1)·n_partitions partial rows merged
    driver-side in sorted (piece, pid) order.

    CPU scales with executors; the driver only ever sees the M-step
    model. Determinism: hash-repartition by word + sortWithinPartitions
    fixes each task's iteration order, and the sorted driver merge fixes
    the cross-partition sum order — results are bit-stable run to run
    (hard-EM counts are integer-valued, so they are also bit-identical
    to the driver path; soft-EM partials sum in a different order than
    the driver loop, so parity there is to float tolerance — pinned in
    tests/test_unigram.py)."""
    import pandas as pd
    from pyspark import TaskContext

    lp = dict(logp)

    def run(batches):
        pid = TaskContext.get().partitionId()
        agg: dict[str, float] = {}
        ll = 0.0
        for pdf in batches:
            for w, f in zip(pdf["word"], pdf["freq"]):
                f = int(f)
                if em == "soft":
                    contribs, z = _word_soft_counts(w, lp, max_len)
                    if z == float("-inf"):
                        continue
                    ll += f * z
                    for piece, e in contribs:
                        agg[piece] = agg.get(piece, 0.0) + f * e
                else:
                    for piece in _viterbi(w, lp, max_len):
                        agg[piece] = agg.get(piece, 0.0) + f
        rows = sorted(agg.items())
        yield pd.DataFrame(
            {
                "pid": [pid] * (len(rows) + 1),
                "piece": [p for p, _ in rows] + [_LL_KEY],
                "cnt": [c for _, c in rows] + [ll],
            }
        )

    partials = words_df.select("word", "freq").mapInPandas(
        run, schema="pid int, piece string, cnt double"
    ).collect()
    counts: dict[str, float] = {}
    ll = 0.0
    for r in sorted(partials, key=lambda r: (r.piece, r.pid)):
        if r.piece == _LL_KEY:
            ll += float(r.cnt)
        else:
            counts[r.piece] = counts.get(r.piece, 0.0) + float(r.cnt)
    return counts, ll


def _seed_vocab_distributed(
    words_df: DataFrame, seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Distributed seeding: substring counting as a mapInPandas partial-
    count pass + one exact integer groupBy sum (integer sums are order-
    free, so the seed is BIT-IDENTICAL to the driver path's), then a
    bounded collect of all single-char rows plus the top ``seed_size``
    multi-char rows (count desc, piece asc — Spark-side top-k)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def run(batches):
        agg: dict[str, int] = {}
        for pdf in batches:
            for w, f in zip(pdf["word"], pdf["freq"]):
                f = int(f)
                n = len(w)
                for i in range(n):
                    for l in range(1, min(max_piece_len, n - i) + 1):
                        p = w[i : i + l]
                        agg[p] = agg.get(p, 0) + f
        rows = sorted(agg.items())
        yield pd.DataFrame(
            {"piece": [p for p, _ in rows], "cnt": [c for _, c in rows]}
        )

    sums = (
        words_df.select("word", "freq")
        .mapInPandas(run, schema="piece string, cnt long")
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=True)  # one substring pass feeds both selects
    )
    chars = [(r.piece, int(r.cnt)) for r in sums.filter(F.length("piece") == 1).collect()]
    multi = [
        (r.piece, int(r.cnt))
        for r in sums.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(seed_size)
        .collect()
    ]
    kept = dict(chars)
    kept.update(dict(multi))
    total = sum(kept.values())
    return {p: math.log(c / total) for p, c in kept.items()}


def train_unigram(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 400,
    max_words: int = 50_000,
    min_freq: int = 1,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_frac: float = 0.25,
    em: str = "soft",
    distribute: bool = False,
) -> list[tuple[str, float]]:
    """Learn a unigram-LM vocabulary of ``vocab_size`` pieces. Returns
    the model as a sorted (piece, logprob) list — persist it with
    :func:`save_unigram` and feed :func:`unigram_encode`.

    The ONLY driver-side data is the top ``max_words`` word-frequency
    rows (bounded collect, deterministic order). The loop alternates EM
    rounds with count-based prunes of the worst ``prune_frac`` of
    multi-char pieces until ``vocab_size`` remain, then runs
    ``em_iters`` final EM rounds to settle the probabilities.
    Single-char pieces are never pruned (coverage floor).

    ``em="soft"`` (default) is the paper's full forward-backward EM —
    expected counts over ALL segmentations, so useful-but-not-Viterbi-
    chosen pieces keep fractional mass and the vocabulary actually fills
    the budget (corpus log-likelihood is non-decreasing across pure EM
    rounds; pinned in tests). ``em="hard"`` is the cheaper Viterbi
    approximation: counts from the single best segmentation — pieces
    never chosen die immediately, so the learned vocabulary can collapse
    well below ``vocab_size`` (measured: 54 of a 400 budget on the
    sf0.01 fixture corpus). Both are deterministic (no RNG; fixed
    iteration order).

    ``distribute=True`` (VERDICT r11 #7) removes the driver CPU ceiling
    for large ``max_words``: the word table NEVER collects — seeding and
    every E-step run as mapInPandas partial-count passes over the
    executors (the bpe_encode pattern), and the driver only merges the
    bounded vocab-sized partials (the M-step model). Hard-EM and the
    seed are bit-identical to the driver path (integer sums are
    order-free); soft-EM expectations agree to float tolerance (the
    cross-partition sum order differs) — both pinned in
    tests/test_unigram.py."""
    from pyspark.sql import functions as F

    if em not in ("soft", "hard"):
        raise ValueError(f"em must be 'soft' or 'hard', got {em!r}")
    seed_size = max(vocab_size * 4, 64)
    wq = (
        word_frequencies(df, text_col)
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_words)
    )
    if distribute:
        # fixed deterministic partitioning: hash by word, sorted within
        # each task, checkpointed so EM rounds don't re-derive the
        # frequency aggregate
        wdf = (
            wq.select("word", "freq")
            .repartition(32, "word")
            .sortWithinPartitions("word")
            .localCheckpoint(eager=True)
        )
        words: list[tuple[str, int]] | None = None
        if wdf.limit(1).count() == 0:
            return []
        logp = _seed_vocab_distributed(wdf, seed_size, max_piece_len)
    else:
        words = [(r.word, int(r.freq)) for r in wq.collect()]
        if not words:
            return []
        logp = _seed_vocab(words, seed_size=seed_size, max_piece_len=max_piece_len)

    def em_round(cur: dict[str, float]) -> dict[str, float]:
        if distribute:
            counts, _ = _estep_distributed(wdf, cur, max_piece_len, em)
        elif em == "soft":
            counts, _ = _soft_counts(words, cur, max_piece_len)
        else:
            counts = {}
            for w, f in words:
                for p in _viterbi(w, cur, max_piece_len):
                    counts[p] = counts.get(p, 0.0) + f
        # pieces with zero mass drop out unless single-char (kept at an
        # epsilon for coverage); under soft EM zero mass is rare by
        # construction (every in-vocab piece of a segmentable word gets
        # fractional credit)
        total = sum(counts.values())
        out: dict[str, float] = {}
        for p in cur:
            c = counts.get(p, 0.0)
            if c > 0:
                out[p] = math.log(c / total)
            elif len(p) == 1:
                out[p] = math.log(0.5 / total)  # unseen char: epsilon mass
        return out

    logp = em_round(logp)
    # prune loop: shrink multi-char inventory toward the budget
    n_single = sum(1 for p in logp if len(p) == 1)
    while len(logp) > max(vocab_size, n_single):
        multi = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda pl: (pl[1], pl[0]),  # lowest logprob first
        )
        budget = max(vocab_size - n_single, 0)
        excess = len(multi) - budget
        if excess <= 0:
            break
        drop = max(1, min(excess, int(len(multi) * prune_frac)))
        for p, _ in multi[:drop]:
            logp.pop(p)
        logp = em_round(logp)
    for _ in range(max(0, em_iters - 1)):
        logp = em_round(logp)
    if distribute:
        # free the word-table checkpoint blocks (SCALE.md rule 7)
        from pgdedupe_spark.operators.clustering import _free_local_checkpoint

        _free_local_checkpoint(wdf)
    return sorted(logp.items())


def unigram_encode(
    df: DataFrame, id_col: str, text_col: str, model: list[tuple[str, float]]
) -> DataFrame:
    """Tokenize the corpus against a trained unigram model. Output
    (id, tokens array<string>, n_tokens). Scan-local mapInPandas with a
    per-batch word→tokens memo; encoding is a pure function of (text,
    model) — deterministic and partition-count independent."""
    import re as _re

    import pandas as pd
    from pyspark.sql import functions as F

    logp = dict(model)
    max_len = max((len(p) for p in logp), default=1)
    word_re = _re.compile("[a-z0-9]+")

    def _enc(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_col, n_col = [], []
            for text in pdf["_text"]:
                toks: list[str] = []
                for word in word_re.findall((text or "").lower()):
                    enc = memo.get(word)
                    if enc is None:
                        enc = _viterbi(word, logp, max_len)
                        memo[word] = enc
                    toks.extend(enc)
                toks_col.append(toks)
                n_col.append(len(toks))
            yield pd.DataFrame(
                {"id": pdf["_id"], "tokens": toks_col, "n_tokens": n_col}
            )

    out = df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(_enc, schema="id long, tokens array<string>, n_tokens long")
    return out.withColumnRenamed("id", id_col)


def save_unigram(model: list[tuple[str, float]], path: str) -> None:
    """Persist (piece, logprob) pairs as canonical JSON with float.hex
    log-probs — bit-exact round trip (the ml/persistence.py discipline)."""
    import json

    with open(path, "w") as fh:
        json.dump(
            {"version": 1, "pieces": [[p, lp.hex()] for p, lp in model]},
            fh,
            sort_keys=True,
        )


def load_unigram(path: str) -> list[tuple[str, float]]:
    import json

    with open(path) as fh:
        doc = json.load(fh)
    return [(p, float.fromhex(h)) for p, h in doc["pieces"]]
