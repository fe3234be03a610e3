"""Trainable BPE tokenizer — vocabulary learning + distributed encoding.

The LLM-pipeline gap this closes (new r7): ``text.py`` counts tokens with
a BPE-ish regex but nothing in the engine could LEARN a subword
vocabulary from a corpus or encode text against one. This module is the
classic byte-pair-encoding algorithm (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public paper)
arranged for Spark's execution model:

* **Training** runs on the *word-frequency table*, not the corpus: one
  distributed ``groupBy(word).count()`` (the only shuffle), then a
  bounded collect of the top ``max_words`` (by freq desc, word asc —
  deterministic) feeds the driver-side merge loop. This is the standard
  practical arrangement (every production BPE trainer reduces to word
  frequencies first); the collect bound is explicit and documented, and
  driver cost is O(n_merges × Σ|word|), independent of corpus row count.
* **Encoding** is scan-local: ``mapInPandas`` with a per-batch
  word→tokens memo (natural-language batches repeat words heavily, so
  the merge loop runs once per DISTINCT word per batch). No shuffle, no
  state — the plan is a single projection-shaped pass, exactly what a
  100 TB tokenization sweep needs.

Vocabulary/merge determinism: ties in pair frequency break to the
lexicographically smallest pair, so the same corpus always yields the
same merge list (pinned in tests/test_bpe.py against an independently
written reference implementation).

Word tokenization matches ``operators/text.py`` / ``operators/dedup.py``
(lower-cased ``[a-z0-9]+`` runs) so BPE composes with the rest of the
text family; the end-of-word marker is ``</w>`` per the paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — one explode + one aggregation; the
    partial (map-side) aggregation makes the shuffle carry distinct
    words per partition, not token instances."""
    return (
        df.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_word(symbols: tuple, pair: tuple) -> tuple:
    out = []
    i, n = 0, len(symbols)
    while i < n:
        if i < n - 1 and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 200,
    max_words: int = 50_000,
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ordered
    merge list (the model — persist it as JSON/parquet and feed it to
    :func:`bpe_encode`). The ONLY driver-side data is the top
    ``max_words`` word-frequency rows (bounded collect, deterministic
    order); the merge loop maintains pair counts incrementally, touching
    only words that contain the merged pair each round."""
    rows = (
        word_frequencies(df, text_col)
        .filter(F.col("freq") >= min_freq)
        .orderBy(F.col("freq").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple, int] = {
        tuple(r.word) + (_EOW,): int(r.freq) for r in rows
    }
    # pair counts + inverted index pair → words containing it
    pair_count: dict[tuple, int] = {}
    pair_words: dict[tuple, set] = {}
    for w, f in vocab.items():
        for a, b in zip(w, w[1:]):
            pair_count[(a, b)] = pair_count.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_count:
            break
        # deterministic argmax: max count, then lexicographically smallest
        best = min(pair_count, key=lambda p: (-pair_count[p], p))
        if pair_count[best] <= 0:
            break
        merges.append(best)
        for w in list(pair_words.get(best, ())):
            f = vocab.pop(w, None)
            if f is None:
                continue
            for a, b in zip(w, w[1:]):  # retire the old word's pairs
                pair_count[(a, b)] -= f
                if pair_count[(a, b)] <= 0:
                    pair_count.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        pair_words.pop((a, b), None)
            nw = _merge_word(w, best)
            vocab[nw] = vocab.get(nw, 0) + f
            for a, b in zip(nw, nw[1:]):
                pair_count[(a, b)] = pair_count.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(nw)
    return merges


def bpe_vocab(merges: list[tuple[str, str]]) -> list[str]:
    """The token inventory a merge list implies: single characters are
    implicit (byte fallback); each merge contributes its joined symbol."""
    return [a + b for a, b in merges]


def _encode_word(word: str, ranks: dict) -> list[str]:
    symbols = list(word) + [_EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i in range(len(symbols) - 1):
            r = ranks.get((symbols[i], symbols[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """Tokenize the corpus against a trained merge list. Output
    (id, tokens array<string>, n_tokens). Scan-local mapInPandas with a
    per-batch word→tokens memo; merges apply lowest-rank-first (the
    paper's greedy order), so encoding is a pure function of (text,
    merges) — deterministic and partition-count independent."""
    import re as _re

    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
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
                        enc = _encode_word(word, ranks)
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


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a trained merge list as JSON (ordered; order IS the model).
    Same plain-file convention as ml/training.py's model persistence."""
    import json

    with open(path, "w") as fh:
        json.dump({"version": 1, "merges": [list(m) for m in merges]}, fh)


def load_bpe(path: str) -> list[tuple[str, str]]:
    import json

    with open(path) as fh:
        doc = json.load(fh)
    return [tuple(m) for m in doc["merges"]]
