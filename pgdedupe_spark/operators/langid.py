"""Learned language identification — hash-feature multinomial linear
model (VERDICT r10 #9), upgrading the stopword-argmax heuristic
``text.language_id`` with the fastText-LID shape (Joulin et al. 2017,
public): hashed character-n-gram bag features under a per-language
linear scorer, argmax wins.

Exactness discipline (the text_quality_model / kmeans device): the
model QUANTIZES to integers — ``W[lang][bucket]`` is a pinned integer
weight table — so every per-document score is a BIGINT sum of integers
(order-free, engine-exact) and the argmax + tie-break (score desc,
lang asc) hashes bit-for-bit in any engine. No floats anywhere in the
scoring plan.

Plan shape: scoring is ONE zero-shuffle codegen projection per row —
grams, buckets, and the per-language folds are generated-SQL array
expressions over weight literals (the _assign_cells discipline: literal
SQL text, not py4j expression trees). The portable md5 bucket hash is
what makes a DuckDB oracle replicate the features exactly; a production
sweep at 100 TB swaps it for xxhash64 (same plan shape, cheaper hash) —
the fit function takes ``portable=False`` for that.

Training (``fit_language_id``) is one distributed (label, bucket) count
aggregation over the labeled corpus — bounded collect of ≤ L×B rows,
corpus-size independent — then a driver-side quantized
multinomial-naive-Bayes log-likelihood: W[l][b] = round(scale ·
ln((c_lb + 1)/(tot_l + B))). Fitting is deterministic (no RNG, counts
are exact) and the planted-fixture separation is pinned in
tests/test_langid.py.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LANGS = ("de", "en", "es", "fr", "zh")  # ascending — the tie-break order

_LABEL_RE = re.compile(r"[A-Za-z0-9_]+")


def _check_label(lang: object) -> str:
    """Labels become generated-SQL column names (``score_<lang>``), so
    they must be identifier-safe (ADVICE r11: 'zh-CN' or 'pt BR' used to
    produce invalid SQL that failed opaquely at plan time). Raise a
    clear ValueError instead; callers normalize (e.g. zh_CN) upstream."""
    if not isinstance(lang, str) or not _LABEL_RE.fullmatch(lang):
        raise ValueError(
            f"language label {lang!r} is not identifier-safe "
            "([A-Za-z0-9_]+); normalize labels (e.g. 'zh-CN' -> 'zh_CN') "
            "before fitting/scoring"
        )
    return lang


def _gram_bucket_sql(text_col: str, n: int, buckets: int, portable: bool) -> str:
    """Generated SQL: lowercased char n-grams → bucket ids (array<bigint>).
    Empty/short/NULL text yields an empty array."""
    s = f"lower(coalesce(`{text_col}`, ''))"
    grams = (
        f"CASE WHEN length({s}) < {n} THEN array() "
        f"ELSE transform(sequence(1, length({s}) - {n - 1}), "
        f"i -> substring({s}, i, {n})) END"
    )
    if portable:
        bucket = f"CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT) % {buckets}"
    else:
        bucket = f"pmod(xxhash64(g), {buckets})"
    return f"transform({grams}, g -> {bucket})"


def hashed_char_ngrams(
    df: DataFrame, text_col: str, n: int = 2, buckets: int = 64, portable: bool = True
) -> DataFrame:
    """All input columns + ``bucket_ids`` (array<bigint>) — the hashed
    char-n-gram bag. Row-local; exposed for the fit aggregation."""
    return df.selectExpr("*", f"{_gram_bucket_sql(text_col, n, buckets, portable)} AS bucket_ids")


def fit_language_id(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n: int = 2,
    buckets: int = 64,
    scale: int = 10,
    portable: bool = True,
) -> dict[str, list[int]]:
    """Fit the quantized multinomial model on a labeled corpus. Returns
    ``{lang: [w_0 … w_{buckets-1}]}`` integer weights — persist them as
    JSON and feed :func:`language_id_scores`. The ONLY driver-side data
    is the (label, bucket) count table (≤ L×B rows)."""
    rows = (
        hashed_char_ngrams(df, text_col, n, buckets, portable)
        .select(F.col(label_col).alias("_l"), F.explode("bucket_ids").alias("_b"))
        .groupBy("_l", "_b")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()  # bounded: ≤ n_labels × buckets rows
    )
    counts: dict[str, dict[int, int]] = {}
    for r in rows:
        counts.setdefault(_check_label(r._l), {})[int(r._b)] = int(r._c)
    weights: dict[str, list[int]] = {}
    for lang, by_b in counts.items():
        tot = sum(by_b.values())
        weights[lang] = [
            int(round(scale * math.log((by_b.get(b, 0) + 1) / (tot + buckets))))
            for b in range(buckets)
        ]
    return weights


def language_id_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, list[int]],
    n: int = 2,
    buckets: int = 64,
    portable: bool = True,
) -> DataFrame:
    """(id, pred_lang, score_<lang>…): per-language BIGINT scores under
    the pinned integer weights plus the argmax label (ties break to the
    ascending-first language). One codegen projection — no joins, no
    shuffle, no Python, no floats."""
    langs = sorted(_check_label(lang) for lang in weights)
    bk = _gram_bucket_sql(text_col, n, buckets, portable)
    score_exprs = []
    for lang in langs:
        w = weights[lang]
        if len(w) != buckets:
            raise ValueError(f"{lang}: expected {buckets} weights, got {len(w)}")
        arr = "array(" + ",".join(f"{int(v)}L" for v in w) + ")"
        score_exprs.append(
            f"aggregate(_bk, CAST(0 AS BIGINT), "
            f"(acc, b) -> acc + element_at({arr}, CAST(b + 1 AS INT))) "
            f"AS score_{lang}"
        )
    scored = df.selectExpr(f"`{id_col}`", f"{bk} AS _bk").selectExpr(
        f"`{id_col}`", *score_exprs
    )
    # argmax with ascending-language tie-break: the CASE chain mirrors
    # the heuristic language_id's oracle shape exactly
    pred = None
    for i, lang in enumerate(langs):
        rest = [f"score_{o}" for o in langs[i + 1 :]]
        if not rest:
            cond = F.lit(True)
        elif len(rest) == 1:
            cond = F.col(f"score_{lang}") >= F.col(rest[0])
        else:
            cond = F.col(f"score_{lang}") >= F.greatest(*[F.col(r) for r in rest])
        pred = (
            F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
        )
    return scored.select(
        id_col, pred.alias("pred_lang"), *[f"score_{lang}" for lang in langs]
    )


def save_language_id(weights: dict[str, list[int]], path: str) -> None:
    """Canonical-JSON persistence — integer weights round-trip exactly."""
    import json

    with open(path, "w") as fh:
        json.dump({"version": 1, "weights": weights}, fh, sort_keys=True)


def load_language_id(path: str) -> dict[str, list[int]]:
    import json

    with open(path) as fh:
        return {k: [int(v) for v in w] for k, w in json.load(fh)["weights"].items()}
