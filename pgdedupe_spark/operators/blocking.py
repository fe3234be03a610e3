"""Blocking subsystem (SURVEY.md §2 D5-D7, J1-J2, A2-A3, F2, W1).

Reference dataflow (``pgdedupe/run.py:187-321``)::

    entries_unique ─blocker─▶ blocking_map(block_key, _unique_id)
      → plural_key(block_key, block_id)        -- keys covering ≥2 records
      → plural_block(block_id, _unique_id)
      → covered_blocks(_unique_id, sorted_ids) -- ordered array of block ids
      → smaller_coverage(_unique_id, block_id, smaller_ids)

``smaller_ids`` is the Kolb et al. redundant-free-comparison device
(``run.py:293-319``): a pair inside block B is only compared if B is the
*smallest* block id the two records share.

Spark-first notes:

* predicate blocking is a flatMap: one ``explode`` of an array-of-keys
  column built from pure column expressions (JVM-side, no Python UDFs for
  the built-in predicate library).
* ``plural_key`` is tiny relative to the input (distinct block keys with ≥2
  members) → broadcast-join it back onto blocking_map (J1). AQE skew-join
  handles hot keys on the later self-join.
* the ordered array agg (A3) is ``sort_array(collect_list(...))``.
* ``smaller_ids`` uses ``filter(sorted_ids, x -> x < block_id)`` — clearer
  and NULL-safe vs the reference's slice-by-position (``run.py:314-319``,
  SURVEY F2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pgdedupe_spark.operators.ids import add_deterministic_id, add_row_number_id

# ---------------------------------------------------------------------------
# Predicate library (dedupe's "simple predicates": pure functions of one
# field → iterable of block keys; SURVEY D6). Each returns an array<string>
# Column; NULL fields produce an empty array (dedupe skips missing values).
# ---------------------------------------------------------------------------


def _nonnull(col: Column, arr: Column) -> Column:
    return F.when(col.isNull(), F.array().cast("array<string>")).otherwise(arr)


def whole_field(col: Column) -> Column:
    return _nonnull(col, F.array(col.cast("string")))


def first_chars(col: Column, n: int) -> Column:
    return _nonnull(col, F.array(F.substring(col.cast("string"), 1, n)))


def last_chars(col: Column, n: int) -> Column:
    s = col.cast("string")
    return _nonnull(col, F.array(F.substring(s, -n, n)))


def tokens(col: Column) -> Column:
    """Whitespace tokens of the field."""
    return _nonnull(
        col,
        F.array_distinct(F.filter(F.split(col.cast("string"), r"\s+"), lambda t: t != "")),
    )


def first_token(col: Column) -> Column:
    return _nonnull(col, F.slice(tokens(col), 1, 1))


def char_ngrams(col: Column, n: int) -> Column:
    s = col.cast("string")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
        lambda i: F.substring(s, i, n),
    )
    return _nonnull(col, F.array_distinct(grams))


def common_integers(col: Column) -> Column:
    """All integer substrings of the field (dedupe's commonIntegerPredicate)."""
    return _nonnull(col, F.array_distinct(F.regexp_extract_all(col.cast("string"), F.lit(r"\d+"), 0)))


PREDICATES: dict[str, Callable[..., Column]] = {
    "whole_field": whole_field,
    "first_chars": first_chars,
    "last_chars": last_chars,
    "tokens": tokens,
    "first_token": first_token,
    "char_ngrams": char_ngrams,
}


def make_block_key_expr(rules: list[tuple[str, str, tuple]]) -> Column:
    """Compose predicate rules into one array<string> of namespaced block keys.

    ``rules``: list of (predicate_name, field, extra_args). Keys are prefixed
    with ``"{i}:{field}:"`` so different predicates never collide (mirrors
    dedupe's per-predicate key namespacing).
    """
    parts = []
    for i, (pred, field, args) in enumerate(rules):
        keys = PREDICATES[pred](F.col(field), *args)
        prefix = f"{i}:{field}:"
        parts.append(F.transform(keys, lambda k, p=prefix: F.concat(F.lit(p), k)))
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, p)
    return out


# ---------------------------------------------------------------------------
# The blocking chain
# ---------------------------------------------------------------------------


def blocking_map(entries: DataFrame, block_keys: Column, id_col: str = "_unique_id") -> DataFrame:
    """flatMap record → (block_key, _unique_id)  [run.py:226-245 analog]."""
    return entries.select(
        F.explode(F.array_distinct(block_keys)).alias("block_key"), F.col(id_col)
    )


def plural_key(bmap: DataFrame, small_threshold: int = 5_000_000) -> DataFrame:
    """Block keys covering ≥2 records, with a deterministic serial block_id
    [run.py:265-275; A2 + W1]. Ordering by block_key is a total order.

    Size-adaptive id assignment (the ngram auto-strategy pattern): the frame
    is persisted and counted once, then a single-partition ``row_number``
    when it is dim-sized, else the range-partitioned scale path — at 100 TB
    the distinct plural keys of a loose predicate can be billions of rows,
    where a single-partition window sort is the job-killer."""
    plural = (
        bmap.groupBy("block_key").count().filter(F.col("count") > 1).drop("count")
    ).persist()
    if plural.count() <= small_threshold:
        return add_row_number_id(plural, ["block_key"], id_col="block_id")
    return add_deterministic_id(plural, ["block_key"], id_col="block_id")


def plural_block(bmap: DataFrame, pkey: DataFrame) -> DataFrame:
    """blocking_map ⋈ plural_key → (block_id, _unique_id) [run.py:282-285, J1].
    No forced broadcast: pkey is usually the dim side and AQE broadcasts it
    from runtime stats, but a loose predicate can make it arbitrarily large
    (same hazard class as the exact-merge relabel map)."""
    return bmap.join(pkey, "block_key").select("block_id", "_unique_id")


def covered_blocks(pblock: DataFrame) -> DataFrame:
    """Per record: sorted array of its block ids [run.py:298-303, A3]."""
    return pblock.groupBy("_unique_id").agg(
        F.sort_array(F.collect_list("block_id")).alias("sorted_ids")
    )


def smaller_coverage(pblock: DataFrame, covered: DataFrame) -> DataFrame:
    """Per (record, block): the record's smaller shared block ids
    [run.py:310-319, J2 + F2]. Equi-join on _unique_id; the array filter
    replaces the reference's idx()+slice (empty array when block_id is the
    record's first block, matching the empty PG slice)."""
    return pblock.join(covered, "_unique_id").select(
        "_unique_id",
        "block_id",
        F.filter("sorted_ids", lambda x: x < F.col("block_id")).alias("smaller_ids"),
    )


def blocking_chain(entries: DataFrame, block_keys: Column, id_col: str = "_unique_id"):
    """Run the whole chain; returns (blocking_map, plural_key, plural_block,
    covered_blocks, smaller_coverage)."""
    bmap = blocking_map(entries, block_keys, id_col)
    pkey = plural_key(bmap)
    pblock = plural_block(bmap, pkey)
    covered = covered_blocks(pblock)
    smaller = smaller_coverage(pblock, covered)
    return bmap, pkey, pblock, covered, smaller
