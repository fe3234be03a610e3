"""Scalar / array function surface (SURVEY.md §2.6 F1-F8) with the
reference's exact semantics, as thin column-expression builders.

Each wraps a Spark built-in where one exists — the point of this module is
pinning the *semantic deltas* vs PostgreSQL in one audited place (NULL
propagation, 1-based indexing, empty-slice behavior) rather than scattering
them through the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def idx(arr: Column, value: Column) -> Column:
    """F1: the reference's custom SQL UDF ``idx(anyarray, anyelement)``
    (``pgdedupe/run.py:81-89``) — 1-based position of value in array, built
    there from generate_series + LIMIT 1. Spark has it natively; 0 when
    absent, NULL on NULL input (same as the PG function's no-match NULL →
    we keep Spark's 0-for-missing, documented delta, the pipeline never
    looks up a missing element)."""
    return F.array_position(arr, value)


def smaller_ids(sorted_ids: Column, block_id: Column) -> Column:
    """F2: the reference's slice ``sorted_ids[1:(idx(..)-1)]``
    (``run.py:314-319``) — all block ids strictly smaller than the current
    one, given a sorted array. An array filter is equivalent (the array is
    sorted) and sidesteps the 1-based/empty-slice pitfalls: position 1
    yields an empty array in both engines."""
    return F.filter(sorted_ids, lambda x: x < block_id)


def pg_concat(*cols: Column) -> Column:
    """F5: PostgreSQL ``||`` string concatenation
    (``tests/initialize_db.py:37``) — NULL if ANY operand is NULL.
    ``F.concat`` matches; ``F.concat_ws`` would silently skip NULLs and is
    therefore wrong for parity."""
    return F.concat(*cols)


def generate_series(start: Column, stop: Column) -> Column:
    """F7: ``generate_series(a, b)`` as an array (explode for rows). Only
    used inside F1 in the reference; provided for surface completeness."""
    return F.sequence(start, stop)
