"""Temporal operators Spark lacks natively: the as-of join.

An as-of (backward) join matches every left row to the single most recent
right row with ``order_col`` ≤ the left row's, per key — the canonical
time-series enrichment (trades⟶quotes, clicks⟶last purchase). Spark has no
built-in; the naive formulations are a range join (quadratic blowup) or a
groupBy-collect (driver-sized state). This is the Spark-first composition:

1. union the two inputs with a side tag, right columns nulled on left rows
   and vice versa;
2. one window per key ordered by ``(order_col, side)`` — right rows sort
   before left rows at equal timestamps, so ties match inclusively;
3. ``last(value, ignorenulls=True)`` over UNBOUNDED PRECEDING..CURRENT ROW
   carries the latest right payload forward;
4. keep the left rows.

Cost: ONE shuffle (hash by key) + an in-partition sort — the same plan a
merge-based as-of join does on a time-series engine, and it scales linearly
with AQE handling hot keys. The right side should be unique per
``(keys, order_col)``; pre-aggregate if not (ties inside the right frame
are otherwise resolved by last-in-sort-order, which is nondeterministic
without a tiebreak column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of join (inclusive): left enriched with the latest
    ``value_cols`` from right where ``right.order_col <= left.order_col``
    within ``key_cols``; NULLs where no right row precedes."""
    lcols = left.columns
    struct_cols = key_cols + [order_col]

    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"_v_{v}") for v in value_cols],
    )
    r_tagged = right.select(
        *struct_cols,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in struct_cols
        ],
        F.lit(0).alias("_side"),
        *[F.col(v).alias(f"_v_{v}") for v in value_cols],
    )
    ordered_cols = lcols + ["_side"] + [f"_v_{v}" for v in value_cols]
    unioned = l_tagged.select(*ordered_cols).unionByName(r_tagged.select(*ordered_cols))

    w = Window.partitionBy(*key_cols).orderBy(order_col, "_side").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_v_{v}", ignorenulls=True).over(w).alias(f"_v_{v}")
            for v in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_v_{v}").alias(v) for v in value_cols]
    )
