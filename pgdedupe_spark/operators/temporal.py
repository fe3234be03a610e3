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


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    key_cols: list[str],
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join: every (point row, range row) pair with
    ``lo <= point <= hi`` within ``key_cols`` — inclusive both ends.

    A naive non-equi join plans as a nested loop (quadratic, interpreted
    condition). The scale path buckets the axis: each range explodes to the
    ``(hi - lo) / bucket_width + 1`` buckets it overlaps, each point maps to
    exactly ONE bucket, and the join becomes an equi-join on
    ``(keys..., bucket)`` followed by the exact BETWEEN filter in a codegen
    stage. Each qualifying pair meets in exactly one bucket (the point's),
    so no dedup pass is needed. Pick ``bucket_width`` near the typical range
    span: output work is then O(pairs), not O(n·m).
    """
    b_point = F.floor(F.col(point_col) / F.lit(int(bucket_width)))
    p = points.withColumn("_bkt", b_point)
    r = ranges.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(int(bucket_width))),
                F.floor(F.col(hi_col) / F.lit(int(bucket_width))),
            )
        ),
    )
    joined = p.join(r, key_cols + ["_bkt"]).filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    )
    return joined.drop("_bkt")
