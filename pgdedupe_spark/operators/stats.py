"""Table statistics (ANALYZE) and distribution summaries.

A 100 TB engine needs its own metadata: per-column null/cardinality
stats feed join-strategy and skew decisions (the same numbers ANALYZE
feeds Postgres' planner in the reference's world), and fixed-range
histograms summarize value distributions without a sort.

* :func:`analyze_table` — one aggregation pass computes (n_rows,
  n_nulls, n_distinct) for every requested column, then `stack` pivots
  the single wide row to one row per column. Exact distinct counts:
  Spark plans multi-distinct aggregates with one Expand (grouping-set
  style), so the cost is one shuffle regardless of column count. For
  columns where exact ndv is overkill at scale, `approx_count_distinct`
  (HLL++) is the drop-in — the events suite already exercises it
  (`events_approx_distinct`); ANALYZE keeps exact so the oracle is
  bit-for-bit.
* :func:`fixed_histogram` — clamped fixed-range bucketing with explicit
  double arithmetic (floor((v−lo)/(hi−lo)·n)), deliberately NOT a
  percentile sort: one map-side-combining aggregation, and the same
  expression is expressible in any engine for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def analyze_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per requested column, from
    ONE aggregation over the table. Output stays a DataFrame (write it
    next to the table as the stats sidecar)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', _n - `_nn_{c}`, `_nd_{c}`" for c in cols)
    return wide.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack}) AS (column, n_nulls, n_distinct)",
    ).select("column", "n_rows", "n_nulls", "n_distinct")


def fixed_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Clamped fixed-range histogram: bucket i covers
    [lo + i·(hi−lo)/n, lo + (i+1)·(hi−lo)/n), values outside clamp to the
    edge buckets. Pure double arithmetic (IEEE-identical across engines)
    so the DuckDB oracle reproduces buckets exactly."""
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(n_buckets))
    bucket = F.least(
        F.greatest(raw.cast("int"), F.lit(0)), F.lit(int(n_buckets) - 1)
    )
    return (
        df.groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
