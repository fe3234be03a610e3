"""Survivorship: cluster labels → one golden record per entity.

The reference's workflow ends at cluster ids on person rows
(``pgdedupe/run.py:220-243`` writes ``entity_map`` and stops); every
consumer of an entity-resolution pipeline then needs the MERGED record —
one canonical value per field per cluster, picked by a per-field
survivorship rule. This module is that last mile, plus the blocking
quality metrics (reduction ratio / completeness / quality) used to
evaluate the candidate-generation stage against labeled truth.

Scale design: ``golden_record`` folds every min/max/longest/latest rule
into ONE hash aggregation keyed by the cluster id (map-side combine; a
single shuffle however many fields). ``mode`` rules are the exception —
a per-value count is a second grouping by construction — so each mode
field costs one extra (cluster, value)-keyed aggregation joined back on
the cluster key (same key ⇒ co-partitioned, AQE broadcasts the
group-sized side). Deterministic throughout: every rule documents its
tie-break, so outputs hash-match an ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: rule name → needs seq_col
RULES = ("min", "max", "longest", "latest", "first", "mode")


def _one_pass_expr(field: str, rule: str, seq_col: str | None) -> Column:
    """Aggregate expression for the single-pass rules. NULL values never
    win: they are excluded before the aggregate, so a cluster whose field
    is all-NULL yields NULL (SQL aggregate semantics both engines)."""
    v = F.col(field)
    if rule == "min":
        return F.min(v).alias(field)
    if rule == "max":
        return F.max(v).alias(field)
    if rule == "longest":
        # longest non-null string; ties → smallest value. min over
        # struct(-length, value): -length ascending == length descending,
        # then value ascending — one deterministic total order.
        st = F.when(
            v.isNotNull(), F.struct((F.lit(0) - F.length(v)).alias("nl"), v.alias("v"))
        )
        return F.min(st).getField("v").alias(field)
    if rule in ("latest", "first"):
        if seq_col is None:
            raise ValueError(f"rule {rule!r} for {field!r} requires seq_col")
        # value at max/min seq among non-null values; seq ties → the
        # max/min value at that seq (struct comparison is lexicographic).
        # Rows with NULL seq never win either rule: unguarded, a NULL seq
        # compares lowest in the struct order and would beat real
        # sequence values under `first` (ADVICE r8).
        st = F.when(
            v.isNotNull() & F.col(seq_col).isNotNull(),
            F.struct(F.col(seq_col).alias("s"), v.alias("v")),
        )
        agg = F.max(st) if rule == "latest" else F.min(st)
        return agg.getField("v").alias(field)
    raise ValueError(f"unknown survivorship rule {rule!r} for {field!r}")


def golden_record(
    df: DataFrame,
    cluster_col: str,
    rules: dict[str, str],
    seq_col: str | None = None,
) -> DataFrame:
    """One row per cluster: ``cluster_col``, ``n_members``, and one
    surviving value per field in ``rules``.

    Rules (all tie-breaks deterministic, mirroring a7_mode_plurality's
    convention):

    * ``min`` / ``max`` — extreme non-null value;
    * ``longest`` — longest non-null string, ties → smallest value;
    * ``latest`` / ``first`` — value at the max/min ``seq_col`` among
      rows where BOTH value and seq are non-null (ties on seq → max/min
      value respectively; NULL-seq rows never win);
    * ``mode`` — most frequent non-null value, ties → smallest value.

    Plan shape: one cluster-keyed hash aggregation carries n_members and
    every non-mode rule; each mode field adds one (cluster, value) count
    aggregation + an equi-join back on the cluster key. No windows, no
    per-cluster collects — at 100 TB the only shuffles are the cluster
    key the caller already produced."""
    unknown = {f: r for f, r in rules.items() if r not in RULES}
    if unknown:
        raise ValueError(f"unknown rules: {unknown}")
    missing = [f for f in rules if f not in df.columns]
    if missing:
        raise ValueError(f"fields not in frame: {missing}")

    base_aggs = [F.count(F.lit(1)).alias("n_members")]
    for field, rule in rules.items():
        if rule != "mode":
            base_aggs.append(_one_pass_expr(field, rule, seq_col))
    out = df.groupBy(cluster_col).agg(*base_aggs)

    for field, rule in rules.items():
        if rule != "mode":
            continue
        counts = (
            df.filter(F.col(field).isNotNull())
            .groupBy(cluster_col, field)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        # most frequent, ties → smallest value: min over struct(-n, value)
        best = counts.groupBy(cluster_col).agg(
            F.min(
                F.struct((F.lit(0) - F.col("_n")).alias("nn"), F.col(field).alias("v"))
            )
            .getField("v")
            .alias(field)
        )
        out = out.join(best, cluster_col, "left")
    return out


def completeness_histogram(
    df: DataFrame,
    identity_col: str,
    cluster_col: str,
    bins: int = 10,
) -> DataFrame:
    """Per-identity completeness histogram — the reference validation
    notebook's last unported analytic (``tests/Deduplication
    validation.ipynb`` cells 26-31): for each TRUE identity,
    ``pct_complete = max(count)/sum(count)`` over its per-cluster record
    counts — the fraction of the identity's records captured by its
    plurality cluster (1.0 = the identity resolved to one entity;
    < 0.5 = a split identity, the notebook's cell-30 failure case).
    Records with NULL ``cluster_col`` (excluded by the filter condition)
    count as their own group, exactly like the notebook's GROUP BY.

    Output: one row per occupied bucket — ``bucket`` (int,
    [b/bins, (b+1)/bins) with the last bucket closed at 1.0),
    ``bucket_lo`` (double), ``n_identities``, ``frac_identities``.
    Bucketing is exact-integer (``min(bins-1, (max·bins) div total)``) so
    a DuckDB oracle hash-matches; the one double division per row runs
    in a fixed order in both engines.

    Plan shape: two identity-keyed hash aggregations (same shuffle key)
    + one bins-sized aggregation + a broadcast 1-row total — no windows,
    no driver collects; at 100 TB the only real shuffle is the identity
    key."""
    per = df.groupBy(identity_col, cluster_col).agg(F.count(F.lit(1)).alias("_n"))
    ident = per.groupBy(identity_col).agg(
        F.max("_n").alias("_mx"), F.sum("_n").alias("_tot")
    )
    bucketed = ident.select(
        F.least(
            F.lit(bins - 1), F.expr(f"(_mx * {bins}) div _tot").cast("int")
        ).alias("bucket")
    )
    hist = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_identities"))
    total = hist.agg(F.sum("n_identities").alias("_total"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            (F.col("bucket").cast("double") / F.lit(float(bins))).alias("bucket_lo"),
            "n_identities",
            (
                F.col("n_identities").cast("double") / F.col("_total").cast("double")
            ).alias("frac_identities"),
        )
    )


def blocking_metrics(
    candidates: DataFrame,
    truth: DataFrame,
    n_records: int | DataFrame,
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Blocking-stage quality scorecard vs labeled truth — the standard
    ER evaluation triple (Christen, "Data Matching" §7.3):

    * ``reduction_ratio`` = 1 − |candidates| / (n·(n−1)/2) — how much of
      the quadratic pair space the blocker pruned;
    * ``completeness``    = |candidates ∩ truth| / |truth| — pair recall
      (the number a 100 TB dedup lives or dies by);
    * ``quality``         = |candidates ∩ truth| / |candidates| — pair
      precision (how much verify work is wasted).

    Both inputs are (id1 < id2) pair frames; the intersection is one
    equi-join on the pair key. Output is a single row; ratios divide
    BIGINT counts in one fixed order so doubles hash-match the oracle.
    An empty truth set yields NULL completeness rather than a crash.
    ``n_records`` is the record count the quadratic denominator uses —
    pass the records frame itself to keep the count inside the plan
    (one more 1-row aggregate, zero driver collects)."""
    c = candidates.select(F.col(id1).alias("_i1"), F.col(id2).alias("_i2")).distinct()
    t = truth.select(F.col(id1).alias("_i1"), F.col(id2).alias("_i2")).distinct()
    hits = c.join(t, ["_i1", "_i2"]).agg(F.count(F.lit(1)).alias("n_hits"))
    nc = c.agg(F.count(F.lit(1)).alias("n_candidates"))
    nt = t.agg(F.count(F.lit(1)).alias("n_truth"))
    if isinstance(n_records, DataFrame):
        nr = n_records.agg(F.count(F.lit(1)).alias("_nr"))
        total = (F.col("_nr") * (F.col("_nr") - 1) / F.lit(2.0)).alias("_tp")
    else:
        nr = None
        total = F.lit(n_records * (n_records - 1) / 2.0).alias("_tp")
    base = nc.crossJoin(nt).crossJoin(hits)
    if nr is not None:
        base = base.crossJoin(nr)
    return (
        base.withColumn("_tpv", total)
        .select(
            "n_candidates",
            "n_truth",
            "n_hits",
            (
                F.lit(1.0)
                - F.col("n_candidates").cast("double") / F.col("_tpv")
            ).alias("reduction_ratio"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_hits").cast("double") / F.col("n_truth").cast("double"),
            ).alias("completeness"),
            F.when(
                F.col("n_candidates") > 0,
                F.col("n_hits").cast("double") / F.col("n_candidates").cast("double"),
            ).alias("quality"),
        )
    )
