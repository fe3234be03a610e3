"""MERGE / upsert / CDC-apply as immutable recompute.

The reference updates rows in place (ALTER + UPDATE writeback — SURVEY.md
§2.1 S8, `run.py`'s UPDATE-join); a distributed columnar store can't, so
the engine's merge family rewrites the target as a new snapshot:

* :func:`merge_upsert` — SCD1 MERGE: source rows win on key match,
  unmatched target rows pass through, unmatched source rows insert.
* :func:`apply_cdc` — a change feed with I/U/D operations applied in one
  pass: deletes drop, inserts/updates upsert.

Plan shape (the 100 TB argument): both are ONE left-anti join of the
target against the source's keys plus a union — the anti join build side
is the CHANGE SET (bounded by the feed, ≪ target), so AQE broadcasts it
and the target streams through map-side with zero payload shuffle; the
union is a no-shuffle concatenation. Cost is O(target scan + change
set), the floor for any snapshot rewrite. Writing the result partitioned
the same way as the target (`sources/io.write_bucketed`) keeps repeated
merges co-located.

For feeds carrying multiple changes per key, compact the feed first with
``latest_change_per_key`` (max-by on a sequence column) — applying an
uncompacted feed is order-undefined, the same contract warehouse MERGE
statements enforce with "multiple source rows matched" errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """SCD1 MERGE: upsert every source row into the target by ``keys``.
    Matched target rows are replaced by their source row, unmatched
    target rows survive, unmatched source rows insert. Schemas must
    union by name."""
    keep = target.join(source.select(*keys), keys, "left_anti")
    return keep.unionByName(source)


def apply_cdc(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a compacted change feed (one row per key) to the target:
    rows whose ``op_col`` equals ``delete_op`` delete their key; every
    other change row upserts (insert vs update needs no distinction in a
    snapshot rewrite). The feed must already be one-change-per-key — see
    :func:`latest_change_per_key`."""
    keep = target.join(changes.select(*keys), keys, "left_anti")
    upserts = changes.filter(F.col(op_col) != delete_op).drop(op_col)
    return keep.unionByName(upserts)


def latest_change_per_key(
    changes: DataFrame, keys: list[str], seq_col: str
) -> DataFrame:
    """Compact a change feed to its final state per key: the row with the
    highest ``seq_col`` wins (ties broken by the full row ordering being
    unique in any sane feed — pass a composite seq if not). One window
    over the feed only — the target is never touched."""
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc())
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    include_unchanged: bool = False,
    assert_unique_keys: bool = False,
) -> DataFrame:
    """Reconcile two snapshots of the same table: one row per key that
    differs, tagged ``change_type`` ∈ {'added','removed','changed'} (plus
    'unchanged' when ``include_unchanged``) with ``changed_cols`` — the
    list of compare columns whose values differ, in ``compare_cols``
    order. The inverse of :func:`merge_upsert`/:func:`apply_cdc`: those
    apply a change set, this recovers one (table versioning, replication
    audit, expectation-free regression checks between pipeline runs).

    Null semantics are SQL IS DISTINCT FROM throughout: NULL→NULL is
    unchanged, NULL→value is a change; NULL key values pair up too (the
    join is null-safe), so a snapshot with a NULL-keyed row diffs rather
    than cross-producting or dropping.

    PRECONDITION — keys are unique per snapshot (ADVICE r7): a
    duplicated key fans out through the full-outer join into one row
    per old×new pairing, each reported 'changed' against a different
    counterpart. Pass ``assert_unique_keys=True`` to fail fast instead
    (adds one count-distinct aggregation per side — two extra passes,
    so it is opt-in; dedup upstream with ``latest_per_key`` if the
    snapshots are change feeds rather than states).

    Plan shape (the 100 TB argument): ONE full-outer equi-join on the
    key — each side shuffles once on the same key (zero shuffles when
    both snapshots share a bucketed layout, `sources/io.write_bucketed`);
    every per-column comparison is a row-local codegen expression on the
    joined row. Cost is O(old + new) — the floor for any diff. Raises if
    ``change_type``/``changed_cols`` collide with a snapshot column."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c not in keys and c in set(new.columns)
        ]
    # clash check covers the new_{c} output names too (ADVICE r7): the
    # output schema is keys + change_type/changed_cols + new_{c}, so a
    # key named new_<comparecol> (or a snapshot column named
    # change_type/changed_cols) would emerge as a silent duplicate
    out_names = (
        list(keys) + ["change_type", "changed_cols"] + [f"new_{c}" for c in compare_cols]
    )
    dups = {n for n in out_names if out_names.count(n) > 1}
    clash = ({"change_type", "changed_cols"} & (set(old.columns) | set(new.columns))) | dups
    if clash:
        raise ValueError(f"snapshot columns collide with outputs: {sorted(clash)}")
    if assert_unique_keys:
        for side, df_ in (("old", old), ("new", new)):
            dup = (
                df_.groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"{side} snapshot has duplicate key "
                    f"{tuple(dup[0][k] for k in keys)!r} — snapshot_diff "
                    "requires unique keys per snapshot"
                )
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    diffs = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}")), F.lit(c)
                ).otherwise(F.lit(None).cast("string"))
                for c in compare_cols
            ]
        )
    )
    out = joined.select(
        *[F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k) for k in keys],
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change_type"),
        F.when(
            F.col("_in_old").isNotNull() & F.col("_in_new").isNotNull(), diffs
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
        *[F.col(f"_n_{c}").alias(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("change_type") != "unchanged")
    return out


def scd2_from_changes(
    changes: DataFrame,
    keys: list[str],
    seq_col: str,
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Build an SCD Type-2 dimension from a change feed: every change row
    becomes a validity interval — ``seq_col`` opens it (valid_from) and
    the NEXT change of the same key closes it (``end_col`` = lead(seq),
    NULL ⇒ open-ended, flagged ``current_col``). The half-open contract
    [valid_from, valid_to): an as-of probe at time t matches the single
    row with valid_from <= t < coalesce(valid_to, +inf) — the
    point-in-time join temporal.asof_join_backward implements.

    SCD1 (:func:`merge_upsert`) keeps only the latest value; SCD2 keeps
    the full history, which is what training-data provenance and
    time-travel joins need. One window per key ordered by ``seq_col`` —
    a single hash exchange keyed by the dimension key; history length
    per key is the partition bound (dimension churn, not fact volume).
    The feed must be change-per-row unique on (keys, seq_col): enforce
    upstream with latest_change_per_key per seq granularity. Raises on
    pre-existing valid_from/``end_col``/``current_col`` columns."""
    clash = ({"valid_from", end_col, current_col} - {seq_col}) & set(
        changes.columns
    )
    if clash:
        raise ValueError(f"change feed already has columns {sorted(clash)}")
    return (
        changes.withColumnRenamed(seq_col, "valid_from")
        .withColumn(end_col, F.lead("valid_from").over(
            Window.partitionBy(*keys).orderBy(F.col("valid_from"))))
        .withColumn(current_col, F.col(end_col).isNull())
    )
