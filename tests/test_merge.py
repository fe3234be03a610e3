"""MERGE/CDC operator contracts: semantics on hand-built frames, feed
compaction ordering, and the plan shape that makes snapshot rewrite
viable at 100 TB (change set broadcasts; target never shuffles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgdedupe_spark.operators.merge import (
    apply_cdc,
    latest_change_per_key,
    merge_upsert,
)


def _target(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, v string, bal double"
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_upsert_semantics(spark):
    src = spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], "id long, v string, bal double"
    )
    out = merge_upsert(_target(spark), src, ["id"])
    assert _rows(out) == [
        (1, "a", 10.0),
        (2, "b2", 99.0),  # updated: source wins
        (3, "c", 30.0),
        (4, "d", 40.0),  # inserted
    ]


def test_apply_cdc_semantics(spark):
    changes = spark.createDataFrame(
        [(1, None, None, "D"), (3, "c9", 33.0, "U"), (5, "e", 50.0, "I")],
        "id long, v string, bal double, op string",
    )
    out = apply_cdc(_target(spark), changes, ["id"])
    assert _rows(out) == [(2, "b", 20.0), (3, "c9", 33.0), (5, "e", 50.0)]


def test_latest_change_per_key_compaction(spark):
    feed = spark.createDataFrame(
        [(1, "x", 1.0, "U", 1), (1, "y", 2.0, "U", 3), (1, "z", 9.0, "U", 2)],
        "id long, v string, bal double, op string, seq int",
    )
    out = latest_change_per_key(feed, ["id"], "seq")
    assert _rows(out) == [(1, "y", 2.0, "U", 3)]  # highest seq wins


def test_delete_then_reinsert_needs_two_seqs(spark):
    # a compacted feed applies the FINAL state: delete at seq 1 then
    # insert at seq 2 must leave the key present with the seq-2 payload
    feed = spark.createDataFrame(
        [(2, None, None, "D", 1), (2, "b9", 21.0, "I", 2)],
        "id long, v string, bal double, op string, seq int",
    )
    compacted = latest_change_per_key(feed, ["id"], "seq").drop("seq")
    out = apply_cdc(_target(spark), compacted, ["id"])
    assert (2, "b9", 21.0) in _rows(out)


def test_merge_plan_broadcasts_change_set(spark):
    """The anti join's build side must be the change set (broadcast): the
    target streams map-side with zero payload shuffle — the property that
    bounds merge cost by O(target scan + changes) at any scale."""
    from pgdedupe_spark import registry
    from pgdedupe_spark.plans.inspect import explain_str

    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = explain_str(registry.QUERIES["j10_merge_upsert"](spark, sf))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert not plan.count("SortMergeJoin"), plan


def test_scd2_intervals_partition_time_exactly(spark):
    """SCD2 invariants per key: intervals are disjoint, contiguous
    (each valid_to == the next valid_from), exactly one open row, and a
    point-in-time probe at any change's timestamp returns exactly the
    row whose half-open interval [from, to) contains it."""
    from pgdedupe_spark.operators.merge import scd2_from_changes

    feed = [
        (1, 100, "bronze"), (1, 200, "silver"), (1, 350, "gold"),
        (2, 50, "bronze"), (3, 999, "gold"),
    ]
    df = spark.createDataFrame(feed, "k long, seq long, tier string")
    dim = scd2_from_changes(df, ["k"], "seq").collect()

    by_key: dict = {}
    for r in dim:
        by_key.setdefault(r.k, []).append(r)
    assert {k: len(v) for k, v in by_key.items()} == {1: 3, 2: 1, 3: 1}
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from)
        assert sum(r.is_current for r in rows) == 1 and rows[-1].is_current
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from  # contiguous, disjoint
        assert rows[-1].valid_to is None

    # point-in-time semantics: probe ts -> the covering interval's tier
    for t, want in [(100, "bronze"), (199, "bronze"), (200, "silver"),
                    (349, "silver"), (350, "gold"), (10**9, "gold")]:
        hit = [r for r in by_key[1]
               if r.valid_from <= t and (r.valid_to is None or t < r.valid_to)]
        assert len(hit) == 1 and hit[0].tier == want, t


def test_scd2_single_exchange_plan(spark):
    """One hash exchange keyed by the dimension key — both window
    expressions share it; no extra shuffle for is_current."""
    from pgdedupe_spark.operators.merge import scd2_from_changes

    df = spark.createDataFrame([(1, 1, "x")], "k long, seq long, v string")
    plan = (
        scd2_from_changes(df, ["k"], "seq")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "PythonUDF" not in plan


def test_scd2_refuses_output_column_clash(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, None)], "k long, seq long, valid_to string")
    from pgdedupe_spark.operators.merge import scd2_from_changes

    with pytest.raises(ValueError, match="valid_to"):
        scd2_from_changes(df, ["k"], "seq")


def test_scd2_composes_with_asof_point_in_time_lookup(spark):
    """The SCD2 dimension is PIT-join-ready: enriching a fact stream via
    temporal.asof_join on (key, valid_from) assigns every fact exactly
    the dimension row whose half-open interval contains its timestamp —
    the two operators implement the same contract from opposite ends."""
    from pgdedupe_spark.operators.merge import scd2_from_changes
    from pgdedupe_spark.operators.temporal import asof_join

    feed = [(1, 100, "bronze"), (1, 200, "silver"), (1, 350, "gold"),
            (2, 50, "basic")]
    dim = scd2_from_changes(
        spark.createDataFrame(feed, "k long, seq long, tier string"), ["k"], "seq"
    )
    facts = spark.createDataFrame(
        [(1, 99), (1, 100), (1, 250), (1, 350), (1, 9999), (2, 49), (2, 60)],
        "k long, ts long",
    )
    via_asof = {
        (r.k, r.ts): r.tier
        for r in asof_join(
            facts, dim.withColumnRenamed("valid_from", "ts"),
            ["k"], "ts", ["tier"],
        ).collect()
    }
    # interval-containment reference over the SCD2 rows
    rows = dim.collect()
    for (k, ts), tier in via_asof.items():
        hit = [r.tier for r in rows if r.k == k and r.valid_from <= ts
               and (r.valid_to is None or ts < r.valid_to)]
        assert hit == ([tier] if tier is not None else []), (k, ts, tier, hit)
    assert via_asof[(1, 99)] is None and via_asof[(2, 49)] is None
    assert via_asof[(1, 100)] == "bronze" and via_asof[(1, 350)] == "gold"


def test_scd2_accepts_seq_col_already_named_valid_from(spark):
    """The collision guard must not false-reject a feed whose seq column
    is literally 'valid_from' (the rename is a no-op there)."""
    from pgdedupe_spark.operators.merge import scd2_from_changes

    df = spark.createDataFrame([(1, 10, "a"), (1, 20, "b")],
                               "k long, valid_from long, v string")
    rows = sorted(
        (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_from_changes(df, ["k"], "valid_from").collect()
    )
    assert rows == [(10, 20, False), (20, None, True)]


def _diff_rows(df):
    return {
        tuple(r[k] for k in ("id", "change_type")): tuple(r["changed_cols"])
        for r in df.collect()
    }


def test_snapshot_diff_semantics(spark):
    """Full matrix on hand-built snapshots: added / removed / changed
    (one col, both cols) / unchanged-excluded, with IS DISTINCT FROM
    null semantics — NULL→NULL is unchanged, NULL→value and value→NULL
    are changes."""
    from pgdedupe_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [
            (1, "a", 10.0),    # unchanged
            (2, "b", 20.0),    # v changes
            (3, "c", None),    # NULL bal -> value: bal changes
            (4, "d", 40.0),    # removed
            (5, None, 50.0),   # NULL v -> NULL v: unchanged
            (6, "f", 60.0),    # both change
        ],
        "id long, v string, bal double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "B", 20.0),
            (3, "c", 33.0),
            (5, None, 50.0),
            (6, "F", 66.0),
            (7, "g", 70.0),    # added
        ],
        "id long, v string, bal double",
    )
    out = snapshot_diff(old, new, ["id"])
    assert _diff_rows(out) == {
        (2, "changed"): ("v",),
        (3, "changed"): ("bal",),
        (4, "removed"): (),
        (6, "changed"): ("v", "bal"),
        (7, "added"): (),
    }
    # new-side values ride along for apply/rebuild use
    got = {r["id"]: (r["new_v"], r["new_bal"]) for r in out.collect()}
    assert got[7] == ("g", 70.0) and got[4] == (None, None)

    withu = snapshot_diff(old, new, ["id"], include_unchanged=True)
    kinds = {r["id"]: r["change_type"] for r in withu.collect()}
    assert kinds[1] == "unchanged" and kinds[5] == "unchanged"
    assert withu.count() == 7


def test_snapshot_diff_null_keys_pair_up(spark):
    """A NULL-keyed row in both snapshots diffs (null-safe join) rather
    than producing a spurious add+remove pair."""
    from pgdedupe_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(None, "x")], "id long, v string")
    new = spark.createDataFrame([(None, "y")], "id long, v string")
    out = snapshot_diff(old, new, ["id"]).collect()
    assert len(out) == 1
    assert out[0]["change_type"] == "changed" and out[0]["changed_cols"] == ["v"]


def test_snapshot_diff_refuses_reserved_column_clash(spark):
    import pytest

    from pgdedupe_spark.operators.merge import snapshot_diff

    df = spark.createDataFrame([(1, "a")], "id long, change_type string")
    with pytest.raises(ValueError, match="change_type"):
        snapshot_diff(df, df, ["id"])


def test_snapshot_diff_single_join_plan(spark, sf_dir):
    """One full-outer equi-join, both scans pruned + filter-pushed, no
    cross product, no Python — the O(old+new) floor for any diff."""
    from pgdedupe_spark import registry
    from pgdedupe_spark.plans.inspect import explain_str

    plan = explain_str(registry.QUERIES["j14_snapshot_diff"](spark, sf_dir))
    assert plan.count("SortMergeJoin FullOuter") + plan.count(
        "ShuffledHashJoin FullOuter"
    ) == 1, plan
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert "PythonUDF" not in plan
    assert plan.count("Location: InMemoryFileIndex") == 2  # one pass per side


def test_snapshot_diff_feeds_apply_cdc_roundtrip(spark):
    """The family contract: snapshot_diff RECOVERS the change set that
    apply_cdc APPLIES — diff(old, new) mapped to a CDC feed and applied
    to old reproduces new exactly. This is what makes the diff usable
    for replication, not just reporting."""
    from pgdedupe_spark.operators.merge import apply_cdc, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (4, "d", 40.0), (5, None, 50.0)],
        "id long, v string, bal double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B2", 21.0), (5, "now-set", 50.0), (7, "g", 70.0)],
        "id long, v string, bal double",
    )
    diff = snapshot_diff(old, new, ["id"])
    feed = diff.select(
        "id",
        F.when(F.col("change_type") == "removed", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("new_v").alias("v"),
        F.col("new_bal").alias("bal"),
    )
    applied = apply_cdc(old, feed, ["id"])
    assert _rows(applied) == _rows(new)


def test_snapshot_diff_assert_unique_keys(spark):
    """ADVICE r7: duplicate keys fan out through the full-outer join into
    spurious 'changed' rows with no error — the opt-in precondition
    check fails fast instead, naming the offending key."""
    import pytest

    from pgdedupe_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k int, v string")
    new = spark.createDataFrame([(1, "a"), (2, "z")], "k int, v string")
    with pytest.raises(ValueError, match="duplicate key"):
        snapshot_diff(old, new, ["k"], assert_unique_keys=True)
    # unique keys pass the assertion and still diff correctly
    ok_old = spark.createDataFrame([(1, "a"), (2, "c")], "k int, v string")
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(ok_old, new, ["k"], assert_unique_keys=True).collect()
    }
    assert got == {2: "changed"}


def test_snapshot_diff_new_prefix_clash(spark):
    """ADVICE r7: a key named new_<comparecol> would duplicate an output
    column — refused; a compare column merely NAMED with the new_ prefix
    is fine (its output is new_new_*)."""
    import pytest

    from pgdedupe_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, "x", 1.0)], "k int, new_v string, v double")
    new = spark.createDataFrame([(1, "y", 2.0)], "k int, new_v string, v double")
    # new_v as a KEY collides with new_{v} output
    with pytest.raises(ValueError, match="new_v"):
        snapshot_diff(old, new, ["k", "new_v"], compare_cols=["v"])
    # new_v as a compare col is fine: its output is new_new_v
    out = snapshot_diff(old, new, ["k"], compare_cols=["new_v"])
    assert out.columns.count("new_new_v") == 1
    assert len(out.columns) == len(set(out.columns))
