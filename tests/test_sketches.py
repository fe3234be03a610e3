"""HLL sketch rollup (operators/sketches.py): the merge-losslessness and
accuracy contracts that make the pattern safe at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgdedupe_spark.operators.sketches import merge_sketch_rollup, sketch_rollup


def _events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dtype = dict(ev.dtypes)["ts"]
    ts = F.col("ts") if dtype.startswith("timestamp") else F.timestamp_micros(F.col("ts"))
    return ev.select("user_id", "event_type", ts.alias("ts"))


def test_union_of_hourly_equals_direct_daily_sketch(spark, sf_dir):
    """Merging hourly sketches must equal sketching the raw day directly
    — not approximately: the SAME estimate, because HLL union is exact
    over register state. This is what makes the materialized fine layer
    trustworthy for any coarser query."""
    ev = _events(spark, sf_dir)
    hourly = sketch_rollup(ev, F.date_trunc("hour", F.col("ts")), "user_id")
    daily_merged = merge_sketch_rollup(hourly, F.date_trunc("day", F.col("bucket")))
    direct = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).cast("long").alias("est"))
    )
    merged = {r.bucket: r.distinct_est for r in daily_merged.collect()}
    straight = {r.bucket: r.est for r in direct.collect()}
    assert merged == straight

    # row counts re-aggregate exactly alongside
    n_daily = sum(r.n_rows for r in daily_merged.collect())
    assert n_daily == ev.count()


def test_estimate_accuracy_vs_exact(spark, sf_dir):
    """lg_k=12 ⇒ rse ≈ 1.04/√4096 ≈ 1.6%; pin 5% (the same contract the
    events_approx_distinct query carries), per event_type group and on
    the full-corpus union."""
    ev = _events(spark, sf_dir)
    sk = sketch_rollup(ev, F.date_trunc("hour", F.col("ts")), "user_id", ["event_type"])
    total = merge_sketch_rollup(sk, F.lit(1), ["event_type"])
    est = {r.event_type: r.distinct_est for r in total.collect()}
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for k in exact:
        assert abs(est[k] - exact[k]) <= max(1, 0.05 * exact[k]), (k, est[k], exact[k])


def test_sketch_state_is_bounded(spark, sf_dir):
    """The materialized layer's value: sketch bytes are lg_k-bounded, not
    row-count-bounded — a year of hourly buckets is ~9k tiny rows."""
    ev = _events(spark, sf_dir)
    hourly = sketch_rollup(ev, F.date_trunc("hour", F.col("ts")), "user_id")
    sizes = [len(bytes(r.sketch)) for r in hourly.select("sketch").collect()]
    assert max(sizes) <= 4096 + 64  # 2^12 registers + header slack
