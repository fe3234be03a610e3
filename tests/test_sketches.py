"""HLL sketch rollup (operators/sketches.py): the merge-losslessness and
accuracy contracts that make the pattern safe at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgdedupe_spark.operators.sketches import merge_sketch_rollup, sketch_rollup


def _events(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dtype = dict(ev.dtypes)["ts"]
    ts = F.col("ts") if dtype.startswith("timestamp") else F.timestamp_micros(F.col("ts"))
    return ev.select("user_id", "event_type", ts.alias("ts"), "value")


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


def _zipf_tokens(spark, n_docs=3000):
    from pgdedupe_spark.corpus import zipf_corpus

    corpus = zipf_corpus(spark, n_docs=n_docs, doc_len=60, vocab=20_000)
    return corpus.select(
        F.explode(F.split(F.col("text"), " ")).alias("token")
    ).repartition(8)


def test_heavy_hitters_exact_matches_brute_force(spark):
    """exact=True top-k must equal the brute-force groupBy top-k (same
    deterministic tie-break) on a Zipfian vocabulary — the regime the MG
    layer exists for (hot head far above the summed decrement bound)."""
    from pyspark.sql import Window

    from pgdedupe_spark.operators.sketches import heavy_hitters

    toks = _zipf_tokens(spark)
    got = [(r.token, r["count"], r.rank) for r in heavy_hitters(toks, "token", k=20).collect()]
    w = Window.orderBy(F.col("count").desc(), F.col("token"))
    want = [
        (r.token, r["count"], r.rank)
        for r in toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 20")
        .collect()
    ]
    assert got == want


def test_mg_summary_bound_holds_per_run(spark):
    """The per-run error contract: for every token the merged summary
    emits, true − Σdecr ≤ approx ≤ true, with Σdecr the summed
    per-partition decrements the summary itself reports — the bound is
    an output, not a worst-case formula."""
    from pgdedupe_spark.operators.sketches import mg_summaries

    toks = _zipf_tokens(spark)
    cap = 256
    summ = mg_summaries(toks, "token", capacity=cap).cache()
    bound = sum(
        r.decr for r in summ.select("pid", "decr").distinct().collect()
    )
    n = toks.count()
    # classic MG worst case: Σ n_p/(cap+1) = n/(cap+1)
    assert bound <= n // (cap + 1) + summ.select("pid").distinct().count()
    approx = {
        r.token: r.s
        for r in summ.groupBy("token").agg(F.sum("mg_count").alias("s")).collect()
    }
    true = {
        r.token: r.c
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert approx, "summary emitted nothing"
    for t, a in approx.items():
        assert a <= true[t], (t, a, true[t])
        assert a >= true[t] - bound, (t, a, true[t], bound)
    # completeness: anything with true count > bound must have survived
    missing = [t for t, c in true.items() if c > bound and t not in approx]
    assert not missing, missing[:5]
    summ.unpersist()


def test_heavy_hitters_deterministic_and_no_vocab_shuffle(spark):
    """Two runs identical (no RNG anywhere), and the exact pass's plan
    joins against a broadcast candidate set — the full-vocabulary
    exchange the operator exists to avoid must not appear as a sort-merge
    join on token."""
    from pgdedupe_spark.operators.sketches import heavy_hitters

    toks = _zipf_tokens(spark)
    a = heavy_hitters(toks, "token", k=10)
    b = heavy_hitters(toks, "token", k=10)
    ra = [(r.token, r["count"], r.rank) for r in a.collect()]
    rb = [(r.token, r["count"], r.rank) for r in b.collect()]
    assert ra == rb
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_quantile_histogram_merge_is_exact(spark, sf_dir):
    """The rollup contract, bit-exact: merging hourly histograms to daily
    must equal histogramming the raw data directly at daily grain (same
    edges ⇒ per-bin sums are exact, unlike every estimator)."""
    from pgdedupe_spark.operators.sketches import (
        merge_quantile_rollup,
        quantile_histogram_rollup,
    )

    ev = _events(spark, sf_dir)
    lo_hi = ev.agg(F.min(F.col("value").cast("double")), F.max(F.col("value").cast("double"))).collect()[0]
    lo, hi = float(lo_hi[0]), float(lo_hi[1])
    hourly = quantile_histogram_rollup(
        ev, F.date_trunc("hour", F.col("ts")), "value", n_bins=64, lo=lo, hi=hi
    )
    daily_merged = merge_quantile_rollup(hourly, F.date_trunc("day", F.col("bucket")))
    daily_direct = quantile_histogram_rollup(
        ev, F.date_trunc("day", F.col("ts")), "value", n_bins=64, lo=lo, hi=hi
    )

    def canon(df):
        return {
            r.bucket: (dict(r.bins), r.n_rows) for r in df.collect()
        }

    got, want = canon(daily_merged), canon(daily_direct)
    assert got == want
    assert sum(n for _, n in got.values()) == ev.count()


def test_histogram_quantiles_within_bin_width(spark, sf_dir):
    """Quantile reads off the summary must land within one bin width of
    the exact percentile — the histogram error contract, checked for
    p50/p95/p99 on the full-corpus histogram."""
    from pgdedupe_spark.operators.sketches import (
        histogram_quantiles,
        quantile_histogram_rollup,
    )

    ev = _events(spark, sf_dir)
    n_bins = 128
    hist = quantile_histogram_rollup(ev, F.lit(1), "value", n_bins=n_bins)
    row = histogram_quantiles(hist, [0.5, 0.95, 0.99]).collect()[0]
    width = (row.hi - row.lo) / n_bins
    exact = ev.agg(
        F.expr("percentile(CAST(value AS DOUBLE), array(0.5, 0.95, 0.99))")
    ).collect()[0][0]
    for got, want in zip((row.q_0_5, row.q_0_95, row.q_0_99), exact):
        assert abs(got - want) <= width + 1e-9, (got, want, width)


def test_quantile_histogram_state_bounded_and_clamped(spark):
    """Rows outside [lo, hi] clamp into edge bins (layers stay mergeable
    under domain drift) and the summary never exceeds n_bins entries."""
    from pgdedupe_spark.operators.sketches import quantile_histogram_rollup

    df = spark.range(10_000).selectExpr("CAST(id AS DOUBLE) AS v")
    hist = quantile_histogram_rollup(df, F.lit(1), "v", n_bins=16, lo=2000.0, hi=4000.0)
    row = hist.collect()[0]
    bins = dict(row.bins)
    assert len(bins) <= 16
    assert row.n_rows == 10_000
    assert bins[0] >= 2000  # everything below lo landed in bin 0
    assert bins[15] >= 6000  # everything above hi landed in the top bin


# ---------------------------------------------------------------------------
# Bloom-filter membership layer (new r7)
# ---------------------------------------------------------------------------

from pgdedupe_spark.operators.sketches import (  # noqa: E402
    bloom_build,
    bloom_merge,
    bloom_might_contain,
)

_BITS, _HASHES = 1 << 16, 5


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """The two halves of the membership contract: every inserted key
    answers True (deterministic positions ⇒ no false negatives, the
    property the exact incremental dedup depends on), and a disjoint
    probe set false-positives at ≤ 2× the classic (1-e^(-kn/m))^k rate."""
    import math

    n = 2000
    members = [f"member-{i}" for i in range(n)]
    bloom = bloom_build(_keys(spark, members), "k", _BITS, _HASHES)

    probed = bloom_might_contain(
        _keys(spark, members).withColumn("id", F.col("k")),
        "k", bloom, _BITS, _HASHES, "id",
    )
    assert probed.filter(~F.col("might_contain")).count() == 0

    others = _keys(spark, [f"other-{i}" for i in range(n)]).withColumn(
        "id", F.col("k")
    )
    fp = bloom_might_contain(others, "k", bloom, _BITS, _HASHES, "id")
    fp_rate = fp.filter(F.col("might_contain")).count() / n
    theoretical = (1 - math.exp(-_HASHES * n / _BITS)) ** _HASHES
    assert fp_rate <= 2 * theoretical + 0.01, (fp_rate, theoretical)


def test_bloom_merge_equals_direct_build(spark):
    """Mergeability is lossless: OR-ing two filters is bit-identical to
    building one filter over the concatenated input — the property that
    makes the corpus filter maintainable across ingest batches without
    rebuilds."""
    a = [f"a-{i}" for i in range(500)]
    b = [f"b-{i}" for i in range(500)]
    merged = bloom_merge(
        bloom_build(_keys(spark, a), "k", _BITS, _HASHES),
        bloom_build(_keys(spark, b), "k", _BITS, _HASHES),
    )
    direct = bloom_build(_keys(spark, a + b), "k", _BITS, _HASHES)
    m = {r.word_idx: r.bits for r in merged.collect()}
    d = {r.word_idx: r.bits for r in direct.collect()}
    assert m == d


def test_bloom_state_bounded(spark):
    """Sparse-row count never exceeds num_bits/64 regardless of input
    size — the filter's footprint is sized by m, not by the key count."""
    many = _keys(spark, [f"x-{i}" for i in range(20000)])
    bloom = bloom_build(many, "k", _BITS, _HASHES)
    assert bloom.count() <= _BITS // 64
    # saturation sanity: distinct word_idx values only, one row each
    assert bloom.groupBy("word_idx").count().filter("count > 1").count() == 0


def test_incremental_exact_flags_prunes_and_matches(spark):
    """dedup.incremental_exact_flags: flags equal a plain exact join
    (bloom screening is semantically invisible), and the bloom screen
    really prunes — novel rows never enter the confirm join."""
    from pgdedupe_spark.operators.dedup import incremental_exact_flags

    corpus = spark.createDataFrame(
        [(i, f"shared doc {i % 50}") for i in range(100)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(1000 + i, f"shared  DOC {i}") for i in range(30)]  # 30 dups (normalized)
        + [(2000 + i, f"novel doc {i}") for i in range(70)],
        "doc_id long, text string",
    )
    out = incremental_exact_flags(corpus, batch, "doc_id", "text").collect()
    flags = {r.doc_id: (r.is_dup, r.corpus_id) for r in out}
    assert len(flags) == 100
    for i in range(30):
        assert flags[1000 + i][0], i
        assert flags[1000 + i][1] == i  # min corpus id with that norm
    for i in range(70):
        assert flags[2000 + i] == (False, None), i


def test_bloom_probe_refuses_column_clashes(spark):
    import pytest

    df = _keys(spark, ["a"]).withColumn("id", F.col("k")).withColumn(
        "might_contain", F.lit(True)
    )
    bloom = bloom_build(_keys(spark, ["a"]), "k", _BITS, _HASHES)
    with pytest.raises(ValueError, match="might_contain"):
        bloom_might_contain(df, "k", bloom, _BITS, _HASHES, "id")


# ---------------------------------------------------------------------------
# Count-Min frequency layer (new r7)
# ---------------------------------------------------------------------------

from pgdedupe_spark.operators.sketches import (  # noqa: E402
    cm_build,
    cm_estimate,
    cm_merge,
)


def _cm_zipf_tokens(spark, n=20000, vocab=2000, seed=3):
    """Deterministic Zipfian-ish stream for the CM tests, JVM-side."""
    return spark.range(n).select(
        F.concat(
            F.lit("tok"),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(vocab)) ** 2 / F.lit(vocab))
            .cast("long"),
        ).alias("t")
    )


def test_cm_never_undercounts_and_bound_holds(spark):
    """The two halves of the CM contract on a skewed stream: estimates
    are never below true counts, and (per the classic bound) at most a
    small fraction of items exceed true + 2N/width."""
    toks = _cm_zipf_tokens(spark)
    width, depth = 1024, 4
    cm = cm_build(toks, "t", width, depth)
    true = {r.t: r.c for r in toks.groupBy("t").agg(F.count("*").alias("c")).collect()}
    items = toks.select("t").distinct()
    est = {r.t: r.est for r in cm_estimate(cm, items, "t", width, depth).collect()}
    n = sum(true.values())
    over = 0
    for t, c in true.items():
        assert est[t] >= c, t  # never undercounts
        if est[t] > c + 2 * n / width:
            over += 1
    assert over / len(true) <= 2 ** -depth + 0.02, over
    # never-seen items estimate 0 (their cells may collide, so allow >0
    # but require the guaranteed-absent common case on a sparse sketch)
    ghost = spark.createDataFrame([("never-seen-xyz",)], "t string")
    g = cm_estimate(cm, ghost, "t", width, depth).first().est
    assert g >= 0


def test_cm_merge_equals_direct_build(spark):
    """Per-cell summation is lossless: merged halves equal one build
    over the whole stream, cell for cell."""
    s = spark.range(6000).select(
        F.concat(F.lit("w"), F.pmod(F.xxhash64("id"), F.lit(300))).alias("t"),
        (F.col("id") % 2).alias("half"),
    )
    width, depth = 256, 3
    merged = cm_merge(
        cm_build(s.filter("half = 0").select("t"), "t", width, depth),
        cm_build(s.filter("half = 1").select("t"), "t", width, depth),
    )
    direct = cm_build(s.select("t"), "t", width, depth)
    m = {(r.d, r.w): r.cnt for r in merged.collect()}
    dd = {(r.d, r.w): r.cnt for r in direct.collect()}
    assert m == dd
    # state bound: never more than depth*width cells
    assert len(dd) <= depth * width


def test_cm_estimate_refuses_column_clash(spark):
    import pytest

    toks = spark.createDataFrame([("a",)], "t string")
    cm = cm_build(toks, "t", 64, 2)
    with pytest.raises(ValueError, match="est"):
        cm_estimate(cm, toks.withColumn("est", F.lit(1)), "t", 64, 2)
