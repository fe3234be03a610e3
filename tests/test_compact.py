"""Compaction: small-file rewrite sizing from real on-disk bytes, row
parity, and the range-clustered layout that lets parquet min/max stats
prune file reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgdedupe_spark.sources.io import compact_table, table_file_stats


def test_compact_fixes_small_files(spark, tmp_path):
    src = str(tmp_path / "shattered")
    out = str(tmp_path / "compacted")
    df = spark.range(0, 20_000).withColumn("payload", F.md5(F.col("id").cast("string")))
    df.repartition(64).write.parquet(src)  # simulate streaming-ingest shatter

    n_before, total = table_file_stats(spark, src)
    assert n_before == 64

    got = compact_table(spark, src, out, target_file_bytes=total)  # → 1 file
    n_after, _ = table_file_stats(spark, out)
    assert n_after == 1
    assert got.count() == 20_000
    # content parity, not just counts
    a = sorted(r.id for r in spark.read.parquet(src).select("id").collect())
    b = sorted(r.id for r in got.select("id").collect())
    assert a == b


def test_compact_sorted_files_cover_disjoint_ranges(spark, tmp_path):
    src = str(tmp_path / "shattered2")
    out = str(tmp_path / "clustered")
    spark.range(0, 20_000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    ).repartition(32).write.parquet(src)

    _, total = table_file_stats(spark, src)
    compact_table(spark, src, out, target_file_bytes=max(1, total // 4), sort_by=["id"])
    n_after, _ = table_file_stats(spark, out)
    assert n_after >= 2

    # per-file (min, max) of the sort key must not overlap — that is the
    # property parquet row-group pruning exploits for range predicates
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in per_file)
    assert len(spans) == n_after
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev < lo_next, spans
