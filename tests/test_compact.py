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


def test_zorder_bounds_every_dimension(spark, tmp_path):
    """Z-order vs plain sort on two independent uniform columns: plain
    sort_by=x gives disjoint x ranges but each file spans ~the full y
    domain (a y predicate prunes nothing); Morton clustering bounds the
    per-file span in BOTH dimensions, so predicates on either column
    prune files. Pinned quantitatively: mean normalized per-file span
    must stay under 0.5 in x AND y for z-order, while plain sort's mean
    y span exceeds 0.9."""
    src = str(tmp_path / "xy")
    n = 40_000
    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("y"),
    )
    df.repartition(16).write.parquet(src)
    _, total = table_file_stats(spark, src)
    target = max(1, total // 16)  # → 16 output files

    def mean_spans(path):
        rows = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        return (
            sum(r.sx for r in rows) / len(rows) / 10_000,
            sum(r.sy for r in rows) / len(rows) / 10_000,
        )

    plain = str(tmp_path / "plain")
    compact_table(spark, src, plain, target_file_bytes=target, sort_by=["x"])
    zz = str(tmp_path / "zz")
    got = compact_table(spark, src, zz, target_file_bytes=target, zorder_by=["x", "y"])

    assert got.count() == n
    assert "_z" not in got.columns
    sx_plain, sy_plain = mean_spans(plain)
    sx_z, sy_z = mean_spans(zz)
    assert sx_plain < 0.15          # sort key is tightly clustered...
    assert sy_plain > 0.9           # ...but the other dimension is not
    assert sx_z < 0.5 and sy_z < 0.5, (sx_z, sy_z)  # both bounded under z-order


def test_zorder_rejects_combined_with_sort(spark, tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        compact_table(spark, "in", "out", sort_by=["a"], zorder_by=["b"])


def test_zorder_rejects_bit_overflow(spark, tmp_path):
    import pytest as _pytest

    from pgdedupe_spark.sources.io import zorder_column

    df = spark.range(10).selectExpr(*[f"id as c{i}" for i in range(7)])
    with _pytest.raises(ValueError):
        zorder_column(df, [f"c{i}" for i in range(7)], bits=10)


def test_zorder_handles_nulls_and_negatives(spark, tmp_path):
    """NULLs scale to the low corner and negative domains min-max
    normalize — no crash, full row parity, z column dropped."""
    src = str(tmp_path / "nn")
    df = spark.range(2_000).selectExpr(
        "id",
        "CASE WHEN id % 7 = 0 THEN NULL ELSE id - 1000 END AS x",
        "CAST(id % 50 AS DOUBLE) - 25.0 AS y",
    )
    df.repartition(8).write.parquet(src)
    _, total = table_file_stats(spark, src)
    out = str(tmp_path / "nn_z")
    got = compact_table(spark, src, out, target_file_bytes=max(1, total // 4),
                        zorder_by=["x", "y"])
    assert got.count() == 2_000
    assert set(got.columns) == {"id", "x", "y"}
    a = sorted(r.id for r in spark.read.parquet(src).collect())
    b = sorted(r.id for r in got.collect())
    assert a == b


def test_zorder_preserves_user_column_named_z(spark, tmp_path):
    """A user table may carry `_z` itself — the Morton temp column picks a
    collision-free name so the user's data survives the rewrite."""
    import pyspark.sql.functions as F

    from pgdedupe_spark.sources.io import compact_table

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    spark.range(100).select(
        F.col("id").alias("a"),
        (F.col("id") * 3).alias("b"),
        (F.col("id") + 1000).alias("_z"),
    ).write.parquet(src)
    out = compact_table(spark, src, dst, zorder_by=["a", "b"])
    assert "_z" in out.columns
    assert out.agg(F.sum(F.col("_z") - F.col("a"))).collect()[0][0] == 100 * 1000


def test_partitioned_compaction_preserves_layout_and_serving(spark, tmp_path):
    """The index-maintenance loop end-to-end: append leaves 2 files per
    touched bucket directory; compact_table(partition_by=...) must merge
    them to one file per directory WITHOUT flattening the hive layout —
    and the compacted index must serve identically."""
    import os

    from pgdedupe_spark.corpus import hash_embeddings
    from pgdedupe_spark.operators.similarity import (
        index_append,
        lsh_topk_from_index,
        write_lsh_index,
    )
    from pgdedupe_spark.sources.io import compact_table

    emb = hash_embeddings(spark, n_vecs=400, dim=64)
    path = str(tmp_path / "lsh")
    write_lsh_index(emb.filter("vec_id < 200"), "vec_id", "embedding", path,
                    n_planes=3, n_tables=2)
    index_append(spark, path, emb.filter("vec_id >= 200"))

    def files_per_dir(root):
        out = {}
        for dirpath, _, files in os.walk(root):
            data = [f for f in files if f.endswith(".parquet")]
            if data:
                out[os.path.relpath(dirpath, root)] = len(data)
        return out

    before = files_per_dir(path + "/buckets")
    assert any(n > 1 for n in before.values()), "append should leave extra files"

    serve = lambda p: sorted(  # noqa: E731
        (r.query_id, r.neighbor_id, r.rank)
        for r in lsh_topk_from_index(
            spark, p, emb, "vec_id", "embedding", k=3, query_filter="vec_id < 5"
        ).collect()
    )
    want = serve(path)

    compacted = str(tmp_path / "lsh2")
    os.makedirs(compacted)
    compact_table(
        spark, path + "/buckets", compacted + "/buckets",
        partition_by=["table", "bucket"],
    )
    # meta travels with the index; copy it alongside the compacted buckets
    spark.read.parquet(path + "/meta").coalesce(1).write.parquet(compacted + "/meta")

    after = files_per_dir(compacted + "/buckets")
    assert set(after) == set(before), "partition directories must survive"
    assert all(n == 1 for n in after.values()), after
    assert serve(compacted) == want


def test_partitioned_compaction_splits_oversized_partition(spark, tmp_path):
    """target_file_bytes must be honored INSIDE partition directories
    (ADVICE r6): a skewed partition — one hive directory holding ~90% of
    the bytes — has to compact into multiple ~target-sized files, not one
    giant file with no read parallelism, while small partitions still
    merge to a single file and the rows survive exactly."""
    import os

    from pgdedupe_spark.sources.io import compact_table

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    # partition 0 is ~19× the others; pad a text column so bytes are real
    df = spark.range(20_000).selectExpr(
        "id",
        "IF(id < 18000, 0, CAST(id % 20 AS BIGINT)) AS p",
        "repeat(uuid(), 8) AS payload",
    )
    df.repartition(16).write.partitionBy("p").parquet(src)

    from pgdedupe_spark.sources.io import table_file_stats

    _, total = table_file_stats(spark, src)
    target = max(1, total // 8)  # big partition ≈ 90% of bytes ⇒ ≥4 splits
    out = compact_table(spark, src, dst, target_file_bytes=target, partition_by=["p"])

    per_dir = {}
    for dirpath, _, files in os.walk(dst):
        data = [f for f in files if f.endswith(".parquet")]
        if data:
            per_dir[os.path.basename(dirpath)] = len(data)
    assert per_dir.get("p=0", 0) >= 3, per_dir
    assert all(n == 1 for d, n in per_dir.items() if d != "p=0"), per_dir
    assert out.count() == 20_000
    got = {(r.id, r.p) for r in out.select("id", "p").collect()}
    want = {(r.id, r.p) for r in df.select("id", "p").collect()}
    assert got == want


def test_partition_by_rejects_sort_combination(spark, tmp_path):
    import pytest as _pytest

    from pgdedupe_spark.sources.io import compact_table

    src = str(tmp_path / "src")
    spark.range(10).withColumn("p", F.col("id") % 2).write.partitionBy("p").parquet(src)
    with _pytest.raises(ValueError, match="compose"):
        compact_table(spark, src, str(tmp_path / "dst"), partition_by=["p"], sort_by=["id"])
