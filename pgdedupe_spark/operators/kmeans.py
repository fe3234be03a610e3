"""Exact-integer k-means over embedding columns.

Semantic clustering is the corpus-mixing primitive (cluster-balanced
sampling, domain discovery, SemDeDup's first stage all start from
k-means over document embeddings). Like graph.pagerank, the operator is
formulated in EXACT INTEGER arithmetic so a fixed-iteration run
hash-matches an unrolled ANSI-SQL oracle bit-for-bit: embeddings are
quantized by ``floor(x · scale)`` (floor is identical in every engine;
round() is not — Spark rounds half-up, DuckDB half-even), distances are
BIGINT sums of squared BIGINT differences (order-free), and centroid
updates are truncating integer division of BIGINT sums (Spark ``div`` ≡
DuckDB ``//`` — both truncate toward zero, verified on negatives).

Scale design (the 100 TB argument): k·dim is SMALL by definition, so
centroids live driver-side as expression literals —

* assignment is a pure scan-local projection (the k distance
  expressions compile into whole-stage codegen; no join, no shuffle),
* the update is ONE hash aggregate keyed by cluster id (map-side
  combine over ≤ k groups; dim sum columns in a single pass),
* per round the only driver traffic is the ≤ k aggregate rows — the
  same bounded-collect discipline as pagerank's two scalars.

Initialization is the k vectors with the smallest ids — deterministic
and oracle-replicable (k-means++ would need RNG the oracle can't
mirror; callers wanting it can pass ``init`` explicitly). Empty
clusters keep their previous centroid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantize(vec_col: str, scale: int) -> Column:
    return F.transform(
        F.col(vec_col), lambda x: F.floor(x * F.lit(float(scale))).cast("long")
    )


def kmeans_exact(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iterations: int = 2,
    dim: int | None = None,
    scale: int = 10**6,
    init: list[list[int]] | None = None,
) -> DataFrame:
    """Lloyd's k-means for ``iterations`` rounds over quantized vectors.
    Returns ``(id_col, cluster)`` — the assignment under the FINAL
    centroids (i.e. ``iterations`` update steps then one assignment).
    Ties in the argmin break to the smallest cluster id.

    ``dim`` defaults to the first row's vector length (one bounded
    collect); pass it explicitly in pipelines that know their schema."""
    iv = df.select(F.col(id_col).alias("_id"), _quantize(vec_col, scale).alias("_iv"))
    if dim is None:
        first = iv.select(F.size("_iv")).first()
        if first is None:
            # empty-input schema must match the non-empty path: keep the
            # caller's id type instead of hardcoding long (ADVICE r8)
            from pyspark.sql.types import IntegerType, StructField, StructType

            schema = StructType(
                [
                    StructField(id_col, df.schema[id_col].dataType, True),
                    StructField("cluster", IntegerType(), True),
                ]
            )
            return df.sparkSession.createDataFrame([], schema)
        dim = first[0]

    if init is None:
        seed_rows = iv.orderBy("_id").limit(k).collect()
        if len(seed_rows) < k:
            raise ValueError(f"need >= {k} vectors to seed {k} clusters")
        centroids = [list(r["_iv"]) for r in sorted(seed_rows, key=lambda r: r["_id"])]
    else:
        if len(init) != k:
            raise ValueError("init must supply exactly k centroids")
        centroids = [list(c) for c in init]

    def assign_expr(cents: list[list[int]]) -> Column:
        """argmin over literal centroids: array_min of (dist, cid) structs —
        entirely codegen, zero joins."""
        cands = []
        for cid, cvec in enumerate(cents):
            carr = F.array(*[F.lit(int(v)).cast("long") for v in cvec])
            dist = F.aggregate(
                F.zip_with("_iv", carr, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            cands.append(F.struct(dist.alias("d"), F.lit(cid).alias("c")))
        return F.array_min(F.array(*cands)).getField("c")

    for _ in range(iterations):
        assigned = iv.withColumn("cluster", assign_expr(centroids))
        stats = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(F.element_at("_iv", d + 1)).alias(f"_s{d}")
                for d in range(dim)
            ],
        ).collect()  # bounded: <= k rows
        by_cid = {r["cluster"]: r for r in stats}
        new_centroids = []
        for cid in range(k):
            r = by_cid.get(cid)
            if r is None:
                new_centroids.append(centroids[cid])  # empty cluster: keep
            else:
                n = r["_n"]
                # truncating integer division — Spark `div` ≡ DuckDB `//`
                new_centroids.append(
                    [int(r[f"_s{d}"]) // n if r[f"_s{d}"] >= 0
                     else -((-int(r[f"_s{d}"])) // n)
                     for d in range(dim)]
                )
        centroids = new_centroids

    return iv.select(
        F.col("_id").alias(id_col), assign_expr(centroids).alias("cluster")
    )
