"""Regenerate pgdedupe_spark/operators/pq_pinned.py — the pinned IVFADC
layout for the ann_pq_serve hash oracle (VERDICT r8 #3).

The layout is TRAINED once (deterministically: hash-ranked sample,
first-k-distinct init, fixed Lloyd iterations — similarity.py) on the
10^4-QUANTIZED sf0.01 embeddings, then rounded to integers. Integer
centroids over integer vectors keep every serve value exact (the oracle
requirement); training keeps recall at the trained-layout level (the
quality requirement) — rounding moves each centroid < 1 quantum.

Run:  python scripts/gen_pq_pinned.py   (writes the fixture module)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM, M, KSUB, N_CENTROIDS = 64, 16, 32, 16
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    from pyspark.sql import functions as F

    from pgdedupe_spark.operators.similarity import ivf_index, pq_train_codebooks
    from pgdedupe_spark.session import get_spark

    spark = get_spark("gen-pq-pinned")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qemb = emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 10000 + 0.5).cast("double"),
        ).alias("embedding"),
    )
    books = pq_train_codebooks(qemb, "vec_id", "embedding", DIM, m=M, ksub=KSUB)
    _, centroids = ivf_index(qemb, "vec_id", "embedding", N_CENTROIDS)
    ibooks = np.rint(books).astype(np.int64)
    icents = [[int(round(x)) for x in vec] for _, vec in centroids]

    lines = [
        '"""Pinned IVFADC layout for the ann_pq_serve hash oracle — INTEGER',
        "codebooks/centroids trained once on the 1e4-quantized sf0.01",
        "embeddings and rounded (regenerate: python scripts/gen_pq_pinned.py).",
        "Integer layout + integer-quantized vectors = every serve value is",
        'exact, so the DuckDB oracle reproduces the serve bit-for-bit."""',
        "",
        f"DIM, M, KSUB, N_CENTROIDS = {DIM}, {M}, {KSUB}, {N_CENTROIDS}",
        "",
        "# (M, KSUB, DIM//M) sub-codebooks",
        "PINNED_BOOKS = [",
    ]
    for j in range(M):
        lines.append("    [")
        for c in range(KSUB):
            lines.append("        [" + ", ".join(str(int(v)) for v in ibooks[j, c]) + "],")
        lines.append("    ],")
    lines.append("]")
    lines.append("")
    lines.append("# N_CENTROIDS coarse centroids of DIM ints")
    lines.append("PINNED_CENTROIDS = [")
    for vec in icents:
        lines.append("    [" + ", ".join(str(v) for v in vec) + "],")
    lines.append("]")
    with open("pgdedupe_spark/operators/pq_pinned.py", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote pgdedupe_spark/operators/pq_pinned.py")


if __name__ == "__main__":
    main()
