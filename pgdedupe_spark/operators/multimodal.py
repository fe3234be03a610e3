"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json north star).

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual media decode is stubbed
(`decode=fake`: deterministic bytes-derived features; `decode=strict`:
NotImplementedError) because no image/audio libraries exist in this
container. Swapping in PIL/librosa is a one-function change inside
`_decode_batches`.

Layout convention for a 100 TB media lake:
  (media_id long, modality string, payload binary, meta struct<...>)
partitioned by modality / date; payloads stay opaque to Catalyst so column
pruning skips them unless the decode stage is in the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

DECODE_SCHEMA = (
    "media_id long, modality string, n_bytes long, magic string, "
    f"features array<double>"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str, modality: str = "image") -> DataFrame:
    """Test-fixture builder: treat a text column's bytes as an opaque payload
    (the driver tables have no real media; plumbing is what's under test)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def binary_metadata(df: DataFrame) -> DataFrame:
    """Cheap JVM-side metadata: byte length + magic prefix (hex). No decode."""
    return df.select(
        "media_id",
        "modality",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.hex(F.substring("payload", 1, 4)).alias("magic"),
    )


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derive FEATURE_DIM doubles
    from byte statistics. STUB — replace with PIL/librosa decode."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM)
    chunks = np.array_split(arr.astype(np.float64), FEATURE_DIM)
    return np.array([c.mean() if c.size else 0.0 for c in chunks])


def decode_features(df: DataFrame, mode: str = "fake", batch_hint: int | None = None) -> DataFrame:
    """mapInPandas decode stage: Arrow batches of (media_id, modality,
    payload) → typed features. `mode='strict'` raises NotImplementedError
    (no media libs in this container); `mode='fake'` uses the deterministic
    byte-stat stand-in so the distributed plumbing is fully exercised."""

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(
                    "media decode requires PIL/librosa — not available; use mode='fake'"
                )
            feats = [
                _fake_features(p if isinstance(p, (bytes, bytearray)) else bytes(p))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "magic": [
                        bytes(p[:4]).hex().upper() for p in pdf["payload"]
                    ],
                    "features": [list(f) for f in feats],
                }
            )

    return df.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)
