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


RESIZE_SCHEMA = (
    "media_id long, modality string, payload binary, width int, height int"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, payload binary, n_bytes long"
)


def resize_media(df: DataFrame, width: int, height: int, mode: str = "fake") -> DataFrame:
    """Resize stage (1 row → 1 row): payload → fixed-size payload + size
    metadata. STUB decode: the fake path resamples the byte stream to
    width×height bytes by even-stride selection (deterministic, size-exact),
    standing in for PIL's `Image.resize`. The Spark shape — Arrow batches,
    binary in/out, metadata struct — is the real contract."""
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError("image resize requires PIL — use mode='fake'")
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if len(b) == 0:
                    out.append(b"\x00" * target)
                    continue
                idx = np.linspace(0, len(b) - 1, target).astype(np.int64)
                out.append(np.frombuffer(b, dtype=np.uint8)[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": out,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                }
            )

    return df.mapInPandas(_resize, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4, mode: str = "fake") -> DataFrame:
    """Frame-sampling stage (1 row → N rows — the mapInPandas shape built-in
    operators can't express): each video payload yields ``n_frames`` evenly
    spaced frames. STUB decode: fake frames are contiguous byte slices
    (ffmpeg/pyav would decode real ones); the fan-out semantics, schema,
    and per-frame ordering are the tested contract."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError("frame decode requires pyav — use mode='fake'")
            ids, idxs, payloads, sizes = [], [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                bounds = np.linspace(0, len(b), n_frames + 1).astype(np.int64)
                for i in range(n_frames):
                    frame = b[bounds[i] : bounds[i + 1]]
                    ids.append(mid)
                    idxs.append(i)
                    payloads.append(frame)
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "payload": payloads,
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return df.mapInPandas(_frames, schema=FRAME_SCHEMA)
