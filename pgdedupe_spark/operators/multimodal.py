"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata (BASELINE.json north star).

The Spark-side plumbing — schema, partitioning, Arrow batch shape, UDF
signatures — is real and tested; the actual media decode is a declared
CAPABILITY resolved at plan time (VERDICT r1 item 8):

* ``decode_capabilities()`` probes the optional decoder libraries
  (PIL / librosa / av) once, driver-side;
* every decode-bearing operator resolves its ``mode`` argument BEFORE
  building the plan — ``strict`` on a modality without its decoder raises
  ``DecodeCapabilityError`` immediately on the driver (never mid-job in an
  executor UDF), ``auto`` degrades to the deterministic ``fake`` decode,
  and ``fake`` always works;
* the CLI surfaces the probe (``--capabilities``) so a user can check what
  a deployment can decode without running a job.

In this container all three probes are False (no media libs), so ``fake``
is the only executable decode; swapping in a real decoder is a
one-function change inside ``_decode_batches`` and flips the probe.

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

# modality → module whose importability defines decode capability
_DECODER_LIBS = {"image": "PIL", "audio": "librosa", "video": "av"}
# modalities with a real strict-decode implementation in this module —
# capability = lib importable AND implementation present, so 'auto' can
# never resolve into an unimplemented strict path
_IMPLEMENTED = {"image"}


class DecodeCapabilityError(RuntimeError):
    """Raised at PLAN TIME when mode='strict' asks for a decoder this
    deployment does not have — never from inside an executor UDF."""


def decode_capabilities() -> dict[str, bool]:
    """Driver-side probe: which modalities can this deployment really
    decode? Pure import-try; cheap enough to call per operator."""
    caps = {}
    for modality, lib in _DECODER_LIBS.items():
        try:
            __import__(lib)
            caps[modality] = modality in _IMPLEMENTED
        except ImportError:
            caps[modality] = False
    return caps


def resolve_decode_mode(mode: str, modality: str = "image") -> str:
    """Resolve a requested decode mode against capabilities, driver-side.

    'fake'   → always runs (deterministic byte-stat stand-in);
    'strict' → real decode, or DecodeCapabilityError here and now;
    'auto'   → 'strict' when capable, else 'fake'.
    """
    if mode not in ("fake", "strict", "auto"):
        raise ValueError(f"decode mode must be fake|strict|auto, got {mode!r}")
    caps = decode_capabilities()
    capable = caps.get(modality, False)
    if mode == "auto":
        return "strict" if capable else "fake"
    if mode == "strict" and not capable:
        raise DecodeCapabilityError(
            f"strict decode of modality {modality!r} needs "
            f"{_DECODER_LIBS.get(modality, '?')} which is not installed; "
            f"capabilities={caps}. Use mode='fake' or 'auto'."
        )
    return mode

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


def _pil_features(payload: bytes) -> np.ndarray:
    """Real image decode (strict path; reachable only where the PIL probe
    is True — not this container). Features: width, height, n_channels,
    then per-channel means padded to FEATURE_DIM."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    arr = np.asarray(img, dtype=np.float64)
    chans = arr.reshape(arr.shape[0], arr.shape[1], -1).mean(axis=(0, 1))
    out = np.zeros(FEATURE_DIM)
    out[0], out[1], out[2] = img.width, img.height, chans.size
    out[3 : 3 + min(chans.size, FEATURE_DIM - 3)] = chans[: FEATURE_DIM - 3]
    return out


def decode_features(
    df: DataFrame, mode: str = "fake", modality: str = "image", batch_hint: int | None = None
) -> DataFrame:
    """mapInPandas decode stage: Arrow batches of (media_id, modality,
    payload) → typed features. ``mode`` is resolved against
    ``decode_capabilities()`` BEFORE the plan is built: 'strict' without
    the decoder fails here on the driver, 'auto' degrades to the
    deterministic 'fake' byte-stat stand-in."""
    mode = resolve_decode_mode(mode, modality)

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decode = _pil_features if mode == "strict" else _fake_features
            feats = [
                decode(p if isinstance(p, (bytes, bytearray)) else bytes(p))
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
    binary in/out, metadata struct — is the real contract. ``mode`` is
    capability-resolved at plan time (strict needs the PIL probe)."""
    mode = resolve_decode_mode(mode, "image")
    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                # reachable only where PIL exists (probe-gated above)
                import io

                from PIL import Image

                out = []
                for p in pdf["payload"]:
                    img = Image.open(io.BytesIO(bytes(p))).resize((width, height))
                    out.append(img.tobytes())
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "modality": pdf["modality"],
                        "payload": out,
                        "width": np.full(len(pdf), width, dtype=np.int32),
                        "height": np.full(len(pdf), height, dtype=np.int32),
                    }
                )
                continue
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
    and per-frame ordering are the tested contract. ``mode`` is
    capability-resolved at plan time; the video probe (pyav) is False in
    this container, so strict fails fast on the driver and the real-frame
    branch is deliberately absent until a decoder exists."""
    mode = resolve_decode_mode(mode, "video")  # strict → driver-side error

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
