"""Multimodal binary-column plumbing: metadata extraction, stubbed decode
batch shapes, resize correctness, frame-sampling UDTF shape."""

import hashlib

import pytest
from pyspark.sql import Row, types as T

from us_equity_datalake_spark.multimodal import (
    attach_binary_metadata,
    decode_image,
    extract_image_features,
    resize_images,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def assets(spark):
    rows = [Row(asset_id=i, payload=f"fake-image-{i}".encode(), media_type="image/png") for i in range(6)]
    return spark.createDataFrame(rows)


def test_metadata_extraction_jvm_side(spark, assets):
    out = {r["asset_id"]: r for r in attach_binary_metadata(assets).collect()}
    assert out[0]["n_bytes"] == len(b"fake-image-0")
    assert out[0]["sha256"] == hashlib.sha256(b"fake-image-0").hexdigest()


def test_decode_image_shapes_and_determinism(spark, assets):
    out = decode_image(assets, width=8, height=8).collect()
    assert all(len(r["pixels"]) == 64 for r in out)
    assert all(0.0 <= p <= 1.0 for p in out[0]["pixels"])
    again = decode_image(assets, width=8, height=8).collect()
    assert [r["pixels"] for r in sorted(out, key=lambda r: r["asset_id"])] == [
        r["pixels"] for r in sorted(again, key=lambda r: r["asset_id"])
    ]


def test_decode_image_real_codec_gated(spark, assets):
    """fake=False is the REAL PIL path: without PIL it must raise
    NotImplementedError at the decode boundary (this image); with PIL
    installed it must decode a genuine PNG to the contracted shape."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        with pytest.raises(Exception) as ei:
            decode_image(assets, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)
        return

    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (16, 16), color=128).save(buf, format="PNG")
    png = spark.createDataFrame(
        [Row(asset_id=1, payload=bytearray(buf.getvalue()), media_type="image/png", meta=None)],
        schema=assets.schema,
    )
    out = decode_image(png, width=8, height=8, fake=False).collect()
    assert len(out) == 1 and len(out[0]["pixels"]) == 64
    assert all(abs(p - 128 / 255.0) < 1e-6 for p in out[0]["pixels"])  # uniform plane survives resize


def _build_bmp(width, height, pixel_fn, *, bitcount=24, compression=0, top_down=False):
    """Synthesize an uncompressed 24-bit BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up (or top-down) padded BGR rows.
    ``pixel_fn(x, y) -> (b, g, r)`` with y=0 the TOP row."""
    import struct

    stride = (width * 3 + 3) & ~3
    rows = []
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        row = b"".join(bytes(pixel_fn(x, y)) for x in range(width))
        rows.append(row + b"\x00" * (stride - width * 3))
    pix = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, width, -height if top_down else height,
                       1, bitcount, compression, len(pix), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + len(info) + len(pix), 0, 0, 14 + len(info))
    return hdr + info + pix


def test_decode_image_real_bmp_path(spark):
    """fake=False executes a REAL parse in-sandbox for 24-bit BMP (the image
    twin of the WAV/AVI decoders): solid-color luma is exact, the nearest-
    neighbor resize picks the right source pixels, top-down and bottom-up
    orientations agree, garbage bytes raise, and a non-24bpp BMP hits the
    PIL gate."""
    schema = T.StructType([T.StructField("asset_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    # solid gray 100: luma = 100 exactly under the 0.299/0.587/0.114 weights
    solid = _build_bmp(16, 16, lambda x, y: (100, 100, 100))
    df = spark.createDataFrame([Row(asset_id=1, payload=bytearray(solid))], schema)
    out = decode_image(df, width=8, height=8, fake=False).collect()
    assert len(out[0]["pixels"]) == 64
    assert all(abs(p - 100 / 255.0) < 1e-6 for p in out[0]["pixels"])

    # left half black, right half white, 4x4 -> resize 2x2 picks (0,2) columns
    halves = _build_bmp(4, 4, lambda x, y: (255, 255, 255) if x >= 2 else (0, 0, 0))
    df2 = spark.createDataFrame([Row(asset_id=2, payload=bytearray(halves))], schema)
    px = decode_image(df2, width=2, height=2, fake=False).collect()[0]["pixels"]
    assert [round(p) for p in px] == [0, 1, 0, 1]

    # top-down negative-height BMP must decode identically to bottom-up
    grad = lambda x, y: (10 * y, 10 * y, 10 * y)  # noqa: E731 — row gradient
    bu = _build_bmp(4, 4, grad)
    td = _build_bmp(4, 4, grad, top_down=True)
    both = spark.createDataFrame(
        [Row(asset_id=3, payload=bytearray(bu)), Row(asset_id=4, payload=bytearray(td))], schema
    )
    res = {r["asset_id"]: r["pixels"] for r in decode_image(both, width=4, height=4, fake=False).collect()}
    assert res[3] == res[4]
    # y=0 is the top row in both -> first output pixel is luma 0
    assert res[3][0] == 0.0 and abs(res[3][-1] - 30 / 255.0) < 1e-6

    garbage = spark.createDataFrame([Row(asset_id=5, payload=bytearray(b"BMnot-really-a-bitmap"))], schema)
    with pytest.raises(Exception) as ei:
        decode_image(garbage, fake=False).collect()
    assert "BMP" in str(ei.value) or "ValueError" in str(ei.value)

    eight_bit = _build_bmp(4, 4, lambda x, y: (0, 0, 0), bitcount=8)
    with pytest.raises(Exception) as ei:
        decode_image(
            spark.createDataFrame([Row(asset_id=6, payload=bytearray(eight_bit))], schema),
            fake=False,
        ).collect()
    assert "24-bit" in str(ei.value)


def test_resize_nearest_neighbor(spark, assets):
    decoded = decode_image(assets, width=8, height=8)
    out = resize_images(decoded, src_w=8, src_h=8, dst_w=4, dst_h=4).collect()
    r = out[0]
    assert len(r["pixels_resized"]) == 16
    # nearest-neighbor: resized[0] samples source (0,0); resized[5] samples (2,2)
    assert r["pixels_resized"][0] == r["pixels"][0]
    assert r["pixels_resized"][5] == r["pixels"][2 * 8 + 2]


def test_feature_extraction(spark, assets):
    decoded = decode_image(assets, width=8, height=8)
    r = extract_image_features(decoded).collect()[0]
    assert r["px_min"] <= r["px_mean"] <= r["px_max"]


def test_video_frame_sampling_udtf_shape(spark, assets):
    out = sample_video_frames(assets, n_frames=3).collect()
    assert len(out) == 6 * 3
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2] for v in by_asset.values())
    expected = hashlib.sha256(b"fake-image-0" + (0).to_bytes(4, "big")).hexdigest()
    assert [r["frame_sha"] for r in out if r["asset_id"] == 0 and r["frame_idx"] == 0] == [expected]


def _avi_chunk(cid: bytes, data: bytes) -> bytes:
    import struct

    pad = b"\x00" if len(data) % 2 else b""
    return cid + struct.pack("<I", len(data)) + data + pad


def _avi_list(ltype: bytes, payload: bytes) -> bytes:
    return _avi_chunk(b"LIST", ltype + payload)


def _build_avi(frames: list[bytes], width: int, height: int, compression: int = 0) -> bytes:
    """Minimal valid RIFF/AVI: hdrl (avih + strl/strh/strf) + movi 00db frames."""
    import struct

    stride = (width * 3 + 3) & ~3
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, compression,
                       stride * height, 0, 0, 0, 0)
    strh = b"vids" + b"\x00" * 52
    avih = struct.pack("<14I", 40000, 0, 0, 0, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0)
    hdrl = _avi_list(
        b"hdrl",
        _avi_chunk(b"avih", avih)
        + _avi_list(b"strl", _avi_chunk(b"strh", strh) + _avi_chunk(b"strf", strf)),
    )
    movi = _avi_list(b"movi", b"".join(_avi_chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _solid_frame(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    stride = (width * 3 + 3) & ~3
    row = bytes(bgr) * width + b"\x00" * (stride - width * 3)
    return row * height


def test_sample_video_frames_real_avi_path(spark):
    """fake=False is a REAL parse (RIFF/AVI chunk walk, uncompressed BGR24):
    uniform sampling picks the right source indices, per-frame mean luma
    matches the synthesized solid colors, garbage bytes raise, and a
    compressed stream hits the ffmpeg gate."""
    import hashlib as _hl

    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("asset_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])
    # 6 solid gray frames: frame k has B=G=R=40k -> mean luma = 40k/255
    frames = [_solid_frame(5, 4, (40 * k, 40 * k, 40 * k)) for k in range(6)]
    avi = _build_avi(frames, 5, 4)
    df = spark.createDataFrame([Row(asset_id=1, payload=bytearray(avi))], schema)

    out = sorted(sample_video_frames(df, n_frames=3, fake=False).collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in out] == [0, 2, 4]  # i * 6 // 3
    for r, k in zip(out, (0, 2, 4)):
        assert abs(r.px_mean - (40 * k) / 255.0) < 1e-6
        assert r.frame_sha == _hl.sha256(frames[k]).hexdigest()

    # clip shorter than n_frames: sampled indices de-duplicate
    short = spark.createDataFrame(
        [Row(asset_id=2, payload=bytearray(_build_avi(frames[:2], 5, 4)))], schema
    )
    idxs = sorted(r.frame_idx for r in sample_video_frames(short, n_frames=4, fake=False).collect())
    assert idxs == [0, 1]

    garbage = spark.createDataFrame([Row(asset_id=3, payload=bytearray(b"not-an-avi"))], schema)
    with pytest.raises(Exception) as ei:
        sample_video_frames(garbage, fake=False).collect()
    assert "RIFF" in str(ei.value) or "ValueError" in str(ei.value)

    compressed = spark.createDataFrame(
        [Row(asset_id=4, payload=bytearray(_build_avi(frames, 5, 4, compression=1)))], schema
    )
    with pytest.raises(Exception) as ei:
        sample_video_frames(compressed, fake=False).collect()
    assert "ffmpeg" in str(ei.value)


def test_decode_audio_features_shape_and_determinism(spark):
    from us_equity_datalake_spark.multimodal.columns import decode_audio_features

    df = spark.createDataFrame(
        [Row(asset_id=1, payload=bytearray(b"wav-bytes-1")), Row(asset_id=2, payload=bytearray(b""))],
        T.StructType([T.StructField("asset_id", T.LongType()), T.StructField("payload", T.BinaryType())]),
    )
    out = {r.asset_id: r for r in decode_audio_features(df, n_mels=8, n_frames=4).collect()}
    assert len(out[1].mel) == 4 and all(len(row) == 8 for row in out[1].mel)
    assert out[2].duration_s == 0.0
    # deterministic: same payload -> same features
    again = {r.asset_id: r for r in decode_audio_features(df, n_mels=8, n_frames=4).collect()}
    assert again[1].mel == out[1].mel


def _sine_wav(freq_hz: float, sr: int = 8000, seconds: float = 1.0) -> bytes:
    import io
    import math
    import struct
    import wave

    n = int(sr * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(30000 * math.sin(2 * math.pi * freq_hz * t / sr)))
                for t in range(n)
            )
        )
    return buf.getvalue()


def test_decode_audio_real_wav_path(spark):
    """fake=False is a REAL decode (stdlib wave + numpy FFT): a pure tone's
    energy lands in the band containing its frequency; duration comes from
    the WAV header; garbage bytes raise."""
    from us_equity_datalake_spark.multimodal.columns import decode_audio_features

    schema = T.StructType([T.StructField("asset_id", T.LongType()), T.StructField("payload", T.BinaryType())])
    # 8 bands over 0..4000 Hz (sr 8000); mid-band tones avoid the band edges:
    # 700 Hz -> band 1 (504-1000 Hz), 3700 Hz -> band 7 (3504-4000 Hz)
    df = spark.createDataFrame(
        [Row(asset_id=1, payload=bytearray(_sine_wav(700.0))),
         Row(asset_id=2, payload=bytearray(_sine_wav(3700.0)))],
        schema,
    )
    out = {r.asset_id: r for r in decode_audio_features(df, fake=False, n_mels=8, n_frames=4).collect()}
    for aid, expected_band in ((1, 1), (2, 7)):
        r = out[aid]
        assert abs(r.duration_s - 1.0) < 1e-6
        assert len(r.mel) == 4 and all(len(frame) == 8 for frame in r.mel)
        assert max(range(8), key=lambda i: r.mel[0][i]) == expected_band

    garbage = spark.createDataFrame([Row(asset_id=3, payload=bytearray(b"not-a-wav"))], schema)
    with pytest.raises(Exception):
        decode_audio_features(garbage, fake=False).collect()
