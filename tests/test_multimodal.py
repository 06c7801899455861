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


def _build_png(width, height, pixel_fn, *, channels=3, filters=None,
               bit_depth=8, color_type=None, interlace=0):
    """Synthesize a PNG with explicit per-row filter types (cycling all five
    by default), applying the spec's FORWARD filtering so the decoder's
    defilter must invert every arm.  ``pixel_fn(x, y) -> tuple[channels]``."""
    import struct
    import zlib

    if color_type is None:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if filters is None:
        filters = [y % 5 for y in range(height)]
    bpp = channels
    rows = [
        [v for x in range(width) for v in pixel_fn(x, y)] for y in range(height)
    ]
    out = bytearray()
    prev = [0] * (width * channels)
    for y, raw in enumerate(rows):
        f = filters[y]
        line = bytearray([f])
        rec = raw  # recon values ARE the raw pixels; we emit filtered bytes
        for x in range(len(raw)):
            a = rec[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = raw[x]
            elif f == 1:
                v = raw[x] - a
            elif f == 2:
                v = raw[x] - b
            elif f == 3:
                v = raw[x] - (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = raw[x] - pred
            line.append(v % 256)
        out += line
        prev = raw

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def test_decode_image_real_png_path(spark):
    """r5: 8-bit PNG decodes in-sandbox via stdlib zlib — every filter type
    (None/Sub/Up/Average/Paeth) is exercised by the synthesized fixture, the
    luma and nearest-neighbor resize index math match the BMP path exactly,
    gray and RGBA variants decode, garbage bytes raise, and the unsupported
    shapes (palette / 16-bit / interlaced) hit the PIL gate."""
    schema = T.StructType([T.StructField("asset_id", T.LongType()),
                           T.StructField("payload", T.BinaryType())])

    # deterministic gradient over 7x9 RGB, rows cycle through all 5 filters
    def pix(x, y):
        return ((x * 37 + y * 11) % 256, (x * 5 + y * 73) % 256, (x + y * 29) % 256)

    png = _build_png(7, 9, pix)
    df = spark.createDataFrame([Row(asset_id=1, payload=bytearray(png))], schema)
    got = decode_image(df, width=7, height=9, fake=False).collect()[0]["pixels"]
    # expected luma computed independently, no resize (identity index map)
    exp = [
        (0.299 * pix(x, y)[0] + 0.587 * pix(x, y)[1] + 0.114 * pix(x, y)[2]) / 255.0
        for y in range(9) for x in range(7)
    ]
    assert len(got) == 63
    assert all(abs(g - e) < 1e-6 for g, e in zip(got, exp))

    # resize picks the same source indexes as the BMP/resize_images math
    halves = _build_png(4, 4, lambda x, y: (255, 255, 255) if x >= 2 else (0, 0, 0))
    df2 = spark.createDataFrame([Row(asset_id=2, payload=bytearray(halves))], schema)
    px = decode_image(df2, width=2, height=2, fake=False).collect()[0]["pixels"]
    assert [round(p) for p in px] == [0, 1, 0, 1]

    # grayscale (color type 0) and RGBA (alpha ignored) decode
    gray = _build_png(5, 5, lambda x, y: (100,), channels=1)
    rgba = _build_png(5, 5, lambda x, y: (100, 100, 100, 7), channels=4)
    for payload in (gray, rgba):
        d = spark.createDataFrame([Row(asset_id=3, payload=bytearray(payload))], schema)
        p = decode_image(d, width=5, height=5, fake=False).collect()[0]["pixels"]
        assert all(abs(v - 100 / 255.0) < 1e-6 for v in p)

    from us_equity_datalake_spark.multimodal.columns import _png_pixels

    # garbage bytes: parse-boundary ValueError
    with pytest.raises(ValueError):
        _png_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4, 2, 2)
    with pytest.raises(ValueError):
        _png_pixels(b"not a png at all", 2, 2)

    # unsupported shapes gate to PIL (NotImplementedError), honestly named
    sixteen = _build_png(3, 3, lambda x, y: (1, 2, 3), bit_depth=16)
    interlaced = _build_png(3, 3, lambda x, y: (1, 2, 3), interlace=1)
    palette = _build_png(3, 3, lambda x, y: (1,), channels=1, color_type=3)
    for bad in (sixteen, interlaced, palette):
        with pytest.raises(NotImplementedError):
            _png_pixels(bad, 2, 2)
