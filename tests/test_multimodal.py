"""Multimodal plumbing: magic sniffing, stubbed decode, frame sampling."""

import pytest
from pyspark.sql import functions as F

from crawlee_spark.operators.multimodal import (
    decode_image_features,
    media_meta,
    sample_frames,
)

PNG = bytes.fromhex("89504E470D0A1A0A") + b"fakepngdata" * 100
JPEG = bytes.fromhex("FFD8FFE0") + b"fakejpegdata" * 400
PLAIN = b"not an image at all"


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        [(1, PNG), (2, JPEG), (3, PLAIN), (4, None)],
        "doc_id long, content binary",
    )


def test_media_meta_sniffing(media):
    rows = {r["doc_id"]: r for r in media_meta(media).collect()}
    assert rows[1]["format"] == "png"
    assert rows[2]["format"] == "jpeg"
    assert rows[3]["format"] == "unknown"
    assert rows[1]["byte_size"] == len(PNG)
    assert rows[4]["byte_size"] is None


def test_decode_image_features_stub(media):
    feats = {r["doc_id"]: r for r in decode_image_features(media, feat_dim=8).collect()}
    assert set(feats) == {1, 2, 3, 4}
    assert feats[1]["format"] == "png" and feats[2]["format"] == "jpeg"
    assert 64 <= feats[1]["width"] < 256 and 64 <= feats[1]["height"] < 256
    assert len(feats[1]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in feats[1]["feature"])
    # determinism: same bytes → same fake decode
    again = {r["doc_id"]: r for r in decode_image_features(media, feat_dim=8).collect()}
    assert feats[1]["feature"] == again[1]["feature"]


def test_decode_strict_raises(media):
    with pytest.raises(Exception) as exc_info:
        decode_image_features(media, feat_dim=8, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_sample_frames(media):
    rows = sample_frames(media, every_n_bytes=1024, max_frames=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # JPEG is ~4.8KB → 3 frames (capped); PLAIN is tiny → 1 frame
    assert len(by_doc[2]) == 3
    assert len(by_doc[3]) == 1
    assert sorted(r["frame_idx"] for r in by_doc[2]) == [0, 1, 2]
    assert all(len(r["frame_md5"]) == 32 for r in rows)


def test_resize_images_stub(media):
    from crawlee_spark.operators.multimodal import resize_images

    rows = {r["doc_id"]: r for r in resize_images(media, max_side=100).collect()}
    for doc_id, r in rows.items():
        assert 1 <= r["width"] <= 100 and 1 <= r["height"] <= 100
        assert len(r["content"]) == r["width"] * r["height"]
    again = {r["doc_id"]: r for r in resize_images(media, max_side=100).collect()}
    assert rows[1]["content"] == again[1]["content"]  # deterministic


def test_audio_features_stub(spark):
    from crawlee_spark.operators.multimodal import extract_audio_features

    mp3 = bytes.fromhex("494433") + b"x" * 32000  # ID3 magic, ~2s at 16kB/s
    df = spark.createDataFrame([(1, mp3), (2, b"short")], "doc_id long, content binary")
    rows = {r["doc_id"]: r for r in extract_audio_features(df, feat_dim=4).collect()}
    assert rows[1]["format"] == "mp3"
    assert abs(rows[1]["duration_ms"] - 2000) < 10
    assert len(rows[1]["feature"]) == 4
    assert rows[2]["format"] == "unknown"


# -- real pure-Python codecs: uncompressed BMP + PCM WAV ---------------------

def make_bmp(width, height, pixel_bytes, *, top_down=False, bpp=24):
    """Raster-order (top-first) pixel bytes → a valid BI_RGB BMP file."""
    import struct

    row_data = width * bpp // 8
    stride = (row_data + 3) & ~3
    rows = [
        pixel_bytes[r * row_data : (r + 1) * row_data] + b"\x00" * (stride - row_data)
        for r in range(height)
    ]
    if not top_down:
        rows = rows[::-1]  # BMPs store bottom-up by default
    arr = b"".join(rows)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(arr), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, (-height if top_down else height), 1, bpp, 0,
        len(arr), 2835, 2835, 0, 0,
    )
    return hdr + dib + arr


def make_wav(samples, *, rate=8000, channels=1, bits=16):
    import struct

    if bits == 16:
        data = b"".join(struct.pack("<h", s) for s in samples)
    else:
        data = bytes(samples)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
        channels * bits // 8, bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_bmp_real_decode(spark):
    """BMP decodes for real: header geometry, bottom-up row flip, row-padding
    strip — a top-down and a bottom-up encoding of the SAME raster must
    decode identically."""
    raster = bytes(range(18))  # 3x2 px, 24bpp -> 9 bytes/row, stride pads to 12
    df = spark.createDataFrame(
        [
            (1, make_bmp(3, 2, raster)),
            (2, make_bmp(3, 2, raster, top_down=True)),
        ],
        "doc_id long, content binary",
    )
    rows = {r["doc_id"]: r for r in decode_image_features(df, feat_dim=8).collect()}
    for d in (1, 2):
        assert rows[d]["format"] == "bmp"
        assert (rows[d]["width"], rows[d]["height"]) == (3, 2)
        got = [round(v * 255) for v in rows[d]["feature"]]
        assert got == list(range(8))  # raster order, padding stripped
    # strict mode: BMP is genuinely supported, so no raise
    strict_rows = decode_image_features(df, feat_dim=4, strict=True).collect()
    assert len(strict_rows) == 2


def _encode_png(w, h, channels, pixels, filter_type=0, level=-1):
    """Test-side PNG encoder (any of the five filters, real zlib stream) —
    independent of the decoder under test."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ct = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    stride = w * channels
    raw = bytearray()
    prev = bytearray(stride)
    for r in range(h):
        line = bytearray(pixels[r * stride : (r + 1) * stride])
        filt = bytearray(line)
        if filter_type == 1:
            for i in range(stride - 1, channels - 1, -1):
                filt[i] = (line[i] - line[i - channels]) & 255
        elif filter_type == 2:
            for i in range(stride):
                filt[i] = (line[i] - prev[i]) & 255
        elif filter_type == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                filt[i] = (line[i] - ((a + prev[i]) >> 1)) & 255
        elif filter_type == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                filt[i] = (line[i] - pr) & 255
        raw += bytes([filter_type]) + bytes(filt)
        prev = line
    body = zlib.compress(bytes(raw), level)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


def test_png_real_decode_all_filters_and_channels(spark):
    """PNG decodes for real (r4 verdict item 3): zlib-inflated IDAT +
    unfiltering for all five scanline filters across grey / grey+alpha /
    RGB / RGBA — round-trip against an independent test-side encoder."""
    import random

    from crawlee_spark.operators.multimodal import _decode_png

    rng = random.Random(7)
    for channels in (1, 2, 3, 4):
        for ftype in range(5):
            w, h = 5, 4
            pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
            got = _decode_png(_encode_png(w, h, channels, pixels, ftype))
            assert got is not None, (channels, ftype)
            assert got == (w, h, pixels), (channels, ftype)
    # and through the Spark decode stage, strict (png is genuinely supported)
    px = bytes(range(12))
    df = spark.createDataFrame(
        [(1, _encode_png(2, 2, 3, px, 4))], "doc_id long, content binary"
    )
    row = decode_image_features(df, feat_dim=8, strict=True).collect()[0]
    assert row["format"] == "png" and (row["width"], row["height"]) == (2, 2)
    assert [round(v * 255) for v in row["feature"]] == list(range(8))


def test_png_decode_declines_out_of_scope_variants(spark):
    """Palette / 16-bit / interlaced / truncated PNGs return None (declared
    stub fallback), never a wrong decode."""
    import struct
    import zlib

    from crawlee_spark.operators.multimodal import _decode_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    sig = b"\x89PNG\r\n\x1a\n"
    for depth, ct, interlace in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, depth, ct, 0, 0, interlace)
        blob = (
            sig
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\0" * 14))
            + chunk(b"IEND", b"")
        )
        assert _decode_png(blob) is None, (depth, ct, interlace)
    ok = _encode_png(2, 2, 3, bytes(12))
    assert _decode_png(ok[: len(ok) - 20]) is None  # truncated stream
    assert _decode_png(sig + b"garbage") is None


def test_bmp_sniff_and_strict_boundary(spark):
    """media_meta sniffs bmp/wav; strict decode raises ONLY for formats with
    no pure-Python codec."""
    df = spark.createDataFrame(
        [(1, make_bmp(2, 1, bytes(6))), (2, make_wav([0, 100])), (3, PNG)],
        "doc_id long, content binary",
    )
    meta = {r["doc_id"]: r["format"] for r in media_meta(df).collect()}
    assert meta == {1: "bmp", 2: "wav", 3: "png"}
    # png AND wav rows both lack an image codec; whichever task fails first
    # surfaces, so match the stable prefix only
    with pytest.raises(Exception, match="no codec for format"):
        decode_image_features(df, feat_dim=4, strict=True).collect()
    # a text body that merely starts with "BM" must NOT sniff as bmp
    txt = spark.createDataFrame([(9, b"BMW article body text")], "doc_id long, content binary")
    assert media_meta(txt).collect()[0]["format"] == "unknown"


def test_wav_real_decode(spark):
    from crawlee_spark.operators.multimodal import extract_audio_features

    samples = [0, 16384, -16384, 32767, -32768, 1, -1, 1000] + [0] * 7992
    wav16 = make_wav(samples, rate=8000, channels=1, bits=16)  # 8000 samples = 1s
    wav8 = make_wav([128, 255, 0, 64], rate=4000, channels=1, bits=8)  # 1 ms
    df = spark.createDataFrame(
        [(1, wav16), (2, wav8)], "doc_id long, content binary"
    )
    rows = {
        r["doc_id"]: r
        for r in extract_audio_features(df, feat_dim=4, strict=True).collect()
    }
    assert rows[1]["format"] == "wav" and rows[1]["duration_ms"] == 1000
    got = [round(v * 32768) for v in rows[1]["feature"]]
    assert got == [0, 16384, -16384, 32767]
    assert rows[2]["duration_ms"] == 1
    got8 = [round(v * 128) for v in rows[2]["feature"]]
    assert got8 == [0, 127, -128, -64]


def test_wav_decode_rejects_subbyte_bits_and_handles_wide_pcm(spark):
    """A hostile fmt chunk with bits_per_sample < 8 must fall back to the
    stub (never ZeroDivisionError a task); 24- and 32-bit PCM decode for
    real instead of byte-garbage features."""
    import struct

    from crawlee_spark.operators.multimodal import extract_audio_features

    def wav_raw(data, bits, rate=8000):
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * max(bits // 8, 1), max(bits // 8, 1), bits)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    bad4 = wav_raw(b"\x00" * 64, bits=4)
    s24 = b"".join(v.to_bytes(3, "little", signed=True) for v in (0, 4194304, -4194304, 8388607))
    wav24 = wav_raw(s24, bits=24)
    # float32 features have a 24-bit mantissa: pick samples that round-trip
    s32 = struct.pack("<4i", 0, 1073741824, -1073741824, 16777216)
    wav32 = wav_raw(s32, bits=32)
    df = spark.createDataFrame(
        [(1, bad4), (2, wav24), (3, wav32)], "doc_id long, content binary"
    )
    rows = {r["doc_id"]: r for r in extract_audio_features(df, feat_dim=4).collect()}
    # bits=4: sniffed wav but NOT decodable -> deterministic stub, no crash
    assert rows[1]["format"] == "wav" and len(rows[1]["feature"]) == 4
    got24 = [round(v * 8388608) for v in rows[2]["feature"]]
    assert got24 == [0, 4194304, -4194304, 8388607]
    assert rows[2]["duration_ms"] == 4 * 1000 // (8000)  # 4 samples at 8kHz
    got32 = [round(v * 2147483648) for v in rows[3]["feature"]]
    assert got32 == [0, 1073741824, -1073741824, 16777216]
    # strict mode: bits=4 is genuinely undecodable -> raises
    import pytest as _pytest

    with _pytest.raises(Exception, match="no codec"):
        extract_audio_features(
            spark.createDataFrame([(1, bad4)], "doc_id long, content binary"),
            feat_dim=2, strict=True,
        ).collect()
