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
