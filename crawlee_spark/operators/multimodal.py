"""Multimodal column handling: image/audio/video as opaque binary + metadata.

Engine-native extension beyond the reference (Crawlee downloads binary bodies
but never decodes them — http-crawler.ts buffers non-HTML bodies verbatim).
A training-data pipeline treats media as:

    media(doc_id long, kind string, content binary, meta struct<...>)

with decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages. The image/audio codec libraries are NOT available in
this environment, so the codec call itself is stubbed: either a clearly
marked ``NotImplementedError`` (``strict=True``) or a deterministic fake
decode keyed on the content bytes (default — keeps the full Spark plumbing
testable: schema evolution, Arrow batch shapes, partition sizing).

Real parts (tested): byte-level metadata extraction (pure Column
expressions: magic-byte sniffing, sizes), the mapInPandas signatures, batch
iteration, and output schemas. Stubbed parts (marked): pixel/sample decode.

Scale notes: media rows are large (MBs) — the plumbing repartitions by
``doc_id`` before decode so Arrow batches stay bounded, and metadata-only
queries never touch ``content`` (column pruning keeps the binary out of the
scan)."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes → sniffed container format (hex string prefix match)
MAGIC_PREFIXES = (
    ("89504e47", "png"),
    ("ffd8ff", "jpeg"),
    ("47494638", "gif"),
    ("52494646", "riff"),  # wav/avi/webp container
    ("494433", "mp3"),
    ("664c6143", "flac"),
    ("1a45dfa3", "mkv"),  # matroska/webm
    ("00000018667479", "mp4"),
    ("00000020667479", "mp4"),
)


def sniff_format_col(content) -> F.Column:
    """Container format from magic bytes — pure Column expression (hex of the
    first 8 bytes vs known prefixes); 'unknown' otherwise."""
    c = F.col(content) if isinstance(content, str) else content
    head = F.lower(F.hex(F.substring(c, 1, 8)))
    expr = F.lit("unknown")
    for prefix, name in reversed(MAGIC_PREFIXES):
        expr = F.when(head.startswith(prefix.lower()), F.lit(name)).otherwise(expr)
    return expr


def media_meta(df: DataFrame, *, content_col: str = "content") -> DataFrame:
    """Metadata projection that never decodes: byte size, sniffed format,
    content digest. Catalyst prunes everything else away when downstream
    selects only these columns."""
    c = F.col(content_col)
    return df.withColumn("byte_size", F.length(c).cast("long")).withColumn(
        "format", sniff_format_col(c)
    ).withColumn("content_md5", F.md5(c))


# ---------------------------------------------------------------------------
# decode / feature stages (mapInPandas; codec stubbed)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(content: bytes, feat_dim: int) -> tuple[int, int, list[float]]:
    """STUB: deterministic fake decode (no codec libs in this container).

    Derives (width, height, feature vector) from the md5 of the UPPERCASE HEX
    of the bytes so the pipeline is testable end-to-end, reproducible, AND
    recomputable by any SQL oracle (DuckDB's md5 is VARCHAR-only, and both
    Spark's ``hex()`` and DuckDB's ``hex()`` emit uppercase). A production
    build replaces this single function with PIL/ffmpeg + a vision encoder."""
    d = hashlib.md5(content.hex().upper().encode()).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    feat = [((d[i % 16] * 31 + i) % 256) / 255.0 for i in range(feat_dim)]
    return width, height, feat


def decode_image_features(
    df: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    feat_dim: int = 8,
    strict: bool = False,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Decode images and emit (doc_id, format, width, height, feature).

    Arrow-batched ``mapInPandas``: each batch is a pandas DataFrame of rows;
    the UDF is a generator so giant partitions stream batch-by-batch instead
    of materializing. ``strict=True`` raises NotImplementedError at the
    codec boundary (the honest no-codec-libs mode); default uses the
    deterministic fake decode."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(content_col).alias("content"))
    if batch_partitions:
        src = src.repartition(batch_partitions, "doc_id")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image codec libraries are not available in this environment; "
                    "plug a real decoder into decode_image_features"
                )
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                w, h, feat = _fake_decode(blob, feat_dim)
                fmt = "unknown"
                head = blob[:8].hex()
                for prefix, name in MAGIC_PREFIXES:
                    if head.startswith(prefix.lower()):
                        fmt = name
                        break
                rows.append((int(doc_id), fmt, w, h, feat))
            yield pd.DataFrame(
                rows, columns=["doc_id", "format", "width", "height", "feature"]
            )

    return src.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    max_side: int = 256,
) -> DataFrame:
    """STUB resize: emits (doc_id, width, height, content) with the target
    geometry and a deterministic fake payload.

    Real implementation swaps ``_fake_resize`` for PIL thumbnail; the Spark
    shape — binary-in/binary-out mapInPandas with bounded Arrow batches —
    is the real, tested part. Aspect ratio follows the fake-decoded
    dimensions, capped at ``max_side``."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(content_col).alias("content"))

    def _fake_resize(blob: bytes) -> tuple[int, int, bytes]:
        w, h, _ = _fake_decode(blob, 1)
        scale = min(1.0, max_side / max(w, h))
        nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
        # deterministic fake pixels: digest-seeded bytes of the right size class
        d = hashlib.md5(blob).digest()
        return nw, nh, (d * ((nw * nh) // len(d) + 1))[: nw * nh]

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                nw, nh, out = _fake_resize(blob)
                rows.append((int(doc_id), nw, nh, out))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "content"])

    return src.mapInPandas(resize, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_audio_features(
    df: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    feat_dim: int = 8,
) -> DataFrame:
    """STUB audio featurizer: (doc_id, format, duration_ms, feature).

    Duration is a deterministic proxy (bytes at a nominal 16 kB/s); the
    feature vector derives from the content digest. Real build: ffmpeg/
    torchaudio behind the same mapInPandas signature."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(content_col).alias("content"))

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                fmt = "unknown"
                head = blob[:8].hex()
                for prefix, name in MAGIC_PREFIXES:
                    if head.startswith(prefix.lower()):
                        fmt = name
                        break
                dur = len(blob) * 1000 // 16000
                _, _, feat = _fake_decode(blob, feat_dim)
                rows.append((int(doc_id), fmt, dur, feat))
            yield pd.DataFrame(rows, columns=["doc_id", "format", "duration_ms", "feature"])

    return src.mapInPandas(featurize, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    *,
    content_col: str = "content",
    id_col: str = "doc_id",
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """STUB frame sampler: emits one row per sampled "frame".

    Real implementation would ffmpeg-seek; the stub hashes fixed-stride byte
    windows, which preserves the exact Spark shape (1→N row explosion via a
    generator mapInPandas) and determinism."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(content_col).alias("content"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                blob = bytes(content) if content is not None else b""
                n = min(max_frames, max(1, len(blob) // every_n_bytes))
                for i in range(n):
                    window = blob[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append((int(doc_id), i, hashlib.md5(window).hexdigest()))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_md5"])

    return src.mapInPandas(sample, FRAME_SAMPLE_SCHEMA)
