"""Multimodal column operators — opaque binary + typed metadata.

Design for image/audio/video at 100 TB: media lives as a ``binary``
column next to a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so bytes never round-trip through Python row objects.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are STUBBED: ``decode_image`` raises
NotImplementedError unless a decoder is importable, and
``fake_decode_image`` provides a deterministic stand-in (dimensions
derived from a content hash) so the Spark-side plumbing — schema,
batch iteration, partitioning — is fully real and tested.

Scale notes: one media row can be MBs; keep
``spark.sql.files.maxPartitionBytes`` low for media tables and
repartition by content-hash prefix so no task receives a skewed run
of large objects.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source_doc_id", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("content_sha", StringType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from `documents` (text -> bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").cast("binary").alias("content"),
        F.lit("image/fake").alias("mime_type"),
        F.length(F.col("text")).cast("long").alias("n_bytes"),
        F.col("doc_id").alias("source_doc_id"),
    )


def _real_decoder_available() -> bool:
    try:  # pragma: no cover - decoder not present in this environment
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(media: DataFrame) -> DataFrame:
    """Decode binary images to (width, height, sha) via mapInPandas.

    STUB: requires a real decoder (PIL) which this container lacks —
    raises NotImplementedError; use ``fake_decode_image`` for the
    plumbing path. The mapInPandas structure (Arrow batches in/out,
    no row-wise Python) is the production shape either way.
    """
    if not _real_decoder_available():
        raise NotImplementedError(
            "image decoder (PIL) not available in this environment; "
            "use fake_decode_image() which exercises the same Spark plumbing"
        )
    return fake_decode_image(media)  # pragma: no cover


def fake_decode_image(media: DataFrame) -> DataFrame:
    """Deterministic decode stand-in: dims derived from content sha."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            shas = [hashlib.sha256(bytes(b)).hexdigest() for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [int(s[:4], 16) % 1920 + 1 for s in shas],
                    "height": [int(s[4:8], 16) % 1080 + 1 for s in shas],
                    "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                    "content_sha": shas,
                }
            )

    return media.mapInPandas(decode, DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic fake feature vector (sha-derived) per media row.

    Real implementation swaps the kernel for a model forward pass;
    batch shape, schema, and partitioning are identical.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                h = hashlib.sha256(bytes(b)).digest()
                feats.append([h[i] / 255.0 for i in range(dim)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(kernel, schema)


def resize_image(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize plumbing: binary image -> resized binary + new dims.

    STUB kernel: target dims are the aspect-preserving fit of the
    fake-decoded dims into (max_w, max_h), and the "resized" bytes are
    a deterministic content-hash-seeded truncation. A real build swaps
    the kernel body for PIL's ``thumbnail``; schema (binary out —
    resized media stays an opaque column for downstream ops), Arrow
    batch shape, and partitioning are identical.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("content", BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, outs = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(b)
                s = hashlib.sha256(raw).hexdigest()
                w = int(s[:4], 16) % 1920 + 1
                h = int(s[4:8], 16) % 1080 + 1
                scale = min(max_w / w, max_h / h, 1.0)
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                ids.append(mid)
                ws.append(nw)
                hs.append(nh)
                # deterministic stand-in for re-encoded bytes
                outs.append(raw[: max(1, int(len(raw) * scale))])
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs, "content": outs}
            )

    return media.mapInPandas(kernel, schema)


def frame_sample(media: DataFrame, every_n: int = 2, n_frames: int = 6) -> DataFrame:
    """Frame-sampling plumbing: video binary -> exploded frame rows.

    STUB decode: "frames" are deterministic byte slices; a real build
    replaces the slicer with an ffmpeg keyframe reader. Output is one
    row per sampled frame — the explode happens inside mapInPandas so
    frame bytes never materialize as a driver-side list.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(b)
                step = max(1, len(raw) // n_frames)
                for k in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(raw[k * step : (k + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return media.mapInPandas(kernel, schema)
