"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, Arrow batching, mapInPandas
signature, partitioning — while the actual codec work is STUBBED (the
image/audio libraries are not in this container).  ``decode_image_meta``
ships a deterministic fake decoder; ``decode_image_real`` raises
NotImplementedError and documents where a Pillow/ffmpeg call would slot in.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("fake_width", T.LongType(), False),
    T.StructField("fake_height", T.LongType(), False),
    T.StructField("format_guess", T.StringType(), True),
])

_MAGIC = (
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "webp"),
)


def _sniff_format(b: bytes) -> str:
    for magic, name in _MAGIC:
        if b.startswith(magic):
            return name
    return "unknown"


def decode_image_real(data: bytes):  # pragma: no cover - stub by design
    """Real decode slot: ``PIL.Image.open(io.BytesIO(data))`` at deploy
    time.  Not available in this container."""
    raise NotImplementedError(
        "image decoding requires Pillow/libvips; wire in at deployment"
    )


def image_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched fake decoder: deterministic metadata from the bytes.
    The batch shape (Iterator[pd.DataFrame] in/out) is exactly what a real
    decoder would use — swap the body, keep the plumbing."""
    for pdf in batches:
        blobs = pdf["image_bytes"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "byte_len": blobs.map(len),
            "fake_width": blobs.map(lambda b: len(b) % 1024),
            "fake_height": blobs.map(lambda b: (len(b) * 7) % 768),
            "format_guess": blobs.map(_sniff_format),
        })


def extract_image_metadata(df_with_binary: DataFrame) -> DataFrame:
    """df must have (doc_id: long, image_bytes: binary)."""
    return df_with_binary.select("doc_id", "image_bytes").mapInPandas(
        image_meta_batches, schema=IMAGE_META_SCHEMA
    )


def documents_as_fake_images(documents: DataFrame) -> DataFrame:
    """Synthesize a binary column from the documents table (deterministic),
    standing in for a real (id, image bytes) multimodal table."""
    return documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("image_bytes")
    )
