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


# --- resize (feature-transform slot) --------------------------------------------------

RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("new_width", T.LongType(), False),
    T.StructField("new_height", T.LongType(), False),
    T.StructField("resized_len", T.LongType(), False),
])


def resize_image_batches(max_dim: int):
    """Arrow-batched fake resizer: scales the deterministic fake dims to fit
    ``max_dim`` (aspect preserved) and models the byte cost as area-scaled.
    A real deployment swaps the body for PIL thumbnail/encode — the batch
    shape, schema and partitioning are the production plumbing."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = pdf["image_bytes"].map(len)
            w = lens % 1024
            h = (lens * 7) % 768
            longest = pd.concat([w, h], axis=1).max(axis=1).clip(lower=1)
            scale = (max_dim / longest).clip(upper=1.0)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "new_width": (w * scale).map(int),
                "new_height": (h * scale).map(int),
                "resized_len": (lens * scale * scale).map(int),
            })
    return gen


def resize_images(df_with_binary: DataFrame, max_dim: int = 256) -> DataFrame:
    return df_with_binary.select("doc_id", "image_bytes").mapInPandas(
        resize_image_batches(max_dim), schema=RESIZED_SCHEMA
    )


# --- frame sampling (one-to-many slot) -----------------------------------------------

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.LongType(), False),
    T.StructField("ts_ms", T.LongType(), False),
    T.StructField("frame_len", T.LongType(), False),
])

FRAME_BYTES = 64
FRAME_INTERVAL_MS = 40  # 25 fps


def frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One-to-MANY mapInPandas: each fake video (binary) explodes into one
    row per FRAME_BYTES chunk with a timestamp — the exact plumbing shape
    of real frame sampling (ffmpeg keyframe extraction swaps in), where
    output cardinality != input cardinality and Arrow batches re-chunk
    downstream."""
    for pdf in batches:
        doc_ids, idxs, tss, lens = [], [], [], []
        for doc_id, blob in zip(pdf["doc_id"], pdf["image_bytes"]):
            n = len(blob)
            n_frames = max(1, -(-n // FRAME_BYTES))
            for i in range(n_frames):
                doc_ids.append(doc_id)
                idxs.append(i)
                tss.append(i * FRAME_INTERVAL_MS)
                lens.append(
                    FRAME_BYTES if (i + 1) * FRAME_BYTES <= n
                    else n - i * FRAME_BYTES
                )
        yield pd.DataFrame({
            "doc_id": doc_ids, "frame_idx": idxs,
            "ts_ms": tss, "frame_len": lens,
        })


def sample_frames(df_with_binary: DataFrame) -> DataFrame:
    return df_with_binary.select("doc_id", "image_bytes").mapInPandas(
        frame_sample_batches, schema=FRAME_SCHEMA
    )


# --- PDF text layer -----------------------------------------------------------------

PDF_TEXT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("pdf_text", T.StringType()),
    T.StructField("n_pdf_bytes", T.LongType()),
])


def documents_as_pdfs(documents: DataFrame) -> DataFrame:
    """Render each document's text into a real single-page PDF (binary
    column) — the PDF-corpus simulator for tests/oracles, mirroring
    documents_as_fake_images."""
    from ..functions.pdf import build_simple_pdf

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "pdf_bytes": [
                    build_simple_pdf(t) for t in pdf["text"]
                ],
            })

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("pdf_bytes", T.BinaryType()),
    ])
    return documents.select("doc_id", "text").mapInPandas(gen, schema=schema)


def extract_pdf_text_column(df_with_pdf: DataFrame) -> DataFrame:
    """PDF text extraction over a binary column (functions/pdf.py:
    tolerant stream scan, Flate + plain, Tj/TJ operators) as an
    Arrow-batched mapInPandas — the PDF flavor of the extraction kernel."""
    from ..functions.pdf import extract_pdf_text

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "pdf_text": [
                    extract_pdf_text(bytes(b)) for b in pdf["pdf_bytes"]
                ],
                "n_pdf_bytes": [len(bytes(b)) for b in pdf["pdf_bytes"]],
            })

    return df_with_pdf.select("doc_id", "pdf_bytes").mapInPandas(
        gen, schema=PDF_TEXT_SCHEMA
    )
