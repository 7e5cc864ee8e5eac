"""Multimodal column handling: opaque binary media + typed metadata,
with decode/feature-extraction as Arrow-batched Pandas functions over
``mapInPandas`` (the one place Python is the right tool — real decoders
are C libraries driven from Python, not SQL).

The container has no image/audio libraries, so the actual decode step
is STUBBED (``decode_media`` raises NotImplementedError); everything
around it — the binary column schema, the mapInPandas batch iteration,
the output schema contract, partition-preserving feature extraction —
is real and tested via the deterministic byte-level feature extractor
``extract_byte_features`` (length + prefix checksum), which has an
exact SQL oracle (octet_length + ascii folds on the source text).

Scale notes: mapInPandas streams Arrow record batches (no row pickling)
and is embarrassingly parallel per input partition — media decode at
100 TB is scan-shaped, no shuffle. Keep batch size bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch`` when rows carry
multi-MB blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("prefix_checksum", LongType()),
        StructField("mime", StringType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal table: the text bytes
    become the opaque media blob with typed metadata — the schema a
    real image/audio lake would use (binary + mime + size)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def decode_media(blob: bytes, mime: str):  # pragma: no cover - stub
    """Decode an image/audio/video blob into a numpy array.

    STUB: the decode libraries (Pillow, soundfile, av) are not in this
    container. The Spark-side plumbing (schema, batching, partitioning)
    is exercised through extract_byte_features instead."""
    raise NotImplementedError(
        "media decode requires image/audio libraries not present in this environment"
    )


def extract_byte_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over the media table: length +
    checksum of the first 16 bytes — a deterministic stand-in with the
    exact shape of a real decoder (per-row bytes -> fixed-width
    features).

    The batch function is a CLOSURE on purpose: cloudpickle serializes
    nested functions by value, so Spark's Python workers never need
    this package importable on their own path (module-level functions
    are pickled by reference and break when the driver runs from
    outside the repo)."""

    def byte_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media_col = pdf["media"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": media_col.map(len).astype("int64"),
                    "prefix_checksum": media_col.map(lambda b: sum(b[:16]) % 100000).astype(
                        "int64"
                    ),
                    "mime": pdf["mime"],
                }
            )

    return media.mapInPandas(byte_feature_batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("thumb", BinaryType()),
        StructField("thumb_bytes", IntegerType()),
        StructField("mime", StringType()),
    ]
)


def resize_media(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize plumbing over mapInPandas: per-row blob -> fixed-budget
    thumbnail blob. A real implementation decodes, resizes, re-encodes
    (Pillow); here the DETERMINISTIC FAKE strides the raw bytes down to
    <= target_bytes — same signature, batch shape, and binary-in /
    binary-out contract, clearly marked as a stand-in for the missing
    decoder (see decode_media)."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(b: bytes) -> bytes:
                if len(b) <= target_bytes:
                    return bytes(b)
                step = -(-len(b) // target_bytes)  # ceil div
                return bytes(b[::step])

            thumbs = pdf["media"].map(shrink)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb": thumbs,
                    "thumb_bytes": thumbs.map(len).astype("int32"),
                    "mime": pdf["mime"],
                }
            )

    return media.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 32, every_kth: int = 4
) -> DataFrame:
    """Frame-sampling plumbing: blob -> one output ROW per sampled
    frame (explode shape — a video becomes many rows, downstream ops
    stay set-oriented). A real implementation seeks keyframes with a
    demuxer; the DETERMINISTIC FAKE chunks the blob into fixed-size
    frames and keeps every k-th."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                n_frames = max(1, -(-len(blob) // frame_bytes))
                for fi in range(0, n_frames, every_kth):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(bytes(blob[fi * frame_bytes : (fi + 1) * frame_bytes]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                }
            )

    return media.mapInPandas(frame_batches, schema=FRAMES_SCHEMA)
