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
