"""Multimodal column plumbing: binary payloads + typed metadata (extension).

Design: image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct alongside (modality, byte size, content hash, decoded
dimensions). The Spark-side plumbing — schema, partitioning, Arrow batch
shape through ``mapInPandas`` — is real and tested; the *decoder* itself is a
stub (image/audio libraries are not in this environment): it derives
deterministic fake features from the payload bytes, and raises
``NotImplementedError`` when a real decode is requested.

At 100 TB, payloads dominate IO: keep them in their own parquet column so
metadata-only queries never read them (parquet column pruning), partition by
modality/date, and size ``spark.sql.files.maxPartitionBytes`` to a few
payloads per task. Feature extraction is ``mapInPandas`` (streamed Arrow
batches, bounded memory) — one pass, no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODALITIES = ["image", "audio", "video"]

#: Output schema of :func:`extract_features` (metadata + fake feature vector).
FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes int, content_hash string, "
    "width int, height int, n_frames int, feature array<float>"
)


def to_blob_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a multimodal table from a text corpus: payload = utf-8 bytes.

    Stands in for real media ingestion; the schema (binary payload + typed
    metadata columns) is the contract downstream operators rely on.
    """
    blob = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col),
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]), (F.col(id_col) % 3 + 1).cast("int")
        ).alias("modality"),
        blob.alias("payload"),
        F.octet_length(blob).alias("n_bytes"),
        F.md5(blob).alias("content_hash"),
    )


def blob_metadata(blobs: DataFrame) -> DataFrame:
    """Metadata-only projection + deterministic pseudo-dimensions.

    Never touches ``payload`` (parquet column pruning keeps the scan tiny) —
    dimensions are derived from the content hash nibbles.
    """
    nib = lambda i: F.ascii(F.substring("content_hash", i, 1))  # noqa: E731
    return blobs.select(
        "doc_id",
        "modality",
        "n_bytes",
        "content_hash",
        (64 + (nib(1) % 16) * 8).alias("width"),
        (64 + (nib(2) % 16) * 8).alias("height"),
        (F.floor(F.col("n_bytes") / 100) + 1).cast("int").alias("n_frames"),
    )


def extract_features(
    blobs: DataFrame, feature_dim: int = 8, real_decode: bool = False
) -> DataFrame:
    """Decode payloads and emit per-item features via ``mapInPandas``.

    The decode step is STUBBED (deterministic fake features from the payload
    digest); ``real_decode=True`` raises until media libs are available.
    Batch shape: streams Arrow batches, never materializes the partition.
    """
    if real_decode:
        raise NotImplementedError(
            "real media decoding needs PIL/av/soundfile — not in this environment; "
            "the mapInPandas plumbing below is the production shape"
        )

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, dims = [], []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).digest()
                feats.append(
                    [round(b / 255.0, 6) for b in digest[:feature_dim]]
                )
                dims.append((64 + digest[0] % 16 * 8, 64 + digest[1] % 16 * 8))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "content_hash": pdf["content_hash"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": (pdf["n_bytes"] // 100 + 1).astype("int32"),
                    "feature": feats,
                }
            )
            yield out

    return blobs.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)
