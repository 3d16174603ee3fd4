"""Streaming ANN index maintenance: keep an IVF+PQ index current as the
corpus grows, without retraining and without ever re-scanning old vectors.

The batch index build (:func:`..operators.similarity.ivfpq_index`) is a
single stateless map-side pass — assignment (argmax cosine against the
broadcast coarse centroids) fused with PQ encoding. Stateless map-side is
exactly the class of transformation Structured Streaming runs unchanged,
so the streaming form is the SAME operator applied to a ``readStream``
micro-batch flow and appended to the index table through the native file
sink (exactly-once via the sink's ``_spark_metadata`` commit log; S6
semantics, ``sinks.file_stream_writer``).

Contract — what is frozen and what moves:

- **Frozen**: coarse centroids, PQ codebooks, ``center_vec`` — the trained
  artifacts. Every arriving vector is encoded against the same artifacts
  the resident corpus used, so a query probing cell ``c`` ranks old and
  new members under one ADC geometry. This is the standard
  ingest-vs-retrain split (FAISS/SCaNN deployments do the same): codebook
  drift is handled by a PERIODIC batch retrain, for which
  ``kmeans_train(init=current_centroids)`` warm-starts Lloyd from the
  serving centroids and the index rebuilds in one corpus pass.
- **Moving**: the index table — ``(vec_id, c_id, codes)`` rows appended
  per micro-batch. Readers (:func:`..operators.similarity.ivfpq_topk`)
  see a consistent snapshot per batch read; at 100 TB the sink partitions
  by ``c_id`` bucket if single-cell scans matter, and compaction is a
  plain parquet rewrite because rows are immutable.

Cost shape at scale: per arriving vector ONE broadcast matmul row against
(n_cells + m*k) centroids — identical to the batch build's per-row cost —
and zero shuffles; the stream never touches the resident index. Query
cost is unchanged (the index just has more rows per cell).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import ivfpq_index
from .sinks import file_stream_writer


def stream_ivfpq_index(
    stream_df: DataFrame,
    coarse_centroids: DataFrame,
    codebooks: DataFrame,
    path: str,
    checkpoint: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trigger_seconds: int | None = None,
    **index_kwargs,
):
    """Append-only streaming IVF+PQ index maintenance; returns the
    DataStreamWriter (call ``.start()``).

    ``stream_df`` is a streaming DataFrame with ``(id_col, vec_col)``;
    ``coarse_centroids`` / ``codebooks`` / ``index_kwargs``
    (``center_vec``, ``residual``, ``assign_r``, ``normalize``) are
    exactly :func:`..operators.similarity.ivfpq_index`'s — the streamed
    rows are bit-identical to what the batch build would emit for the
    same vectors (pytest-asserted), so a batch-built index and its
    streamed continuation are one seamless table.

    NULL vectors are dropped here (the batch build's corpora are already
    vector-complete; a stream has no such guarantee and a NULL row would
    poison its whole Arrow batch).
    """
    encoded = ivfpq_index(
        stream_df.filter(F.col(vec_col).isNotNull()),
        coarse_centroids,
        codebooks,
        id_col=id_col,
        vec_col=vec_col,
        **index_kwargs,
    )
    return file_stream_writer(
        encoded, path, checkpoint, trigger_seconds=trigger_seconds
    )
