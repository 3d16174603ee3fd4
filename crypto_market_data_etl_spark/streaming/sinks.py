"""Streaming sinks (SURVEY §2.8 S6/S8/T4/T5/T7/T8).

- :func:`foreach_batch_parquet_sink` — exactly-once partitioned parquet via
  ``foreachBatch``: each micro-batch overwrites its own ``batch_id=N``
  directory, so a replayed batch (restart between sink write and checkpoint
  commit) lands in the same directory instead of duplicating rows. This is
  the standard idempotent-sink recipe for sinks without transactional
  support.
- :func:`file_stream_writer` — S6, the reference's native streaming file
  sink (``kafka_to_gcs_by_spark_streaming.py:74-88``: file format +
  ``partitionBy(processing_date, code)`` + per-query checkpoint + a
  30-minute processing-time trigger). Spark's file sink commits each batch
  atomically through its ``_spark_metadata`` log, so it is already
  exactly-once on its own; prefer it for plain archival. foreachBatch stays
  the tool when the write needs to fan out or target non-file systems.
- :func:`console_stream_writer` — S8, the debug console sink
  (``tests/spark_test_src/kafka_spark_consumer_test_code.py:119-127``).

The Kafka sink builder (S7) lives in ``sources/kafka.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def foreach_batch_parquet_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_cols: tuple[str, ...] = (),
    output_mode: str = "update",
):
    """Idempotent micro-batch parquet sink; returns the DataStreamWriter
    (call ``.start()``). Read the result with
    ``spark.read.parquet(path)`` — ``batch_id=N`` becomes a partition column."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = f"{path}/batch_id={batch_id}"
        writer = batch_df.write.mode("overwrite")
        if partition_cols:
            writer = writer.partitionBy(*partition_cols)
        writer.parquet(out)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )


def file_stream_writer(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    partition_cols: Sequence[str] = (),
    trigger_seconds: int | None = None,
):
    """S6: native streaming file sink builder; returns the DataStreamWriter
    (call ``.start()``).

    Mirrors the reference's archival query
    (``kafka_to_gcs_by_spark_streaming.py:74-88``) in Spark-native terms:
    ``writeStream.format(parquet|json).partitionBy(...)`` with a dedicated
    checkpoint per query (the reference's own bug note: sharing one
    checkpoint between two queries silently drops one) and an optional
    processing-time trigger (the reference uses 30 minutes). File sinks
    support append mode only; exactly-once comes from the sink's
    ``_spark_metadata`` commit log. At scale, partition by low-cardinality
    columns (date, instrument) — one directory per value per micro-batch.
    """
    writer = (
        stream_df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer


def console_stream_writer(
    stream_df: DataFrame,
    output_mode: str = "append",
    trigger_seconds: int | None = None,
    truncate: bool = True,
    num_rows: int = 20,
):
    """S8: console sink builder for interactive debugging; returns the
    DataStreamWriter (call ``.start()``).

    Reference: ``kafka_spark_consumer_test_code.py:119-127`` (append mode,
    10-second processing-time trigger). Never use in production — it
    collects every batch to the driver.
    """
    writer = (
        stream_df.writeStream.format("console")
        .option("truncate", str(truncate).lower())
        .option("numRows", str(num_rows))
        .outputMode(output_mode)
    )
    if trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer
