"""Streaming sinks beyond the built-ins (SURVEY §2.8 T5/T7/T8).

:func:`foreach_batch_parquet_sink` — exactly-once partitioned parquet via
``foreachBatch``: each micro-batch overwrites its own ``batch_id=N``
directory, so a replayed batch (restart between sink write and checkpoint
commit) lands in the same directory instead of duplicating rows. This is the
standard idempotent-sink recipe for sinks without transactional support.

The plain streaming file/Kafka sinks are builders in ``sources/`` (S6/S7);
the console sink (S8, ``tests/spark_test_src/kafka_spark_consumer_test_code.py:119-127``)
is a one-liner: ``df.writeStream.format("console")``.
"""

from __future__ import annotations

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
