"""Kafka source/sink builders (SURVEY §2.1 S1/S2/S3/S7).

No Kafka broker exists in the test environment, so these are *builders*: they
produce fully-configured ``DataStreamReader``/``DataFrameReader`` objects (or
option dicts, unit-testable without a broker). The semantics they encode:

- S1 streaming source: subscribe topic(s), unbounded
  (reference ``kafka_upbit_realtime_processing.py:79-83``).
- S2 bounded batch source: exact per-partition ``[start, end)`` offsets as
  JSON literals (``kafka_to_gcs_by_spark_batch.py:81-87``).
- S3 offsets-for-timestamp: the reference resolves offsets with an external
  ``KafkaConsumer.offsets_for_times`` + Airflow XCom
  (``dags_spark_submit_bash_operator_batch_kafka_to_gcs.py:21-56``); Spark's
  built-in ``startingOffsetsByTimestamp`` / ``endingOffsetsByTimestamp``
  options subsume that whole hop — no external consumer, no orchestration
  dependency, and the broker does the timestamp->offset binary search.
- S7 streaming sink: JSON-serialized rows to a topic, checkpointed
  (``kafka_upbit_realtime_processing.py:130-143``).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def kafka_offsets_json(topic: str, partition_offsets: dict[int, int]) -> str:
    """Per-partition offsets JSON literal for S2 (reference builds these by
    hand at ``kafka_to_gcs_by_spark_batch.py:85-86``)."""
    return json.dumps({topic: {str(p): o for p, o in partition_offsets.items()}})


def kafka_timestamps_json(topic: str, partition_ts_ms: dict[int, int]) -> str:
    """Per-partition timestamp (epoch ms) JSON for the ByTimestamp options."""
    return json.dumps({topic: {str(p): t for p, t in partition_ts_ms.items()}})


def kafka_source_options(
    brokers: str,
    topic: str,
    starting_offsets: str | None = None,
    ending_offsets: str | None = None,
    starting_ts: str | None = None,
    ending_ts: str | None = None,
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool | None = None,
    **extra: str,
) -> dict[str, str]:
    """Complete Kafka source option dict — the reference's operational
    envelope as first-class knobs (unit-testable without a broker):

    - ``max_offsets_per_trigger`` → ``maxOffsetsPerTrigger``: per-micro-batch
      record cap = streaming backpressure. Without it a restart after
      downtime reads the whole backlog into ONE batch (the reference's
      15 s-trigger realtime job would OOM on a weekend's backlog).
    - ``min_partitions`` → ``minPartitions``: fan a hot topic-partition out
      to more Spark tasks than Kafka partitions — the knob for the
      3-symbols-on-few-partitions skew the reference runs with.
    - ``fail_on_data_loss`` → ``failOnDataLoss``: whether expired-retention
      gaps abort the query. The reference's 5-minute archival cadence
      (``kafka_to_gcs_by_spark_batch.py:81-87``) reads offset bands resolved
      an hour earlier — set False to survive retention races, True (default)
      for exactly-once audit jobs.
    """
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
    }
    if starting_offsets is not None:
        opts["startingOffsets"] = starting_offsets
    if ending_offsets is not None:
        opts["endingOffsets"] = ending_offsets
    if starting_ts is not None:
        opts["startingOffsetsByTimestamp"] = starting_ts
    if ending_ts is not None:
        opts["endingOffsetsByTimestamp"] = ending_ts
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    if fail_on_data_loss is not None:
        opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    opts.update(extra)
    return opts


def kafka_stream_reader(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
    **kwargs,
):
    """S1: streaming Kafka reader (returns the configured DataStreamReader;
    call ``.load()`` where a broker exists). Accepts every
    :func:`kafka_source_options` knob."""
    opts = kafka_source_options(
        brokers, topic, starting_offsets=starting_offsets, **kwargs
    )
    return spark.readStream.format("kafka").options(**opts)


def kafka_batch_reader(
    spark: SparkSession,
    brokers: str,
    topic: str,
    **kwargs,
):
    """S2/S3: bounded Kafka reader by offsets or by timestamps (built-in
    replacement for the reference's external offset resolution). Accepts
    every :func:`kafka_source_options` knob."""
    opts = kafka_source_options(brokers, topic, **kwargs)
    return spark.read.format("kafka").options(**opts)


def kafka_stream_writer(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    trigger_seconds: int = 15,
    output_mode: str = "update",
):
    """S7: Kafka streaming sink builder (df must already have a ``value``
    column — see ``functions.derive.to_kafka_value``). One checkpoint dir per
    query (reference bug note: a shared checkpoint silently drops one query —
    ``kafka_to_gcs_by_spark_streaming.py:72-76``)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(processingTime=f"{trigger_seconds} seconds")
    )
