"""File-backed mock of the Spark Kafka source/sink contract (SURVEY §2.1).

No Kafka broker (or connector jar) exists in the test environment, so the
builders in :mod:`.kafka` can't be driven end-to-end. This module implements
the *contract* the engine actually depends on — the Kafka source's output
relation — on top of partitioned Parquet, so every reference lifecycle
(S1 stream -> parse -> candle, S2 bounded read -> archive) runs and is
testable without a broker:

- the log is a Parquet dataset with EXACTLY the Kafka source schema
  (key/value binary, topic, partition, offset, timestamp, timestampType);
- :func:`read_kafka_log` honors S2's per-partition ``[start, end)`` offset
  bands (``kafka_to_gcs_by_spark_batch.py:81-87``), including Kafka's -2
  (earliest) / -1 (latest) sentinels, and accepts the same JSON literals
  ``kafka.kafka_offsets_json`` builds;
- :func:`mock_offsets_for_times` mirrors ``KafkaConsumer.offsets_for_times``
  (S3, ``dags_spark_submit_bash_operator_batch_kafka_to_gcs.py:21-56``):
  first offset per partition with timestamp >= t;
- :func:`read_kafka_log_stream` exposes the log as a *streaming* DataFrame
  (S1 shape) via the file source — micro-batched, watermark/window capable.

Scale notes: the log is written ``partitionBy("partition")`` so per-partition
offset predicates become directory pruning + parquet min/max pushdown on
``offset`` — the same "read exactly the band, nothing more" property the real
Kafka source gives (SURVEY §4 row 1). Offset assignment in
:func:`write_kafka_log` uses a per-partition row_number (one shuffle); that is
the producer edge (S9), not engine hot path.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

EARLIEST = -2  # Kafka sentinel: first available offset
LATEST = -1  # Kafka sentinel: one past the last available offset

KAFKA_SOURCE_FIELDS = [
    T.StructField("key", T.BinaryType()),
    T.StructField("value", T.BinaryType()),
    T.StructField("topic", T.StringType()),
    T.StructField("partition", T.IntegerType()),
    T.StructField("offset", T.LongType()),
    T.StructField("timestamp", T.TimestampType()),
    T.StructField("timestampType", T.IntegerType()),
]
KAFKA_SOURCE_SCHEMA = T.StructType(KAFKA_SOURCE_FIELDS)


def write_kafka_log(
    values: DataFrame,
    path: str,
    topic: str,
    n_partitions: int = 1,
    key_col: str | None = None,
    ts_ms: Column | str | None = None,
) -> None:
    """Producer edge (S9 analog): append-structure a ``value``-carrying
    DataFrame into a Kafka-shaped Parquet log.

    Partition routing follows Kafka's keyed default: hash(key) % n when
    ``key_col`` is given, else hash(value). Offsets are dense 0-based per
    partition in ``ts_ms`` order (ties broken by value bytes) — the total
    order a single-producer topic would have. ``timestamp`` is CreateTime
    (timestampType=0) from ``ts_ms`` (epoch millis), or epoch 0 if absent.
    """
    route_on = F.col(key_col) if key_col else F.col("value")
    part = F.pmod(F.xxhash64(route_on), F.lit(n_partitions)).cast("int")
    if ts_ms is None:
        ts = F.timestamp_millis(F.lit(0))
    else:
        ts = F.timestamp_millis(F.col(ts_ms).cast("long") if isinstance(ts_ms, str) else ts_ms.cast("long"))
    staged = values.select(
        (F.col(key_col).cast("binary") if key_col else F.lit(None).cast("binary")).alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        ts.alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    w = Window.partitionBy("partition").orderBy("timestamp", "value")
    log = staged.withColumn("offset", F.row_number().over(w).cast("long") - 1).select(
        [f.name for f in KAFKA_SOURCE_FIELDS]
    )
    log.write.mode("append").partitionBy("partition").parquet(path)


def _parse_bounds(bounds: str | dict | None, topic: str) -> dict[int, int] | None:
    """Accept {partition: offset} dicts or the Kafka-source JSON literal
    ``{"topic": {"0": 5}}`` (what ``kafka.kafka_offsets_json`` produces)."""
    if bounds is None:
        return None
    if isinstance(bounds, str):
        parsed = json.loads(bounds)
        if topic not in parsed:
            raise ValueError(f"offsets JSON {bounds!r} lacks topic {topic!r}")
        bounds = parsed[topic]
    return {int(p): int(o) for p, o in bounds.items()}


def read_kafka_log(
    spark: SparkSession,
    path: str,
    topic: str,
    starting_offsets: str | dict | None = None,
    ending_offsets: str | dict | None = None,
) -> DataFrame:
    """S2: bounded batch read of the log — per-partition ``[start, end)``.

    Kafka-source semantics: when explicit offsets are given, only the listed
    partitions are read; -2 means earliest, -1 (in ending) means latest.
    With no bounds the whole topic is read. Predicates land on the
    ``partition`` directory column and the ``offset`` parquet stats —
    scan-range pushdown, not a full-log read.
    """
    # Spark surfaces directory-partition columns last; restore contract order
    df = (
        spark.read.schema(KAFKA_SOURCE_SCHEMA)
        .parquet(path)
        .select([f.name for f in KAFKA_SOURCE_FIELDS])
        .filter(F.col("topic") == topic)
    )
    start = _parse_bounds(starting_offsets, topic)
    end = _parse_bounds(ending_offsets, topic)
    if start is None and end is None:
        return df
    parts = sorted(set(start or {}) | set(end or {}))
    conds = None
    for p in parts:
        c = F.col("partition") == p
        s = (start or {}).get(p, EARLIEST)
        if s not in (EARLIEST, LATEST):
            c = c & (F.col("offset") >= s)
        e = (end or {}).get(p, LATEST)
        if e not in (EARLIEST, LATEST):
            c = c & (F.col("offset") < e)
        conds = c if conds is None else (conds | c)
    return df.filter(conds)


def mock_offsets_for_times(
    spark: SparkSession, path: str, topic: str, ts_ms: int
) -> dict[int, int]:
    """S3: ``KafkaConsumer.offsets_for_times`` — smallest offset per partition
    whose timestamp >= ts_ms (partitions with no such record are absent,
    matching the None the real consumer returns)."""
    rows = (
        spark.read.schema(KAFKA_SOURCE_SCHEMA)
        .parquet(path)
        .filter((F.col("topic") == topic) & (F.col("timestamp") >= F.timestamp_millis(F.lit(ts_ms))))
        .groupBy("partition")
        .agg(F.min("offset").alias("o"))
        .collect()
    )
    return {r["partition"]: r["o"] for r in rows}


def read_kafka_log_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """S1: the log as a STREAMING DataFrame with the Kafka source shape.

    File-source micro-batching stands in for broker polling; downstream code
    (parse -> watermark -> window -> sink) is identical to what a real
    ``readStream.format("kafka")`` feeds.
    """
    reader = spark.readStream.schema(KAFKA_SOURCE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).select([f.name for f in KAFKA_SOURCE_FIELDS])
