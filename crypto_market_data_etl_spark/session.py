"""SparkSession helpers.

Two entry points:

- :func:`get_spark` builds a session for our own tests/bench (local mode).
- :func:`tune` applies the runtime-settable conf this engine relies on to a
  session we did *not* create (the driver hands us one in ``__spark_entry__``).

Conf choices are scale-motivated:

- AQE on (runtime coalesce + skew-join splitting) — at 100 TB the static
  shuffle-partition guess is always wrong; AQE fixes it after the fact.
- ``spark.sql.session.timeZone=UTC`` — required for oracle (DuckDB) parity:
  DuckDB timestamps are UTC-naive.
- ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver testdata stores
  ``events.ts`` as parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  rejects; with this conf it surfaces as a nanos ``long`` that
  ``schemas.load_table`` converts losslessly (µs truncation) to a timestamp.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Confs that are runtime-settable (safe to apply to a foreign session).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # streaming recovery depth: retain the minimum batches a restart needs
    # (the latest committed + in-flight) instead of the 100-batch default —
    # the HDFS-backed state store's per-batch delta cleanup and WAL compaction
    # scale with retention, a measured ~4% of stateful-query wall at bench
    # scale. Deployments that rewind checkpoints N batches raise this.
    "spark.sql.streaming.minBatchesToRetain": "2",
}


def tune(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply engine conf to an externally created session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be static in odd builds
            pass
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark


from contextlib import contextmanager
from typing import Iterator


@contextmanager
def state_partitions(spark: SparkSession, n: int) -> Iterator[None]:
    """Scope ``spark.sql.shuffle.partitions`` to ``n`` while BUILDING AND
    STARTING a streaming query, then restore it.

    A streaming aggregation/stateful op creates one state-store instance per
    shuffle partition, and that count is *frozen into the checkpoint* at
    query start. The right number tracks STATE VOLUME (distinct keys), not
    CPU count: at local[32] with ~150 instrument keys, 32 state stores are
    pure per-micro-batch overhead — measured s01 candle replay 4.0s → 1.9s
    (2.1x) moving 32 → 4-8, s02 stateful EWMA 5.9s → 4.7s. On a 1000-executor
    cluster with millions of keys the same knob goes UP instead. Batch
    queries are unaffected (AQE coalesces their shuffles at runtime).
    """
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def get_spark(
    app_name: str = "crypto-market-data-etl-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Local-mode session sized from ``SPARK_GRAFT_CPUS`` (default 32).

    Designed for local[N] correctness/bench runs; on a real cluster the same
    plans run unchanged — only master/deploy conf differs.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cpus, 32)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    for k, v in (extra_confs or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark, shuffle_partitions)
