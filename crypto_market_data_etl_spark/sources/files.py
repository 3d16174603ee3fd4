"""Partitioned file IO (SURVEY §2.1 S4/S5/S6).

The reference archives raw JSON partitioned by (processing_date, code) and
reads it back with a path glob (``processing_raw_data_from_gcs.py:83-84``,
``kafka_to_gcs_by_spark_batch.py:94-98``). Our engine keeps the partitioning
scheme but uses **Parquet + partition-column predicates**: the glob becomes a
``WHERE processing_date = d`` that Catalyst turns into real partition pruning
(plus column pruning / predicate pushdown that JSON can't do). At 100 TB the
difference is reading one date directory vs listing-and-parsing everything.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import load_schema, wrapped


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str] = ("processing_date", "code"),
    mode: str = "append",
    fmt: str = "parquet",
) -> None:
    """S5/S6 batch form: partitioned append write.

    Reference: ``kafka_to_gcs_by_spark_batch.py:94-98`` (JSON there; Parquet
    here). Partition columns become Hive-style directories — the reader's
    pruning key.
    """
    df.write.partitionBy(*partition_cols).mode(mode).format(fmt).save(path)


def read_partitioned(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
    **predicates: str,
) -> DataFrame:
    """S4: schema-checked partitioned read with partition-predicate pruning.

    ``read_partitioned(spark, p, processing_date="2024-01-02")`` replaces the
    reference's glob ``.../processing_date={d}/**/*.json`` — same scan
    reduction, but through the catalog so Catalyst proves the pruning
    (look for ``PartitionFilters`` in ``.explain``).
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    for col, val in predicates.items():
        df = df.filter(df[col] == val)
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    partition_cols: Sequence[str] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
    path: str | None = None,
) -> None:
    """Bucketed (hash-clustered) table write — the co-located-join layout.

    At 100 TB the dominant cost of a repeated fact-to-fact equi-join (trades
    x orderbooks on ``code``, corpus x signature tables on ``doc_id``) is
    re-shuffling both sides every query. Bucketing pays that shuffle ONCE at
    write time: rows are hash-clustered into ``n_buckets`` files per
    partition by ``bucket_cols``, and every later join/aggregation on those
    keys reads co-located buckets — Catalyst drops the Exchange on both
    sides (assert: no ``Exchange`` above the scans in ``.explain``) when
    bucket counts match. ``sort_cols`` additionally pre-sorts within
    buckets, turning SortMergeJoin's per-query sort into a read-time no-op.

    Bucketing requires the catalog (``saveAsTable``) — bucket metadata lives
    in the table definition, not the directory layout. Reads go through
    ``spark.table(name)``.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if path is not None:  # external table: data lives at `path`, not the warehouse
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_raw_archive(
    spark: SparkSession, path: str, topic: str, fmt: str = "json", **predicates: str
) -> DataFrame:
    """Read the wrapped raw archive ({"data": {...}}) for one topic.

    Reference: ``processing_raw_data_from_gcs.py:80-84`` — explicit wrapped
    StructType, never inferred.
    """
    return read_partitioned(
        spark, path, schema=wrapped(load_schema(topic)), fmt=fmt, **predicates
    )
