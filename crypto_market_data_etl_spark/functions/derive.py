"""Projection / scalar derivation operators (reference SURVEY.md §2.2 P1-P13).

Every function is a pure ``DataFrame -> DataFrame`` (or returns a Column) built
only from ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd; no
Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_payload(df: DataFrame, schema: T.StructType, value_col: str = "value") -> DataFrame:
    """P1+P2: Kafka ``value`` binary -> string -> typed struct ``data``.

    Reference: ``spark_src/kafka_upbit_realtime_processing.py:85-86`` —
    ``selectExpr("CAST(value AS STRING)")`` then ``from_json(...).alias("data")``.
    """
    return df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("data"), "*"
    ).drop(value_col)


def flatten_payload(df: DataFrame, *fields: str, data_col: str = "data") -> DataFrame:
    """P3: nested-field projection flattening the parsed struct.

    Reference: ``spark_src/kafka_upbit_realtime_processing.py:87-89``.
    Selecting only the needed fields immediately after the parse keeps the
    column-pruning explicit (Catalyst would push it down anyway).
    """
    cols = [F.col(f"{data_col}.{f}").alias(f) for f in fields] if fields else [
        F.col(f"{data_col}.*")
    ]
    return df.select(*cols)


def with_event_time(
    df: DataFrame, ts_ms_col: str = "timestamp", out: str = "server_datetime", exact: bool = True
) -> DataFrame:
    """P6: epoch-ms long -> event-time timestamp.

    Reference (``kafka_upbit_realtime_processing.py:93-94``) uses
    ``to_timestamp(from_unixtime(ts/1000))`` which *truncates to seconds*;
    ``exact=True`` (our default) keeps millisecond precision via
    ``timestamp_millis``. Pass ``exact=False`` for bug-for-bug reference
    semantics (SURVEY §7.3 item 4).
    """
    if exact:
        return df.withColumn(out, F.timestamp_millis(F.col(ts_ms_col)))
    return df.withColumn(
        out, F.to_timestamp(F.from_unixtime(F.col(ts_ms_col) / F.lit(1000)))
    )


def with_latency(
    df: DataFrame,
    arrive_s_col: str = "arrive_time",
    ts_ms_col: str = "timestamp",
    out: str = "time_diff",
) -> DataFrame:
    """P5: collector-receipt latency in seconds.

    Reference: ``kafka_upbit_realtime_processing.py:91-92`` —
    ``time_diff = arrive_time - timestamp/1000``.
    """
    return df.withColumn(out, F.col(arrive_s_col) - F.col(ts_ms_col) / F.lit(1000.0))


def best_of_book(df: DataFrame, units_col: str = "orderbook_units") -> DataFrame:
    """P4: best-of-book projection from the depth array (element 0).

    Reference: ``kafka_upbit_realtime_processing.py:95-97,110-112`` —
    ``orderbook_units[0]["bid_size"]`` etc. ``element_at(.., 1)`` is 1-based.
    """
    u = F.element_at(F.col(units_col), 1)
    return (
        df.withColumn("best_ask_price", u.getField("ask_price"))
        .withColumn("best_bid_price", u.getField("bid_price"))
        .withColumn("best_ask_size", u.getField("ask_size"))
        .withColumn("best_bid_size", u.getField("bid_size"))
    )


def with_obi(
    df: DataFrame,
    bid_size: str = "best_bid_size",
    ask_size: str = "best_ask_size",
    out: str = "obi",
) -> DataFrame:
    """P7: order-book imbalance ratio ``bid_size / ask_size``.

    Reference: ``kafka_upbit_realtime_processing.py:95-97``.
    """
    return df.withColumn(out, F.col(bid_size) / F.col(ask_size))


def signed_volume(
    side_col: str = "ask_bid",
    vol_col: str = "trade_volume",
    positive_when: str = "BID",
) -> Column:
    """P8/A5: signed volume for trade-flow imbalance.

    Reference: ``kafka_upbit_realtime_processing.py:186-190`` —
    ``when(ask_bid == "BID", vol).otherwise(-vol)``; summed per window = TFI.
    """
    return F.when(F.col(side_col) == positive_when, F.col(vol_col)).otherwise(
        -F.col(vol_col)
    )


def dollar_bucket(cumsum_col: str, bar_size: float) -> Column:
    """P12: dollar-bar bucket id ``floor(cumsum / bar_size)`` as int.

    Reference: ``spark_src/processing_raw_data_from_gcs.py:118-120``.
    NOTE: for oracle-reproducible bucketing over money-like values, prefer the
    integer-cents variant in ``operators.bars`` (float cumsum order is not
    associative; an integer cumsum is exact under any execution order).
    """
    return F.floor(F.col(cumsum_col) / F.lit(bar_size)).cast(T.IntegerType())


def to_kafka_value(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """P13: serialize whole row to a JSON-string ``value`` for the Kafka sink.

    Reference: ``kafka_to_kafka_by_spark_for_druid.py:134-137`` —
    ``to_json(struct(*df.columns)).alias("value")``.
    """
    cols = [F.to_json(F.struct(*df.columns)).alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)
