"""Streaming candle / stats queries (SURVEY §2.8, §3.1).

The same aggregate expressions as the batch operators
(``operators.candles``), behind ``withWatermark`` + ``F.window`` — batch and
streaming share one semantic definition, which is the point of the rebuild
(the reference duplicates the agg lists per file,
``kafka_to_kafka_by_spark_for_druid.py:99-132`` vs
``kafka_upbit_realtime_processing.py:107-118,164-193``).

Watermark notes (T1): late rows beyond the delay are dropped (reference
behavior — watermark-discard only, no side output). In append mode a window
only emits once the watermark passes its end, so tests must advance event
time past the last window (tests use ``processAllAvailable`` + a final
future-dated row, or update mode).

State-scale note (T3): a sliding window holds width/slide overlapping panes
per key in the state store — the reference's 10min/15s config is 40x
amplification (SURVEY §7.3 item 1). Prefer tumbling-at-slide-granularity +
batch rollup when panes explode.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.candles import merged_pane_stats_aggs, ohlcv_aggs


def stream_candles(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    price_col: str,
    width_seconds: int = 10,
    watermark: str = "10 seconds",
    tiebreak: Sequence[str] = (),
    volume_cents_col: str | None = None,
) -> DataFrame:
    """T1+T2+A1-A5: watermarked tumbling OHLCV candles on a streaming DF.

    Reference: the druid path — 10 s tumbling window, 10 s watermark
    (``kafka_to_kafka_by_spark_for_druid.py:99-132``).
    """
    w = F.window(F.col(ts_col), f"{width_seconds} seconds")
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *key_cols)
        .agg(*ohlcv_aggs(price_col, ts_col, tiebreak, volume_cents_col))
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"), "*")
        .drop("w")
    )


def stream_sliding_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    width_seconds: int = 600,
    slide_seconds: int = 15,
    watermark: str = "10 minutes",
) -> DataFrame:
    """T1+T3+A6-A7: watermarked sliding mean/stddev stats.

    Reference: the realtime path — window("10 minute", "15 second"),
    10-minute watermark (``kafka_upbit_realtime_processing.py:107-118``).
    """
    w = F.window(F.col(ts_col), f"{width_seconds} seconds", f"{slide_seconds} seconds")
    n = F.count(F.lit(1))
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *key_cols)
        .agg(
            n.alias("n_events"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
            F.when(n > 1, F.round(F.stddev_samp(value_col), 4)).alias("stddev_value"),
        )
        .select(F.col("w.start").alias("w_start"), "*")
        .drop("w")
    )


def stream_sliding_stats_paned(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    cents_col: str,
    width_seconds: int = 600,
    slide_seconds: int = 15,
    watermark: str = "10 minutes",
) -> DataFrame:
    """T3 at scale: streaming sliding stats via chained windowed aggregations
    (the pane decomposition of ``operators.candles.sliding_stats_paned``,
    expressed with Spark ≥3.5 multiple-stateful-operator support).

    Stage 1 keeps TUMBLING panes of ``slide_seconds`` in the state store —
    one (pane, key) row instead of width/slide overlapping windows per event
    (40x at the reference's 10min/15s config, SURVEY §7.3 item 1). Stage 2
    re-windows the emitted pane rows with ``F.window_time`` (pane_end − 1µs,
    which lands in exactly the width/slide sliding windows that contain the
    pane) and merges the exact integer partials. Shuffle amplification moves
    from raw events to ~1 row per (pane, key).

    Columns match the batch pane path bit-for-bit (shared
    ``merged_pane_stats_aggs``) — asserted in tests/test_streaming.py.
    """
    if width_seconds % slide_seconds:
        raise ValueError("width_seconds must be a multiple of slide_seconds")
    c = F.col(cents_col)
    panes = (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), f"{slide_seconds} seconds").alias("pane"), *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(c).alias("sum_c"),
            F.sum(c * c).alias("sumsq_c"),
        )
    )
    w = F.window(
        F.window_time("pane"), f"{width_seconds} seconds", f"{slide_seconds} seconds"
    )
    return (
        panes.groupBy(w.alias("w"), *key_cols)
        .agg(*merged_pane_stats_aggs())
        .select(
            F.col("w.start").alias("w_start"),
            *key_cols,
            "n_events",
            "avg_value",
            "stddev_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """T4-T7 test helper: drive a streaming DF through a memory sink
    synchronously (processAllAvailable); returns the StreamingQuery.

    Caller reads results with ``spark.sql(f"SELECT * FROM {name}")`` and must
    ``.stop()`` the query.
    """
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(processingTime="1 second")
        .start()
    )
    q.processAllAvailable()
    return q
