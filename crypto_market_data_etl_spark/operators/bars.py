"""Dollar bars: cumulative-notional bucketing + per-bar OHLCV (SURVEY §3.3).

Reference pipeline (``spark_src/processing_raw_data_from_gcs.py:108-141``):
``trade_dollar = price*volume`` -> global sort -> running cumsum per code ->
``dollar_bar_num = floor(cumsum / bar_size)`` -> groupBy(code, bar) OHLCV.

Engine design decisions (scale + determinism):

- The running cumsum is a window sum partitioned by instrument — the only
  per-key sequential dependency. It shuffles once on the key and sorts within
  partitions; no global ``orderBy`` (the reference's
  ``orderBy(code, timestamp)`` at ``:110`` forces a needless *global* range
  sort — window partitioning gives the same per-key order for free).
- Notional is accumulated as **integer cents** (``bigint``): integer addition
  is associative, so the bar assignment is bit-identical under any execution
  order / partitioning — a float cumsum can flip ``floor`` at bar boundaries
  depending on summation order (SURVEY §7.3 item 5).
- Hot-key skew (one instrument dominating volume) is inherent to the
  semantics — a running sum per key can't be split. Mitigation at 100 TB is
  range-bucketing by (key, coarse time) and carrying bucket offsets, which
  preserves exactness with integer cents; not needed at bench scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .candles import ohlcv_aggs


def with_cents(df: DataFrame, value_col: str, out: str = "cents") -> DataFrame:
    """Money double -> exact integer cents (inputs are 2-decimal money-like)."""
    return df.withColumn(out, F.round(F.col(value_col) * 100).cast("bigint"))


def dollar_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    notional_col: str,
    bar_size: float,
    tiebreak: Sequence[str] = (),
    price_col: str | None = None,
) -> DataFrame:
    """Assign dollar-bar ids and aggregate OHLCV per (key, bar).

    Output: key_cols + bar_num, open/high/low/close (of ``price_col``,
    default = notional), notional (exact 2-dec sum), n_trades,
    bar_end_us (bigint µs of the bar's last event — as-of join anchor).
    """
    price_col = price_col or notional_col
    bar_cents = int(round(bar_size * 100))
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_bars = (
        with_cents(df, notional_col, "notional_cents")
        .withColumn("cum_cents", F.sum("notional_cents").over(w))
        .withColumn("bar_num", F.expr(f"(cum_cents - 1) div {bar_cents}"))
    )
    # (cum-1) div size: the event that crosses a boundary closes its bar
    # (reference floor(cum/size) puts the crossing event in the next bar; both
    # are valid bar semantics — ours keeps bar 0 starting at the first event).
    return (
        with_bars.groupBy(*key_cols, "bar_num")
        .agg(
            *ohlcv_aggs(price_col, ts_col, tiebreak, volume_cents_col="notional_cents"),
            F.max(F.col(ts_col)).alias("bar_end_us"),
        )
        .withColumnRenamed("volume", "notional")
    )
