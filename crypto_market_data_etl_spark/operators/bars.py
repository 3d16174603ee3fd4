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

from .blocked import auto_block_span
from .candles import ohlcv_aggs


def with_cents(df: DataFrame, value_col: str, out: str = "cents") -> DataFrame:
    """Money double -> exact integer cents (inputs are 2-decimal money-like)."""
    return df.withColumn(out, F.round(F.col(value_col) * 100).cast("bigint"))


def blocked_cumsum(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    out: str = "cum",
    tiebreak: Sequence[str] = (),
    block_span: int | str | None = None,
    target_rows_per_block: int = 250_000,
) -> DataFrame:
    """Running per-key sum that survives hot-key skew.

    A plain ``sum().over(Window.partitionBy(key).orderBy(ts))`` serializes
    each key through ONE task — with a hot instrument carrying 70% of volume
    that single task is the whole job's critical path (measured: 20M rows,
    70% one key -> the window stage runs ~40x longer than the balanced hash
    aggs around it). Classic parallel prefix-sum fixes it in two phases:

    1. block-local running sums, partitioned by (key, time-block) — the hot
       key now splits across ``span``-sized blocks;
    2. per-(key, block) totals -> tiny per-key running offset (rows = number
       of blocks, not events) -> broadcast-joined back and added.

    Exact for integer inputs (addition is associative), so bar assignment is
    unchanged vs the single-window form — the tests assert equality.
    ``block_span=None`` keeps the single-window plan (right when keys are
    many and balanced: one shuffle instead of two). ``block_span="auto"``
    sizes blocks from the observed hottest-key rate (one tiny stats pass) so
    that its blocks hold ~``target_rows_per_block`` rows.
    """
    order = [ts_col, *tiebreak]
    if block_span == "auto":
        block_span = auto_block_span(df, key_cols, ts_col, target_rows_per_block)
    if block_span is None:
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(out, F.sum(value_col).over(w))

    blocked = df.withColumn("__blk", F.expr(f"{ts_col} div {block_span}"))
    w_local = (
        Window.partitionBy(*key_cols, "__blk")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = blocked.withColumn("__local_cum", F.sum(value_col).over(w_local))
    w_blocks = (
        Window.partitionBy(*key_cols)
        .orderBy("__blk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        blocked.groupBy(*key_cols, "__blk")
        .agg(F.sum(value_col).alias("__blk_total"))
        .withColumn(
            "__offset", F.sum("__blk_total").over(w_blocks) - F.col("__blk_total")
        )
        .drop("__blk_total")
    )
    return (
        local.join(F.broadcast(offsets), [*key_cols, "__blk"])
        .withColumn(out, F.col("__local_cum") + F.col("__offset"))
        .drop("__blk", "__local_cum", "__offset")
    )


def dollar_bars(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    notional_col: str,
    bar_size: float,
    tiebreak: Sequence[str] = (),
    price_col: str | None = None,
    block_span: int | str | None = None,
    reference_parity: bool = False,
) -> DataFrame:
    """Assign dollar-bar ids and aggregate OHLCV per (key, bar).

    Output: key_cols + bar_num, open/high/low/close (of ``price_col``,
    default = notional), notional (exact 2-dec sum), n_trades,
    bar_end_us (bigint µs of the bar's last event — as-of join anchor).
    ``block_span`` (time units of ``ts_col``) switches the cumsum to the
    skew-proof two-phase form — same exact result (see blocked_cumsum).

    Bar-boundary semantics: the default buckets by exact integer cents with
    ``(cum - 1) div size`` (the crossing event CLOSES its bar; reproducible
    on any engine because the cumsum is integer). This assumes the notional
    is 2-decimal money-like; generic ``price*volume`` notionals are rounded
    to cents first. ``reference_parity=True`` reproduces the reference's
    arithmetic instead (``processing_raw_data_from_gcs.py:118-128``): float
    cumsum + ``floor(cum / size)`` — the crossing event OPENS the next bar,
    and assignment inherits float addition-order sensitivity, so it is only
    bit-stable single-partition; the blocked decomposition is rejected for
    it (float addition is not associative).
    """
    price_col = price_col or notional_col
    bar_cents = int(round(bar_size * 100))
    if reference_parity:
        if block_span is not None:
            raise ValueError(
                "reference_parity uses a float cumsum, which does not "
                "block-decompose exactly; use the default cents mode for "
                "skew-proof blocking"
            )
        with_bars = blocked_cumsum(
            with_cents(df, notional_col, "notional_cents"),
            key_cols,
            ts_col,
            notional_col,
            out="cum_notional",
            tiebreak=tiebreak,
            block_span=None,
        ).withColumn("bar_num", F.floor(F.col("cum_notional") / F.lit(bar_size)))
    else:
        with_bars = blocked_cumsum(
            with_cents(df, notional_col, "notional_cents"),
            key_cols,
            ts_col,
            "notional_cents",
            out="cum_cents",
            tiebreak=tiebreak,
            block_span=block_span,
        ).withColumn("bar_num", F.expr(f"(cum_cents - 1) div {bar_cents}"))
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
