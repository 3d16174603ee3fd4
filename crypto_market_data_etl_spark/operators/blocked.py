"""Skew-proof two-phase forms of per-key sequential window operators.

A window ``partitionBy(key).orderBy(ts)`` serializes each key through one
task. For running sums :func:`.bars.blocked_cumsum` already splits hot keys
into time blocks (parallel prefix-sum); this module holds the shared
block-sizing heuristic plus the same treatment for ``lag`` — the other
per-key-sequential primitive the reference leans on (SURVEY §2.5 W3,
``kafka_upbit_realtime_processing.py:121-122``).

``lag(col, 1)`` only couples a row to its immediate predecessor, so the
blocked form is exact (not an approximation): lag within ``(key, block)``
partitions, then fill each block's first row from the previous block's last
row, carried through a tiny per-(key, block) summary (rows = number of
blocks, not events).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Measured crossover for the lag/EWMA blocked forms (local[32], parsed
# orderbook fixtures). The crossover is box-sensitive (round-over-round VM
# swings move single-key window walls ~2x), so the threshold is set by the
# PENALTY ASYMMETRY across the committed rungs rather than one box's
# crossover point: blocking too early has cost at most 1.5x (round-1:
# hottest key 2.1M rows, plain 15.5s vs blocked 23.2s), while blocking too
# late cost 2.5x at 2.8M hot rows (committed SCALE_r11.json market.8M,
# best-of-3: forced blocked 5.93s vs forced plain 15.01s) and 3.4x at 7M
# (SCALE_r11 market.20M: plain 37.28s vs blocked 10.92s; r10's rung read
# 3.7x). 2.5M splits the measured bands: below it plain always won
# (0.7M hot, SCALE_r11 market.2M: forced plain 5.6s vs forced blocked
# 5.9s); above it blocked has won on every box measured since r10.
# blocked_cumsum keeps its own lower
# threshold (= target): a JVM window sum has far less two-phase overhead
# than the pandas passes here.
LAG_EWMA_MIN_ROWS_TO_BLOCK = 2_500_000


#: auto_block_span memo: semantic-hash of the probed plan (+ knobs) ->
#: resolved span. Same contract as asof._DENSITY_MEMO: the probe is table
#: statistics — repeated resolutions of one plan in a session (bench
#: best-of-N, a job calling several blocked operators on the same input)
#: pay the stats pass once.
_SPAN_MEMO: dict[tuple, int | None] = {}


def clear_span_memo() -> None:
    """Invalidate :func:`auto_block_span`'s per-plan memo (e.g. after
    overwriting a path the probed plan reads)."""
    _SPAN_MEMO.clear()


def auto_block_span(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    target_rows_per_block: int = 250_000,
    min_rows_to_block: int | None = None,
) -> int | None:
    """Pick a time-block span so the hottest key's blocks hold about
    ``target_rows_per_block`` rows (one tiny stats pass: per-key counts +
    global ts range). Returns ``None`` when the hottest key is below
    ``min_rows_to_block`` (default: ``target_rows_per_block``) — there the
    single-window plan's one shuffle beats the two-phase overhead.

    Probe cost is bounded two ways (the knob must stay affordable at the
    scale where the answer is "don't block"): a ``limit``-gated row-count
    pre-check settles small inputs without the per-key shuffle (hottest-key
    rows ≤ total rows, so total ≤ threshold proves the answer is ``None``
    after reading at most threshold+1 rows regardless of table size), and
    the resolved span is memoized per analyzed plan (``semanticHash``) so
    best-of-N reruns and multi-operator jobs on one input pay the stats
    pass once. :func:`clear_span_memo` invalidates after a path rewrite."""
    floor = min_rows_to_block or target_rows_per_block
    key = None
    try:
        key = (
            df._jdf.queryExecution().analyzed().semanticHash(),
            tuple(key_cols),
            ts_col,
            int(target_rows_per_block),
            int(floor),
        )
        if key in _SPAN_MEMO:
            return _SPAN_MEMO[key]
    except Exception:  # pragma: no cover - connect mode lacks _jdf
        pass
    out: int | None = None
    probe = df.select(*key_cols, ts_col)
    if probe.limit(int(floor) + 1).count() > floor:
        # ONE action for all three scalars (hottest-key count + ts range):
        # the per-key partials and the min/max fold share a single scan —
        # round-1 profiling flagged the old two-collect form as an extra
        # full pass
        per_key = probe.groupBy(*key_cols).agg(
            F.count(F.lit(1)).alias("n"),
            F.min(ts_col).alias("lo"),
            F.max(ts_col).alias("hi"),
        )
        hottest, lo, hi = per_key.agg(
            F.max("n"), F.min("lo"), F.max("hi")
        ).collect()[0]
        if hottest is not None and hottest > floor:
            span_range = max(int(hi) - int(lo), 1)
            n_blocks = max(2, int(hottest) // target_rows_per_block)
            out = max(span_range // n_blocks, 1)
    if key is not None:
        _SPAN_MEMO[key] = out
    return out


def blocked_lag(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value: Column | str,
    ts_col: str,
    block_span: int | str | None,
    out: str = "prev",
    target_rows_per_block: int = 250_000,
) -> DataFrame:
    """``lag(value, 1) over (partition by key order by order_cols)`` that
    survives hot-key skew. ``value`` may be a struct column to lag several
    fields in one pass. ``ts_col`` must be the leading order column (block
    boundaries must respect the ordering). ``block_span=None`` keeps the
    plain single-window plan; ``"auto"`` sizes blocks from key-rate stats.
    """
    value = F.col(value) if isinstance(value, str) else value
    order = [*order_cols]
    if block_span == "auto":
        block_span = auto_block_span(
            df, key_cols, ts_col, target_rows_per_block,
            min_rows_to_block=LAG_EWMA_MIN_ROWS_TO_BLOCK,
        )
    if block_span is None:
        w = Window.partitionBy(*key_cols).orderBy(*order)
        return df.withColumn(out, F.lag(value).over(w))

    blocked = df.withColumn("__blk", F.expr(f"{ts_col} div {block_span}"))
    w_local = Window.partitionBy(*key_cols, "__blk").orderBy(*order)
    local = (
        blocked.withColumn("__val", value)
        .withColumn(out, F.lag("__val").over(w_local))
        # first row per block, NOT "local lag is null": the lagged value
        # itself may legitimately be null mid-block
        .withColumn("__first", F.row_number().over(w_local) == 1)
    )
    # last row's value per (key, block) -> shifted one block forward per key.
    # The summary is blocks-not-events sized, so its per-key window is cheap.
    w_blocks = Window.partitionBy(*key_cols).orderBy("__blk")
    boundaries = (
        local.groupBy(*key_cols, "__blk")
        # struct-wrap: max_by skips rows whose value expr is null, but a
        # block legitimately ending in a null value must carry that null
        .agg(
            F.max_by(
                F.struct(F.col("__val").alias("v")), F.struct(*order)
            ).alias("__last")
        )
        .withColumn("__carry", F.lag("__last").over(w_blocks).getField("v"))
        .drop("__last")
    )
    return (
        local.join(F.broadcast(boundaries), [*key_cols, "__blk"], "left")
        .withColumn(out, F.when(F.col("__first"), F.col("__carry")).otherwise(F.col(out)))
        .drop("__blk", "__val", "__carry", "__first")
    )
