"""Custom stateful streaming operators (SURVEY §4 item 2, §7.2).

The reference *intends* a running EWMA and a lag-based OFI on a streaming
DataFrame (``kafka_upbit_realtime_processing.py:99-104,121-128``) — both are
rejected by Structured Streaming (non-time window functions are unsupported
on streams). The supported mechanism is per-key state:
``applyInPandasWithState`` keyed by instrument, carrying the tiny recurrence
state across micro-batches:

- EWMA: state = last smoothed value (one double per key).
- OFI:  state = previous best-of-book (4 doubles per key).

State size is O(keys), not O(events) — this scales to any stream volume; the
only requirement is per-key in-order arrival within the watermark, which the
micro-batch sort below plus the source's per-key ordering (Kafka partitioning
by code) provides.

Each micro-batch is processed VECTORIZED inside the Arrow batch (numpy
``shift``/``cumsum`` and pandas ``ewm`` seeded from state) — no per-row
Python loops; at stream volume the per-batch cost is a handful of numpy
passes, so throughput is Arrow-transfer-bound, not interpreter-bound.

Key/timestamp output and state dtypes are derived from the input schema, so
the operators work unchanged on the reference's string ``code`` column and
on integer keys alike.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _dtype(df: DataFrame, col: str) -> T.DataType:
    """Spark type of *col* in *df* (so key/ts schemas follow the input)."""
    return df.schema[col].dataType


def stateful_ofi(
    df: DataFrame,
    key_col: str = "code",
    ts_col: str = "ts_us",
    bid_price: str = "best_bid_price",
    bid_size: str = "best_bid_size",
    ask_price: str = "best_ask_price",
    ask_size: str = "best_ask_size",
    out: str = "ofi",
) -> DataFrame:
    """Streaming order-flow imbalance: the lag-based OFI of
    ``operators.ewma.with_ofi`` with the previous best-of-book carried as
    per-key state across micro-batches (SURVEY §4 item 2 — the reference
    wanted ``lag`` on a stream, which Structured Streaming rejects).

    State = 4 doubles per key. First row ever per key emits NULL.
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, _dtype(df, key_col)),
            T.StructField(ts_col, _dtype(df, ts_col)),
            T.StructField(out, T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("bp", T.DoubleType()),
            T.StructField("bs", T.DoubleType()),
            T.StructField("ap", T.DoubleType()),
            T.StructField("as_", T.DoubleType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        prev = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            n = len(pdf)
            if n == 0:
                continue
            bp = pdf[bid_price].to_numpy(dtype="float64")
            bs = pdf[bid_size].to_numpy(dtype="float64")
            ap = pdf[ask_price].to_numpy(dtype="float64")
            asz = pdf[ask_size].to_numpy(dtype="float64")
            # previous-row book: in-batch shift, row 0 seeded from state
            seed = prev if prev is not None else (np.nan,) * 4
            pbp = np.concatenate(([seed[0]], bp[:-1]))
            pbs = np.concatenate(([seed[1]], bs[:-1]))
            pap = np.concatenate(([seed[2]], ap[:-1]))
            pas = np.concatenate(([seed[3]], asz[:-1]))
            bid_c = np.where(bp > pbp, bs, np.where(bp == pbp, bs - pbs, -pbs))
            ask_c = np.where(ap < pap, asz, np.where(ap == pap, asz - pas, -pas))
            ofi = bid_c - ask_c
            if prev is None:
                ofi[0] = np.nan  # NaN → null through Arrow (no prior book)
            prev = (float(bp[-1]), float(bs[-1]), float(ap[-1]), float(asz[-1]))
            yield pd.DataFrame(
                {key_col: [k] * n, ts_col: pdf[ts_col].to_numpy(), out: ofi}
            )
        if prev is not None:
            state.update(prev)

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_dollar_bars(
    df: DataFrame,
    key_col: str = "code",
    ts_col: str = "ts_us",
    notional_cents_col: str = "cents",
    bar_cents: int = 300_000_000_00,
) -> DataFrame:
    """Streaming dollar bars: running notional cumsum per key carried as
    state (SURVEY §7.2 — inherently sequential per key, the stateful-op
    route; the reference computes bars only in batch).

    Emits one row per input event with its cumulative cents and bar id —
    identical assignment to ``operators.bars.dollar_bars`` on the same data
    (asserted in tests). Bar-level OHLCV is then a downstream groupBy on
    (key, bar_num). State = one bigint per key. Requires per-key in-order
    arrival across micro-batches (Kafka keyed by instrument provides it).
    Exact under int64: cumulative cents stay integer end to end.
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, _dtype(df, key_col)),
            T.StructField(ts_col, _dtype(df, ts_col)),
            T.StructField(notional_cents_col, T.LongType()),
            T.StructField("cum_cents", T.LongType()),
            T.StructField("bar_num", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("cum", T.LongType())])

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        cum = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            n = len(pdf)
            if n == 0:
                continue
            cents = pdf[notional_cents_col].to_numpy(dtype="int64")
            cums = np.cumsum(cents) + cum
            cum = int(cums[-1])
            yield pd.DataFrame(
                {
                    key_col: [k] * n,
                    ts_col: pdf[ts_col].to_numpy(),
                    notional_cents_col: cents,
                    "cum_cents": cums,
                    "bar_num": (cums - 1) // bar_cents,
                }
            )
        state.update((int(cum),))

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_ewma(
    df: DataFrame,
    key_col: str = "code",
    ts_col: str = "ts_us",
    value_col: str = "value",
    alpha: float = 0.8,
    out: str = "ewma",
) -> DataFrame:
    """Running EWMA per key on a streaming DataFrame.

    Emits every input row with its EWMA (recurrence
    ``y_t = alpha*x_t + (1-alpha)*y_{t-1}`` seeded by the first value),
    continuing across micro-batches via one double of state per key.

    Vectorized as a state-seeded ``Series.ewm(adjust=False)``: prepending the
    carried value as a synthetic first observation reproduces the recurrence
    bit-for-bit (pandas' adjust=False loop computes the identical
    ``(1-α)·y + α·x`` update in C).
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, _dtype(df, key_col)),
            T.StructField(ts_col, _dtype(df, ts_col)),
            T.StructField(value_col, T.DoubleType()),
            T.StructField(out, T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("last_ewma", T.DoubleType())])

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            n = len(pdf)
            if n == 0:
                continue
            values = pdf[value_col].to_numpy(dtype="float64")
            if last is None:
                series = pd.Series(values)
                ewmas = series.ewm(alpha=alpha, adjust=False).mean().to_numpy()
            else:
                seeded = pd.Series(np.concatenate(([last], values)))
                ewmas = seeded.ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]
            last = float(ewmas[-1])
            yield pd.DataFrame(
                {
                    key_col: [k] * n,
                    ts_col: pdf[ts_col].to_numpy(),
                    value_col: values,
                    out: ewmas,
                }
            )
        if last is not None:
            state.update((last,))

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
