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
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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
            T.StructField(key_col, T.LongType()),
            T.StructField(ts_col, T.LongType()),
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
            ofis = []
            for bp, bs, ap, asz in zip(
                pdf[bid_price], pdf[bid_size], pdf[ask_price], pdf[ask_size]
            ):
                if prev is None:
                    ofis.append(None)
                else:
                    pbp, pbs, pap, pas = prev
                    bid_c = bs if bp > pbp else (bs - pbs if bp == pbp else -pbs)
                    ask_c = asz if ap < pap else (asz - pas if ap == pap else -pas)
                    ofis.append(bid_c - ask_c)
                prev = (bp, bs, ap, asz)
            yield pd.DataFrame(
                {
                    key_col: [k] * len(ofis),
                    ts_col: pdf[ts_col].tolist(),
                    out: ofis,
                }
            )
        if prev is not None:
            state.update(tuple(float(x) for x in prev))

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
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(ts_col, T.LongType()),
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
            cums, bars = [], []
            for c in pdf[notional_cents_col].astype("int64"):
                cum += int(c)
                cums.append(cum)
                bars.append((cum - 1) // bar_cents)
            yield pd.DataFrame(
                {
                    key_col: [k] * len(cums),
                    ts_col: pdf[ts_col].tolist(),
                    notional_cents_col: pdf[notional_cents_col].tolist(),
                    "cum_cents": cums,
                    "bar_num": bars,
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
    """
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField(ts_col, T.LongType()),
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
            values = pdf[value_col].tolist()
            ewmas = []
            for x in values:
                last = x if last is None else alpha * x + (1 - alpha) * last
                ewmas.append(last)
            yield pd.DataFrame(
                {
                    key_col: [k] * len(values),
                    ts_col: pdf[ts_col].tolist(),
                    value_col: values,
                    out: ewmas,
                }
            )
        if last is not None:
            state.update((float(last),))

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
