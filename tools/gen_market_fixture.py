"""Generate a reference-shaped market-data fixture at scale (parquet, /tmp).

Emits the PARSED shapes the lifecycle jobs consume (the output contract of
``plans.reference_jobs.parse_trades`` / ``parse_orderbooks`` minus the
derived-at-read columns), with realistic hot-key skew: one instrument
carries ``--hot-frac`` of all events, mirroring BTC dominance on a real
exchange. Written with numpy -> pyarrow directly (no Spark) so 10M+ rows
generate in seconds.

Usage: python tools/gen_market_fixture.py [out_dir] [--trades N]
       [--orderbooks N] [--hot-frac F] [--seed S]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CODES = ["KRW-BTC", "KRW-ETH", "KRW-SOL", "KRW-XRP", "KRW-ADA"]
BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
SPAN_MS = 24 * 3600 * 1000  # one trading day


def _codes(rng: np.random.Generator, n: int, hot_frac: float) -> np.ndarray:
    hot = rng.random(n) < hot_frac
    others = rng.integers(1, len(CODES), n)
    return np.where(hot, 0, others)


def gen_trades(n: int, hot_frac: float, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    ts = BASE_MS + np.sort(rng.integers(0, SPAN_MS, n))
    code_idx = _codes(rng, n, hot_frac)
    # per-code price level + random walk so OHLC aggregates are non-trivial
    base = np.array([50_000.0, 3_000.0, 150.0, 0.6, 0.45])[code_idx]
    price = np.round(base * (1 + 0.01 * rng.standard_normal(n)), 2)
    return pa.table(
        {
            "code": pa.array(np.array(CODES)[code_idx]),
            "timestamp": pa.array(ts, pa.int64()),
            "trade_price": pa.array(price, pa.float64()),
            "trade_volume": pa.array(np.round(rng.lognormal(0, 1, n), 4)),
            "ask_bid": pa.array(np.where(rng.random(n) < 0.5, "BID", "ASK")),
            "sequential_id": pa.array(np.arange(n), pa.int64()),
            "arrive_time": pa.array(ts / 1000 + rng.uniform(0.001, 0.5, n)),
        }
    )


def gen_orderbooks(n: int, hot_frac: float, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed + 1)
    ts = BASE_MS + np.sort(rng.integers(0, SPAN_MS, n))
    code_idx = _codes(rng, n, hot_frac)
    base = np.array([50_000.0, 3_000.0, 150.0, 0.6, 0.45])[code_idx]
    mid = base * (1 + 0.01 * rng.standard_normal(n))
    spread = base * 0.0002
    bid_size = np.round(rng.lognormal(0, 1, n), 4)
    ask_size = np.round(rng.lognormal(0, 1, n), 4)
    return pa.table(
        {
            "code": pa.array(np.array(CODES)[code_idx]),
            "timestamp": pa.array(ts, pa.int64()),
            "arrive_time": pa.array(ts / 1000 + rng.uniform(0.001, 0.5, n)),
            "best_bid_price": pa.array(np.round(mid - spread, 2)),
            "best_bid_size": pa.array(bid_size),
            "best_ask_price": pa.array(np.round(mid + spread, 2)),
            "best_ask_size": pa.array(ask_size),
            "obi": pa.array(bid_size / ask_size),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/market_fixture")
    ap.add_argument("--trades", type=int, default=10_000_000)
    ap.add_argument("--orderbooks", type=int, default=3_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    pq.write_table(
        gen_trades(args.trades, args.hot_frac, args.seed),
        os.path.join(args.out_dir, "trades.parquet"),
        row_group_size=1_000_000,
    )
    pq.write_table(
        gen_orderbooks(args.orderbooks, args.hot_frac, args.seed),
        os.path.join(args.out_dir, "orderbooks.parquet"),
        row_group_size=1_000_000,
    )
    print(f"wrote {args.trades} trades + {args.orderbooks} orderbooks "
          f"(hot_frac={args.hot_frac}) to {args.out_dir}")


if __name__ == "__main__":
    main()
