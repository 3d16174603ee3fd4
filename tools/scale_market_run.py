"""Perf-run the reference lifecycle jobs (SURVEY §3.1/§3.3) on the
reference-shaped scale fixture (tools/gen_market_fixture.py).

Times each job fully executed (count of the materialized result), comparing
single-window vs blocked (skew-proof) plans where both exist. Prints one
JSON line per job.

Usage: python tools/scale_market_run.py [fixture_dir] [--jobs a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_data_etl_spark.plans.reference_jobs import (  # noqa: E402
    candle_job,
    market_stats_job,
    preprocess_job,
)
from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def _load(spark, fixture_dir):
    """Fixture -> the parsed shapes the jobs consume (derive server_datetime
    and time_diff the same way parse_trades/parse_orderbooks do)."""
    derive = lambda df: df.withColumn(  # noqa: E731
        "server_datetime", F.timestamp_millis(F.col("timestamp"))
    ).withColumn("time_diff", F.col("arrive_time") - F.col("timestamp") / 1000.0)
    trades = derive(spark.read.parquet(os.path.join(fixture_dir, "trades.parquet")))
    obs = derive(spark.read.parquet(os.path.join(fixture_dir, "orderbooks.parquet")))
    return trades, obs


BEST_OF = 2


def timed(name, thunk):
    """min-of-BEST_OF wall: this box's run-to-run swing on 10M-row window
    jobs is ~2x (JIT warm-up + VM noise); a single sample regularly inverts
    real crossovers, so the recorded rung is the minimum with every sample
    kept alongside for honesty."""
    walls, n = [], None
    for _ in range(max(1, BEST_OF)):
        t0 = time.monotonic()
        n = thunk()
        walls.append(round(time.monotonic() - t0, 2))
    wall = min(walls)
    print(json.dumps({"job": name, "sec": wall, "rows": n, "walls": walls}), flush=True)
    return wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("fixture_dir", nargs="?", default="/tmp/market_fixture")
    ap.add_argument("--jobs", default="candles,stats_plain,stats_blocked,preprocess")
    ap.add_argument("--best-of", type=int, default=2)
    args = ap.parse_args()
    global BEST_OF
    BEST_OF = args.best_of
    jobs = set(args.jobs.split(","))

    spark = get_spark()
    trades, obs = _load(spark, args.fixture_dir)
    print(json.dumps({"trades": trades.count(), "orderbooks": obs.count()}))

    if "candles" in jobs:
        timed("candle_job_10s", lambda: candle_job(trades, 10).count())
    if "stats_plain" in jobs:
        timed("market_stats_plain", lambda: market_stats_job(obs).count())
    if "stats_auto" in jobs:
        # probe-gated form: the memoized limit-bounded stats probe decides
        # plain vs blocked per fixture INSIDE the timer (the real knob cost)
        timed(
            "market_stats_auto",
            lambda: market_stats_job(obs, block_span="auto").count(),
        )
    if "stats_blocked" in jobs:
        # FORCED blocked form (span resolved outside the timer — a user
        # config, not a probe): the crossover contrast row. At small rungs
        # this is expected to LOSE to plain; stats_auto must not.
        from crypto_market_data_etl_spark.operators.blocked import auto_block_span

        ob_span = auto_block_span(obs, ["code"], "timestamp", min_rows_to_block=1)
        timed(
            "market_stats_blocked",
            lambda: market_stats_job(obs, block_span=ob_span).count(),
        )
    if "preprocess" in jobs:
        # 3M-notional bars over ~50k-priced BTC: scale bar size to the
        # fixture's notional so bar counts are realistic
        timed(
            "preprocess_job",
            lambda: preprocess_job(trades, obs, bar_size=3_000_000.0).count(),
        )
    if "preprocess_auto" in jobs:
        # both knobs probe-gated (round-10 verdict ask #4): the bounded
        # memoized probes pick the winning side of the measured crossover
        # per fixture; this row must track max(plain, tuned) at every rung
        timed(
            "preprocess_job_auto",
            lambda: preprocess_job(
                trades, obs, bar_size=3_000_000.0,
                block_span="auto", adaptive_asof="auto",
            ).count(),
        )
        from crypto_market_data_etl_spark.operators.asof import asof_hot_density
        from crypto_market_data_etl_spark.operators.blocked import auto_block_span

        snaps = obs.select("code", F.col("timestamp").alias("ob_timestamp"))
        print(
            json.dumps(
                {
                    "auto_knobs": {
                        "trades_block_span": auto_block_span(
                            trades, ["code"], "timestamp"
                        ),
                        "asof_hot_density": round(
                            asof_hot_density(snaps, ["code"], "ob_timestamp", 10_000), 1
                        ),
                    }
                }
            ),
            flush=True,
        )
    if "probe_cost" in jobs:
        # r11 verdict ask #5: isolate the auto arms' probe wall from the
        # job wall. Times each knob probe COLD (memo cleared — what the
        # first auto job in a session pays) and MEMOIZED (what every later
        # auto job on the same table pays: the amortized cost). The auto
        # rows time the probe inside the job wall, so auto_over_best
        # carries this cost at most once per session — these rows let the
        # artifact attribute the residue instead of guessing.
        from crypto_market_data_etl_spark.operators.asof import (
            asof_hot_density,
            clear_density_memo,
        )
        from crypto_market_data_etl_spark.operators.blocked import (
            auto_block_span,
            clear_span_memo,
        )

        snaps = obs.select("code", F.col("timestamp").alias("ob_timestamp"))
        out = {}
        for name, clear, probe in (
            (
                "trades_span",
                clear_span_memo,
                lambda: auto_block_span(trades, ["code"], "timestamp"),
            ),
            (
                "obs_span",
                clear_span_memo,
                lambda: auto_block_span(obs, ["code"], "timestamp"),
            ),
            (
                "asof_density",
                clear_density_memo,
                lambda: asof_hot_density(snaps, ["code"], "ob_timestamp", 10_000),
            ),
        ):
            clear()
            t0 = time.monotonic()
            probe()
            out[f"{name}_cold_s"] = round(time.monotonic() - t0, 3)
            t0 = time.monotonic()
            probe()
            out[f"{name}_memo_s"] = round(time.monotonic() - t0, 4)
        print(json.dumps({"job": "probe_cost", **out}), flush=True)
    if "preprocess_tuned" in jobs:
        # FORCED tuned config (blocked cumsum span resolved outside the
        # timer + always-adaptive as-of): the contrast row that shows the
        # crossover penalty at small rungs
        from crypto_market_data_etl_spark.operators.blocked import auto_block_span

        tr_span = auto_block_span(trades, ["code"], "timestamp", min_rows_to_block=1)
        timed(
            "preprocess_job_tuned",
            lambda: preprocess_job(
                trades, obs, bar_size=3_000_000.0,
                block_span=tr_span, adaptive_asof=True,
            ).count(),
        )
    spark.stop()


if __name__ == "__main__":
    main()
