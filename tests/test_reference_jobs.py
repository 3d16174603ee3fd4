"""End-to-end reference lifecycles (§3.1-3.3) on FIXTURES.md-shaped data."""

import json

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from crypto_market_data_etl_spark.plans.reference_jobs import (
    archive_job,
    candle_job,
    market_stats_job,
    parse_orderbooks,
    parse_trades,
    preprocess_job,
)

CODES = ["KRW-BTC", "KRW-ETH", "KRW-SOL"]
BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def gen_trades(n=600, seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        code = CODES[int(rng.integers(0, 3))]
        ts = BASE_MS + i * 500 + int(rng.integers(0, 400))
        price = float(np.round(100.0 + 10 * rng.standard_normal(), 2))
        rows.append(
            {
                "type": "trade",
                "code": code,
                "timestamp": ts,
                "trade_price": price,
                "trade_volume": float(np.round(rng.lognormal(0, 0.5), 4)),
                "ask_bid": "BID" if rng.random() < 0.5 else "ASK",
                "sequential_id": i,
                "arrive_time": ts / 1000 + float(rng.uniform(0.001, 0.5)),
            }
        )
    return rows


def gen_orderbooks(n=900, seed=6):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        code = CODES[int(rng.integers(0, 3))]
        ts = BASE_MS + i * 330 + int(rng.integers(0, 200))
        mid = 100.0 + 10 * rng.standard_normal()
        units = [
            {
                "ask_price": round(mid + 0.5 + lvl, 2),
                "bid_price": round(mid - 0.5 - lvl, 2),
                "ask_size": float(np.round(rng.lognormal(0, 0.5), 4)),
                "bid_size": float(np.round(rng.lognormal(0, 0.5), 4)),
            }
            for lvl in range(5)
        ]
        rows.append(
            {
                "type": "orderbook",
                "code": code,
                "timestamp": ts,
                "total_ask_size": round(sum(u["ask_size"] for u in units), 4),
                "total_bid_size": round(sum(u["bid_size"] for u in units), 4),
                "orderbook_units": units,
                "arrive_time": ts / 1000 + float(rng.uniform(0.001, 0.5)),
            }
        )
    return rows


def _as_kafka(spark, payloads):
    return spark.createDataFrame(
        [(json.dumps(p).encode(),) for p in payloads], "value binary"
    )


@pytest.fixture(scope="module")
def trades(spark):
    return parse_trades(_as_kafka(spark, gen_trades())).cache()


@pytest.fixture(scope="module")
def orderbooks(spark):
    return parse_orderbooks(_as_kafka(spark, gen_orderbooks())).cache()


def test_parse_trades_shape(trades):
    row = trades.limit(1).collect()[0]
    assert row.server_datetime is not None and row.time_diff > 0
    assert trades.count() == 600


def test_parse_orderbooks_obi(orderbooks):
    row = orderbooks.limit(1).collect()[0]
    assert abs(row.obi - row.best_bid_size / row.best_ask_size) < 1e-12
    assert row.best_ask_price > row.best_bid_price


def test_candle_job_against_pandas(spark, trades):
    got = {(r.w_start, r.code): r for r in candle_job(trades, 10).collect()}
    pdf = trades.select(
        "code", "timestamp", "trade_price", "trade_volume", "ask_bid", "sequential_id"
    ).toPandas()
    pdf["w"] = (pdf.timestamp // 10_000) * 10_000
    grouped = pdf.sort_values(["timestamp", "sequential_id"]).groupby(["w", "code"])
    assert len(got) == grouped.ngroups
    for (w, code), g in grouped:
        key = (pd.Timestamp(w, unit="ms").to_pydatetime(), code)
        r = got[key]
        assert r.open == g.trade_price.iloc[0] and r.close == g.trade_price.iloc[-1]
        assert r.high == g.trade_price.max() and r.low == g.trade_price.min()
        signed = np.where(g.ask_bid == "BID", g.trade_volume, -g.trade_volume).sum()
        assert abs(r.tfi - round(signed, 8)) < 1e-6


def test_candle_job_streaming_smoke(spark, tmp_path, trades):
    path = str(tmp_path / "trades")
    trades.write.parquet(path)
    stream = spark.readStream.schema(trades.schema).parquet(path)
    out = candle_job(stream, 10, streaming=True)
    q = (
        out.writeStream.format("memory").queryName("ref_candles")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        batch_n = candle_job(trades, 10).count()
        assert spark.sql("SELECT * FROM ref_candles").count() == batch_n
    finally:
        q.stop()


def test_market_stats_job_ewma_matches_pandas(spark, orderbooks):
    got = market_stats_job(orderbooks).select(
        "code", "timestamp", "arrive_time", "obi", "obi_ewma", "ofi"
    ).toPandas()
    for code in CODES:
        g = got[got.code == code].sort_values(["timestamp", "arrive_time"])
        expected = g["obi"].ewm(alpha=0.8, adjust=False).mean().to_numpy()
        np.testing.assert_allclose(g["obi_ewma"].to_numpy(), expected, rtol=1e-10)
        assert np.isnan(g["ofi"].iloc[0]) or g["ofi"].iloc[0] is None


def test_archive_job_stamps_date(spark, trades):
    out = archive_job(trades, "2024-01-01")
    assert out.select("processing_date").distinct().collect()[0][0] == "2024-01-01"


def test_preprocess_job_bars_and_asof(spark, trades, orderbooks):
    out = preprocess_job(trades, orderbooks, bar_size=2000.0, asof_tolerance_ms=10_000)
    rows = out.collect()
    assert len(rows) > 10
    # bars partition all trades: notional sums match
    total_notional = sum(r.notional for r in rows)
    expected = (
        trades.select(
            F.sum(F.round(F.col("trade_price") * F.col("trade_volume") * 100) / 100)
        ).collect()[0][0]
    )
    assert abs(total_notional - expected) < 1e-6
    # as-of: attached snapshot is the latest within the band (brute force)
    ob = orderbooks.select("code", "timestamp", "best_bid_price").toPandas()
    for r in rows[:50]:
        band = ob[
            (ob.code == r.code)
            & (ob.timestamp <= r.bar_end_us)
            & (ob.timestamp >= r.bar_end_us - 10_000)
        ]
        if band.empty:
            assert r.ob_timestamp_r is None
        else:
            assert r.ob_timestamp_r == band.timestamp.max()


def test_preprocess_job_tuned_matches_plain(spark, trades, orderbooks):
    # scale knobs (blocked cumsum + adaptive as-of) must not change results
    plain = preprocess_job(trades, orderbooks, bar_size=2000.0)
    tuned = preprocess_job(
        trades, orderbooks, bar_size=2000.0, block_span=60_000, adaptive_asof=True
    )
    key = lambda r: (r.code, r.bar_num)  # noqa: E731
    a = {key(r): r.asDict() for r in plain.collect()}
    b = {key(r): r.asDict() for r in tuned.collect()}
    assert a.keys() == b.keys() and len(a) > 10
    for k, ra in a.items():
        rb = b[k]
        for col, va in ra.items():
            vb = rb[col]
            if isinstance(va, float):
                assert abs(va - vb) < 1e-9, (k, col)
            else:
                assert va == vb, (k, col)


def test_market_stats_job_blocked_matches_plain(spark, orderbooks):
    plain = market_stats_job(orderbooks)
    blocked = market_stats_job(orderbooks, block_span=60_000)
    key = lambda r: (r.code, r.timestamp, r.arrive_time)  # noqa: E731
    a = {key(r): (r.ofi, r.obi_ewma) for r in plain.collect()}
    b = {key(r): (r.ofi, r.obi_ewma) for r in blocked.collect()}
    assert a.keys() == b.keys()
    for k, (ofi_a, ewma_a) in a.items():
        ofi_b, ewma_b = b[k]
        assert (ofi_a is None) == (ofi_b is None)
        if ofi_a is not None:
            assert abs(ofi_a - ofi_b) < 1e-9
        assert abs(ewma_a - ewma_b) < 1e-9


def test_asof_hot_density_probe(spark):
    from crypto_market_data_etl_spark.operators.asof import asof_hot_density

    # sparse key: 10 rows over 10x tolerance -> ~1/bucket; dense key:
    # 1000 rows over 1x tolerance -> ~1000/bucket (the max wins)
    tol = 1000
    rows = [("SPARSE", i * tol) for i in range(10)]
    rows += [("DENSE", i) for i in range(1000)]
    df = spark.createDataFrame(rows, "code string, ts long")
    d = asof_hot_density(df, ["code"], "ts", tol)
    assert 900 <= d <= 1100, d
    sparse_only = df.filter(F.col("code") == "SPARSE")
    assert asof_hot_density(sparse_only, ["code"], "ts", tol) < 2


def test_preprocess_job_auto_asof_matches_explicit(spark, trades, orderbooks):
    """adaptive_asof="auto" resolves the density probe to one of the two
    explicit paths — results must be identical to the plain form either
    way (both paths share the q09 oracle semantics)."""
    plain = preprocess_job(trades, orderbooks, bar_size=2000.0)
    auto = preprocess_job(
        trades, orderbooks, bar_size=2000.0, adaptive_asof="auto"
    )
    key = lambda r: (r.code, r.bar_num)  # noqa: E731
    a = {key(r): r.asDict() for r in plain.collect()}
    b = {key(r): r.asDict() for r in auto.collect()}
    assert a.keys() == b.keys() and len(a) > 10
    for k, ra in a.items():
        for col, va in ra.items():
            vb = b[k][col]
            if isinstance(va, float):
                assert abs(va - vb) < 1e-9, (k, col)
            else:
                assert va == vb, (k, col)
