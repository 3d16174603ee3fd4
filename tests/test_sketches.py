"""Sketch operators: HLL accuracy + mergeability, approx quantiles vs exact,
hypertable rollup == direct computation."""

import pytest
from pyspark.sql import functions as F

from crypto_market_data_etl_spark.operators.bars import with_cents
from crypto_market_data_etl_spark.operators.candles import (
    candle_partials,
    rollup_candles,
    salted_candle_partials,
    tumbling_candles,
)
from crypto_market_data_etl_spark.operators.sketches import (
    approx_quantiles,
    heavy_hitters,
    hll_distinct,
    hll_merge,
)
from crypto_market_data_etl_spark.schemas import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents").cache()


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF_SMOKE, "events").cache()


def test_hll_within_tolerance_of_exact(spark, docs):
    approx = {r.source: r.approx_distinct for r in hll_distinct(docs, ["source"], "text").collect()}
    exact = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.countDistinct("text").alias("n")).collect()
    }
    for src, n in exact.items():
        assert abs(approx[src] - n) <= max(2, 0.05 * n)


def test_hll_partials_merge(spark, docs):
    # per-(source, lang) sketches union up to per-source estimates
    partials = hll_distinct(docs, ["source", "lang"], "text")
    merged = {r.source: r.approx_distinct for r in hll_merge(partials, ["source"]).collect()}
    direct = {r.source: r.approx_distinct for r in hll_distinct(docs, ["source"], "text").collect()}
    assert merged == direct  # HLL union of partitions == sketch of the whole


def test_approx_quantiles_close_to_exact(spark, events):
    got = approx_quantiles(events, ["event_type"], "value").collect()
    exact = {
        r.event_type: r.q
        for r in events.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.25D, 0.5D, 0.9D))").alias("q"))
        .collect()
    }
    for r in got:
        for a, e in zip(r.quantiles, exact[r.event_type]):
            assert abs(a - e) <= max(1.0, 0.05 * abs(e))


def test_heavy_hitters_shares(spark, events):
    rows = heavy_hitters(events, ["event_type"], "user_id", min_share=0.01).collect()
    assert rows, "expected some heavy hitters at smoke scale"
    for r in rows:
        assert r.share >= 0.01


def test_rollup_equals_direct_daily(spark, events):
    HOUR_US = 3_600_000_000
    ev = with_cents(events, "value")
    hourly = candle_partials(ev, ["user_id"], "ts_us", "value", HOUR_US, ["event_id"], "cents")
    daily_rolled = rollup_candles(hourly, ["user_id"], 24)
    direct = tumbling_candles(
        ev, ["user_id"], "ts", "value", 86_400, ["event_id"], "cents"
    )
    a = {
        (r.bucket, r.user_id): (r.open, r.high, r.low, r.close, r.n_trades, r.cents)
        for r in daily_rolled.collect()
    }
    b = {
        (int(r.w_start.timestamp()) // 86_400, r.user_id): (
            r.open, r.high, r.low, r.close, r.n_trades, int(round(r.volume * 100)),
        )
        for r in direct.collect()
    }
    assert a == b


def test_salted_candles_equal_unsalted_on_hot_key(spark):
    # one key owns 90% of events — the salted two-stage path must still
    # produce the exact unsalted candles (open/close travel with order keys)
    HOUR_US = 3_600_000_000
    rows = [
        (i, (i % 2_000) * 7_000_000, 1 if i % 10 else 2, float(100 + i % 37) + 0.25)
        for i in range(5_000)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, value double"
    ).withColumn("cents", F.round(F.col("value") * 100).cast("bigint"))
    plain = candle_partials(ev, ["user_id"], "ts_us", "value", HOUR_US, ["event_id"], "cents")
    salted = salted_candle_partials(
        ev, ["user_id"], "ts_us", "value", HOUR_US, ["event_id"], "cents", n_salts=7
    )
    key = lambda r: (r.bucket, r.user_id)  # noqa: E731
    val = lambda r: (r.open, r.high, r.low, r.close, r.n_trades, r.cents, r.first_key, r.last_key)  # noqa: E731
    a = {key(r): val(r) for r in plain.collect()}
    b = {key(r): val(r) for r in salted.collect()}
    assert a == b and len(a) > 0
