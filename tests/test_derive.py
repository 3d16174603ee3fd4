"""Scalar/derive layer (SURVEY §2.2) against the reference schemas."""

import json


from crypto_market_data_etl_spark.functions import (
    best_of_book,
    flatten_payload,
    parse_payload,
    signed_volume,
    to_kafka_value,
    with_event_time,
    with_latency,
    with_obi,
)
from crypto_market_data_etl_spark.schemas import TRADE_SCHEMA, load_schema

TRADE = {
    "type": "trade",
    "code": "KRW-BTC",
    "timestamp": 1704067200123,
    "trade_price": 90000000.0,
    "trade_volume": 0.5,
    "ask_bid": "BID",
    "sequential_id": 1,
    "arrive_time": 1704067200.456,
}

OB = {
    "type": "orderbook",
    "code": "KRW-BTC",
    "timestamp": 1704067200123,
    "total_ask_size": 10.0,
    "total_bid_size": 12.0,
    "orderbook_units": [
        {"ask_price": 101.0, "bid_price": 100.0, "ask_size": 2.0, "bid_size": 3.0},
        {"ask_price": 102.0, "bid_price": 99.0, "ask_size": 5.0, "bid_size": 4.0},
    ],
}


def _kafka_like(spark, payloads):
    return spark.createDataFrame(
        [(json.dumps(p).encode(),) for p in payloads], "value binary"
    )


def test_parse_flatten_trade(spark):
    df = parse_payload(_kafka_like(spark, [TRADE]), load_schema("upbit_trade"))
    flat = flatten_payload(df)
    row = flat.collect()[0]
    assert row.code == "KRW-BTC"
    assert row.trade_price == 90000000.0
    assert row.trade_date is None  # absent field -> NULL, schema not inferred


def test_event_time_exact_vs_reference(spark):
    df = flatten_payload(parse_payload(_kafka_like(spark, [TRADE]), TRADE_SCHEMA))
    exact = with_event_time(df, exact=True).collect()[0].server_datetime
    trunc = with_event_time(df, exact=False).collect()[0].server_datetime
    assert exact.microsecond == 123000  # millisecond preserved
    assert trunc.microsecond == 0  # reference semantics truncate to seconds


def test_latency(spark):
    df = flatten_payload(parse_payload(_kafka_like(spark, [TRADE]), TRADE_SCHEMA))
    row = with_latency(df).collect()[0]
    assert abs(row.time_diff - (1704067200.456 - 1704067200.123)) < 1e-6


def test_best_of_book_and_obi(spark):
    df = flatten_payload(
        parse_payload(_kafka_like(spark, [OB]), load_schema("upbit_orderbook"))
    )
    row = with_obi(best_of_book(df)).collect()[0]
    assert row.best_ask_price == 101.0 and row.best_bid_size == 3.0
    assert abs(row.obi - 3.0 / 2.0) < 1e-12


def test_signed_volume(spark):
    df = spark.createDataFrame(
        [("BID", 2.0), ("ASK", 3.0)], "ask_bid string, trade_volume double"
    )
    vals = [r.sv for r in df.select(signed_volume().alias("sv")).collect()]
    assert vals == [2.0, -3.0]


def test_to_kafka_value_roundtrip(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    out = to_kafka_value(df, key_col="id").collect()[0]
    assert out.key == "1"
    assert json.loads(out.value) == {"id": 1, "s": "a"}


def test_unknown_schema_raises():
    import pytest

    with pytest.raises(ValueError, match="unknown topic"):
        load_schema("nope")
