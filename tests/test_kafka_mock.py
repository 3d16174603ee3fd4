"""File-backed Kafka source contract: S1/S2/S3 lifecycles without a broker.

The mock log carries the exact Kafka source schema, so these tests drive the
SAME parse/candle/archive code a real broker would feed — the engine-side
contract (topic + schema + offset semantics, SURVEY §2.1) is what's asserted.
"""

import json

import pytest
from pyspark.sql import functions as F

from crypto_market_data_etl_spark.plans.reference_jobs import candle_job, parse_trades
from crypto_market_data_etl_spark.sources.kafka import kafka_offsets_json
from crypto_market_data_etl_spark.sources.kafka_mock import (
    KAFKA_SOURCE_SCHEMA,
    mock_offsets_for_times,
    read_kafka_log,
    read_kafka_log_stream,
    write_kafka_log,
)
from tests.test_reference_jobs import gen_trades

TOPIC = "upbit_trade"


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("kafka_log") / TOPIC)
    payloads = gen_trades(n=400)
    values = spark.createDataFrame(
        [(json.dumps(p).encode(), p["code"], p["timestamp"]) for p in payloads],
        "value binary, code string, ts_ms long",
    )
    write_kafka_log(values, path, TOPIC, n_partitions=3, key_col="code", ts_ms="ts_ms")
    return path


def test_log_has_kafka_source_schema(spark, log_dir):
    df = read_kafka_log(spark, log_dir, TOPIC)
    assert df.schema == KAFKA_SOURCE_SCHEMA
    assert df.count() == 400
    # keyed routing: every code maps to exactly one partition
    routed = df.withColumn("code", F.col("key").cast("string")).select("code", "partition").distinct()
    per_code = routed.groupBy("code").count().collect()
    assert all(r["count"] == 1 for r in per_code)


def test_offsets_dense_per_partition(spark, log_dir):
    offs = (
        read_kafka_log(spark, log_dir, TOPIC)
        .groupBy("partition")
        .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    for r in offs:
        assert r.lo == 0 and r.hi == r.n - 1  # dense 0-based, no gaps


def test_bounded_read_is_half_open_band(spark, log_dir):
    # S2: [start, end) per partition, via the same JSON literals the real
    # source takes; unlisted partitions are not read. Key-hash routing may
    # leave some partitions empty, so pick two populated ones dynamically.
    counts = {
        r.partition: r["count"]
        for r in read_kafka_log(spark, log_dir, TOPIC).groupBy("partition").count().collect()
    }
    pa, pb = sorted(p for p in counts if counts[p] >= 25)[:2]
    start = kafka_offsets_json(TOPIC, {pa: 10, pb: 5})
    end = kafka_offsets_json(TOPIC, {pa: 20, pb: -1})
    df = read_kafka_log(spark, log_dir, TOPIC, start, end)
    got = {(r.partition, r.offset) for r in df.select("partition", "offset").collect()}
    assert {p for p, _ in got} == {pa, pb}  # unlisted partitions excluded
    assert sorted(o for p, o in got if p == pa) == list(range(10, 20))  # end exclusive
    assert min(o for p, o in got if p == pb) == 5  # -1 end = through latest
    assert max(o for p, o in got if p == pb) == counts[pb] - 1


def test_offsets_for_times_resolves_bands(spark, log_dir):
    # S3: the archival DAG's [t-1h, t] window becomes per-partition offsets
    full = read_kafka_log(spark, log_dir, TOPIC)
    mid_ts = full.agg(F.expr("percentile(unix_millis(timestamp), 0.5)")).collect()[0][0]
    offs = mock_offsets_for_times(spark, log_dir, TOPIC, int(mid_ts))
    assert offs  # some partition has records at/after the midpoint
    cutoff = F.timestamp_millis(F.lit(int(mid_ts)))
    for p, o in offs.items():
        at = full.filter(
            (F.col("partition") == p) & (F.col("offset") == o) & (F.col("timestamp") >= cutoff)
        )
        assert at.count() == 1  # the resolved offset qualifies
        before = full.filter(
            (F.col("partition") == p) & (F.col("offset") < o) & (F.col("timestamp") >= cutoff)
        )
        assert before.count() == 0  # and is the FIRST qualifying offset


def test_candles_from_bounded_read_match_direct(spark, log_dir):
    # end-to-end S2 path: bounded read -> parse -> candle == candles computed
    # from the same payloads fed directly (the mock adds no semantics)
    log = read_kafka_log(spark, log_dir, TOPIC)
    via_log = candle_job(parse_trades(log.select("value")), width_seconds=10)
    payloads = gen_trades(n=400)
    direct_values = spark.createDataFrame(
        [(json.dumps(p).encode(),) for p in payloads], "value binary"
    )
    direct = candle_job(parse_trades(direct_values), width_seconds=10)
    key = ("w_start", "code")
    a = {tuple(r[k] for k in key): r for r in via_log.collect()}
    b = {tuple(r[k] for k in key): r for r in direct.collect()}
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        assert a[k] == b[k]


def test_streaming_read_matches_batch_candles(spark, log_dir, tmp_path):
    # S1 path: the SAME parse+candle code on a streaming read of the log,
    # multiple micro-batches, equals the batch result (update mode drains all).
    # The file source orders part-files arbitrarily, so the watermark delay
    # must exceed the event-time span or cross-file "late" rows get dropped.
    stream = read_kafka_log_stream(spark, log_dir, max_files_per_trigger=1)
    candles = candle_job(
        parse_trades(stream.select("value")), width_seconds=10,
        streaming=True, watermark="1 hour",
    )
    name = "kafka_mock_stream_sink"
    q = (
        candles.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table(name)
    # update mode re-emits refined windows: keep the last emit per window
    latest = streamed.groupBy("w_start", "code").agg(
        F.max_by(F.struct("open", "high", "low", "close", "volume"), F.col("n_trades")).alias("s"),
        F.max("n_trades").alias("n_trades"),
    )
    batch = candle_job(
        parse_trades(read_kafka_log(spark, log_dir, TOPIC).select("value")),
        width_seconds=10,
    )
    a = {(r.w_start, r.code): (r.s.open, r.s.high, r.s.low, r.s.close, r.n_trades) for r in latest.collect()}
    b = {(r.w_start, r.code): (r.open, r.high, r.low, r.close, r.n_trades) for r in batch.collect()}
    assert a == b and len(a) > 0
