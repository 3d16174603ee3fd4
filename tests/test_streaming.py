"""Structured Streaming: candles, sliding stats, watermark late-drop,
stateful EWMA across micro-batches (file source + memory sink)."""

import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crypto_market_data_etl_spark.streaming.candles import (
    run_to_memory,
    stream_candles,
    stream_sliding_stats,
)
from crypto_market_data_etl_spark.streaming.stateful import (
    stateful_dollar_bars,
    stateful_ewma,
)

SCHEMA = T.StructType(
    [
        T.StructField("code", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows, n_files=1):
    df = spark.createDataFrame(rows, "code long, ts_us long, value double").withColumn(
        "ts", F.timestamp_micros("ts_us")
    )
    df.coalesce(n_files).write.mode("append").parquet(path)
    # FileStreamSource orders batches by file mod-time, which is second-
    # granular through Hadoop's local FS (ties break by random part-file
    # name); keep writes >1s apart so maxFilesPerTrigger=1 replays in order
    time.sleep(1.1)


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )


US = 1_000_000


def test_stream_candles_update_mode(spark, tmp_path):
    path = str(tmp_path / "in")
    rows = [
        (1, 0 * US, 10.0),
        (1, 3 * US, 30.0),
        (1, 9 * US, 20.0),   # window [0,10): open 10 high 30 low 10 close 20
        (1, 12 * US, 50.0),  # window [10,20)
    ]
    _write_batch(spark, path, rows)
    out = stream_candles(
        _stream(spark, path), ["code"], "ts", "value", width_seconds=10,
        watermark="5 seconds", tiebreak=["ts_us"],
    )
    q = run_to_memory(out, "candles_update", output_mode="update")
    try:
        got = {r.w_start.second: r for r in spark.sql("SELECT * FROM candles_update").collect()}
        w0 = got[0]
        assert (w0.open, w0.high, w0.low, w0.close, w0.n_trades) == (10.0, 30.0, 10.0, 20.0, 3)
        assert got[10].open == 50.0
    finally:
        q.stop()


def test_stream_candles_append_finalizes_on_watermark(spark, tmp_path):
    path = str(tmp_path / "in")
    # batch 1: window [0,10); batch 2 advances watermark past 10s -> emit w0
    _write_batch(spark, path, [(1, 1 * US, 10.0), (1, 9 * US, 20.0)])
    _write_batch(spark, path, [(1, 40 * US, 99.0)])
    out = stream_candles(
        _stream(spark, path), ["code"], "ts", "value", width_seconds=10,
        watermark="5 seconds", tiebreak=["ts_us"],
    )
    q = run_to_memory(out, "candles_append", output_mode="append")
    try:
        rows = spark.sql("SELECT * FROM candles_append").collect()
        finalized = [r for r in rows if r.w_start.second == 0]
        assert len(finalized) == 1
        assert (finalized[0].open, finalized[0].close) == (10.0, 20.0)
        # the 40s window is NOT final yet (watermark hasn't passed its end)
        assert all(r.w_start.second != 40 for r in rows)
    finally:
        q.stop()


def test_stream_late_row_dropped(spark, tmp_path):
    # NOTE Spark >= 3.4 filters late events against the PREVIOUS batch's
    # watermark (eviction uses the current one), so the late row must arrive
    # two batches after the watermark-advancing event to be discarded.
    path = str(tmp_path / "in")
    _write_batch(spark, path, [(1, 1 * US, 10.0)])
    _write_batch(spark, path, [(1, 120 * US, 50.0)])  # watermark -> 115s
    _write_batch(spark, path, [(1, 125 * US, 51.0)])  # late-filter wm now 115s
    _write_batch(spark, path, [(1, 2 * US, 99.0)])    # late beyond watermark
    out = stream_candles(
        _stream(spark, path), ["code"], "ts", "value", width_seconds=10,
        watermark="5 seconds", tiebreak=["ts_us"],
    )
    q = run_to_memory(out, "candles_late", output_mode="append")
    try:
        w0 = [r for r in spark.sql("SELECT * FROM candles_late").collect()
              if r.w_start.second == 0 and r.w_start.minute == 0]
        # late 99.0 was discarded: the [0,10) candle emitted once, only 10.0
        assert len(w0) == 1 and w0[0].n_trades == 1 and w0[0].high == 10.0
    finally:
        q.stop()


def test_stream_sliding_stats(spark, tmp_path):
    path = str(tmp_path / "in")
    _write_batch(spark, path, [(1, 2 * US, 10.0), (1, 7 * US, 30.0)])
    out = stream_sliding_stats(
        _stream(spark, path), ["code"], "ts", "value",
        width_seconds=10, slide_seconds=5, watermark="10 seconds",
    )
    q = run_to_memory(out, "slide", output_mode="update")
    try:
        rows = spark.sql("SELECT * FROM slide").collect()
        # event at 7s belongs to panes starting 0 and 5; event at 2s to -5 and 0
        pane0 = [r for r in rows if r.w_start.second == 0 and r.w_start.minute == 0]
        assert pane0[0].n_events == 2 and abs(pane0[0].avg_value - 20.0) < 1e-9
    finally:
        q.stop()


def test_stateful_ewma_checkpoint_recovery(spark, tmp_path):
    # T5: stop the query, append data, restart from the SAME checkpoint —
    # per-key EWMA state must resume, not reset (exactly-once state store)
    from crypto_market_data_etl_spark.streaming.sinks import foreach_batch_parquet_sink

    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    series = [10.0, 20.0, 15.0, 40.0, 5.0]
    _write_batch(spark, in_path, [(1, i * US, v) for i, v in enumerate(series[:3])])

    def start():
        stream = _stream(spark, in_path).select("code", "ts_us", "value")
        out = stateful_ewma(stream, key_col="code", ts_col="ts_us", value_col="value")
        return foreach_batch_parquet_sink(out, out_path, ckpt, output_mode="append").start()

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _write_batch(spark, in_path, [(1, (3 + i) * US, v) for i, v in enumerate(series[3:])])
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = (
        spark.read.parquet(out_path).orderBy("ts_us").toPandas()["ewma"].tolist()
    )
    expected = pd.Series(series).ewm(alpha=0.8, adjust=False).mean().tolist()
    # the post-restart rows continue the recurrence from checkpointed state
    assert got == pytest.approx(expected, rel=1e-12)


def test_stateful_ewma_bucketed_checkpoint_recovery(spark, tmp_path):
    """The bucketed form's ARRAY state (keys[], ewmas[]) must survive a
    query restart from checkpoint — the state-encoder round-trip is the
    novel risk vs the per-key scalar state."""
    from crypto_market_data_etl_spark.streaming.sinks import (
        foreach_batch_parquet_sink,
    )
    from crypto_market_data_etl_spark.streaming.stateful import (
        stateful_ewma_bucketed,
    )

    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    series = {1: [10.0, 20.0, 15.0, 40.0, 5.0], 2: [3.0, 9.0, 27.0, 81.0, 243.0]}
    _write_batch(
        spark, in_path,
        [(k, i * US, v) for k, vs in series.items() for i, v in enumerate(vs[:3])],
    )

    def start():
        stream = _stream(spark, in_path).select("code", "ts_us", "value")
        out = stateful_ewma_bucketed(
            stream, key_col="code", ts_col="ts_us", value_col="value", n_buckets=2
        )
        return foreach_batch_parquet_sink(out, out_path, ckpt, output_mode="append").start()

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    _write_batch(
        spark, in_path,
        [(k, (3 + i) * US, v) for k, vs in series.items() for i, v in enumerate(vs[3:])],
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out_path).orderBy("code", "ts_us").toPandas()
    for k, vs in series.items():
        expected = pd.Series(vs).ewm(alpha=0.8, adjust=False).mean().tolist()
        assert got[got.code == k]["ewma"].tolist() == pytest.approx(expected, rel=1e-12)


def test_two_concurrent_queries_one_session(spark, tmp_path):
    # T6: the reference runs two StreamingQuerys per app on daemon threads
    # (kafka_upbit_realtime_processing.py:208-217); Structured Streaming
    # handles concurrent queries natively — each with its own checkpoint.
    path = str(tmp_path / "in")
    _write_batch(spark, path, [(1, 1 * US, 10.0), (2, 2 * US, 20.0)])
    base = _stream(spark, path)
    q1 = run_to_memory(
        stream_candles(base, ["code"], "ts", "value", 10, "5 seconds", ["ts_us"]),
        "multi_a", output_mode="update",
    )
    q2 = run_to_memory(
        stream_sliding_stats(base, ["code"], "ts", "value", 10, 5, "5 seconds"),
        "multi_b", output_mode="update",
    )
    try:
        assert len(spark.streams.active) >= 2
        q1.processAllAvailable()
        q2.processAllAvailable()
        assert spark.sql("SELECT * FROM multi_a").count() == 2
        assert spark.sql("SELECT * FROM multi_b").count() == 4  # 2 keys x 2 panes
    finally:
        q1.stop()
        q2.stop()


def test_stateful_ofi_matches_batch_lag(spark, tmp_path):
    from crypto_market_data_etl_spark.operators.ewma import with_ofi
    from crypto_market_data_etl_spark.streaming.stateful import stateful_ofi

    rows = [
        # code, ts_us, bp, bs, ap, asz
        (1, 1, 100.0, 5.0, 101.0, 7.0),
        (1, 2, 100.0, 6.0, 101.0, 4.0),
        (1, 3, 101.0, 2.0, 102.0, 3.0),
        (1, 4, 100.5, 1.0, 101.5, 2.0),
    ]
    schema = (
        "code long, ts_us long, best_bid_price double, best_bid_size double, "
        "best_ask_price double, best_ask_size double"
    )
    in_path = str(tmp_path / "in")
    df1 = spark.createDataFrame(rows[:2], schema)
    df2 = spark.createDataFrame(rows[2:], schema)
    df1.coalesce(1).write.mode("append").parquet(in_path)
    time.sleep(1.1)
    df2.coalesce(1).write.mode("append").parquet(in_path)
    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", "1").parquet(in_path)
    )
    q = run_to_memory(stateful_ofi(stream), "sofi", output_mode="append")
    try:
        got = {r.ts_us: r.ofi for r in spark.sql("SELECT * FROM sofi").collect()}
    finally:
        q.stop()
    batch = with_ofi(spark.createDataFrame(rows, schema), ["code"], ["ts_us"])
    expected = {r.ts_us: r.ofi for r in batch.collect()}
    assert got == expected  # incl. state carrying across the batch boundary


def test_stateful_ofi_bucketed_matches_per_key(spark, tmp_path):
    """Bucketed OFI == per-key OFI over a multi-key, multi-batch replay:
    same values, same NULL-on-first-ever-row, state carried per key even
    when several keys collide into one bucket."""
    from crypto_market_data_etl_spark.streaming.stateful import (
        stateful_ofi,
        stateful_ofi_bucketed,
    )

    rng = np.random.default_rng(5)
    schema = (
        "code long, ts_us long, best_bid_price double, best_bid_size double, "
        "best_ask_price double, best_ask_size double"
    )
    batches = []
    for b in range(3):
        rows = []
        for k in range(5):
            if (k + b) % 3 == 0:  # key skips this batch
                continue
            for i in range(4):
                bp = float(100 + rng.integers(-2, 3))
                rows.append(
                    (k, b * 100 + i * 3 + k, bp, float(rng.integers(1, 9)),
                     bp + 1.0, float(rng.integers(1, 9)))
                )
        batches.append(rows)

    def replay(fn, name, path, **kw):
        for rows in batches:
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(path)
            time.sleep(1.1)
        stream = (
            spark.readStream.schema(spark.read.parquet(path).schema)
            .option("maxFilesPerTrigger", "1").parquet(path)
        )
        q = run_to_memory(fn(stream, **kw), name, output_mode="append")
        try:
            return spark.sql(f"SELECT * FROM {name} ORDER BY code, ts_us").toPandas()
        finally:
            q.stop()

    a = replay(stateful_ofi, "ofi_pk", str(tmp_path / "a"))
    b = replay(stateful_ofi_bucketed, "ofi_bk", str(tmp_path / "b"), n_buckets=2)
    assert a["code"].tolist() == b["code"].tolist()
    assert a["ts_us"].tolist() == b["ts_us"].tolist()
    av, bv = a["ofi"].to_numpy(), b["ofi"].to_numpy()
    assert ((av == bv) | (np.isnan(av) & np.isnan(bv))).all()
    assert np.isnan(av).sum() == 5  # exactly one first-ever NULL per key


def test_stateful_dollar_bars_match_batch(spark, tmp_path):
    # streaming bar assignment must equal the batch operator on the same data
    from crypto_market_data_etl_spark.operators.bars import dollar_bars

    path = str(tmp_path / "in")
    rows1 = [(1, i * US, float(v)) for i, v in enumerate([4, 4, 4])]
    rows2 = [(1, (3 + i) * US, float(v)) for i, v in enumerate([4, 4, 4])]
    _write_batch(spark, path, rows1)
    _write_batch(spark, path, rows2)
    stream = _stream(spark, path).select(
        "code", "ts_us", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    out = stateful_dollar_bars(stream, "code", "ts_us", "cents", bar_cents=1000)
    q = run_to_memory(out, "sbars", output_mode="append")
    try:
        got = {
            r.ts_us: (r.cum_cents, r.bar_num)
            for r in spark.sql("SELECT * FROM sbars").collect()
        }
    finally:
        q.stop()
    batch_df = spark.createDataFrame(rows1 + rows2, "code long, ts_us long, value double")
    expected_bars = dollar_bars(batch_df, ["code"], "ts_us", "value", 10.0)
    # per-event check: cum goes 400..2400, bars [0,0,1,1,1,2] across batches
    assert [got[i * US] for i in range(6)] == [
        (400, 0), (800, 0), (1200, 1), (1600, 1), (2000, 1), (2400, 2),
    ]
    # and the bar ids seen match the batch operator's bars
    assert {b.bar_num for b in expected_bars.collect()} == {v[1] for v in got.values()}


def test_stateful_dollar_bars_passthrough_ohlc_matches_batch(spark, tmp_path):
    """Passthrough columns (price, seq id) ride the streamed assignment
    across micro-batches, so a downstream groupBy reproduces the batch
    operator's full OHLCV — the q30 gate pipeline, exercised cross-batch."""
    from crypto_market_data_etl_spark.operators.bars import dollar_bars
    from crypto_market_data_etl_spark.operators.candles import ohlcv_aggs

    path = str(tmp_path / "in")
    prices = [4.0, 6.0, 2.0, 5.0, 3.0, 4.0]
    rows = [(1, i * US, prices[i]) for i in range(6)]
    _write_batch(spark, path, rows[:3])
    _write_batch(spark, path, rows[3:])
    stream = _stream(spark, path).select(
        "code", "ts_us", "value",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    out = stateful_dollar_bars(
        stream, "code", "ts_us", "cents", bar_cents=1000,
        passthrough_cols=["value"],
    )
    q = run_to_memory(out, "sbars_pt", output_mode="append")
    try:
        streamed_bars = {
            (r.code, r.bar_num): (r.open, r.high, r.low, r.close, r.n_trades, r.notional)
            for r in spark.table("sbars_pt")
            .groupBy("code", "bar_num")
            .agg(*ohlcv_aggs("value", "ts_us", [], volume_cents_col="cents"))
            .withColumnRenamed("volume", "notional")
            .collect()
        }
    finally:
        q.stop()
    batch_df = spark.createDataFrame(rows, "code long, ts_us long, value double")
    batch_bars = {
        (r.code, r.bar_num): (r.open, r.high, r.low, r.close, r.n_trades, r.notional)
        for r in dollar_bars(batch_df, ["code"], "ts_us", "value", 10.0).collect()
    }
    assert streamed_bars == batch_bars and len(streamed_bars) >= 2


def test_stream_stream_join(spark, tmp_path):
    # T8 family: stream-stream inner join with watermarks + time band
    la, lb = str(tmp_path / "a"), str(tmp_path / "b")
    _write_batch(spark, la, [(1, 10 * US, 1.0), (2, 50 * US, 2.0)])
    _write_batch(spark, lb, [(1, 12 * US, 9.0), (2, 200 * US, 8.0)])
    a = _stream(spark, la).select(
        "code", F.col("ts").alias("a_ts"), F.col("value").alias("a_val")
    ).withWatermark("a_ts", "10 seconds")
    b = _stream(spark, lb).select(
        F.col("code").alias("b_code"), F.col("ts").alias("b_ts"),
        F.col("value").alias("b_val"),
    ).withWatermark("b_ts", "10 seconds")
    joined = a.join(
        b,
        (F.col("code") == F.col("b_code"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 5 SECONDS")),
    )
    q = run_to_memory(joined, "ssjoin", output_mode="append")
    try:
        rows = spark.sql("SELECT code, a_val, b_val FROM ssjoin").collect()
        assert [(r.code, r.a_val, r.b_val) for r in rows] == [(1, 1.0, 9.0)]
    finally:
        q.stop()


def test_session_window_stream(spark, tmp_path):
    # T8 family: session windows close after the gap elapses in event time
    path = str(tmp_path / "in")
    _write_batch(spark, path, [
        (1, 0 * US, 1.0), (1, 3 * US, 2.0),   # session A: [0, 3+5)
        (1, 20 * US, 5.0),                     # session B
        (1, 60 * US, 9.0),                     # advances watermark, closes A+B
    ])
    stream = _stream(spark, path)
    agg = (
        stream.withWatermark("ts", "5 seconds")
        .groupBy(F.session_window("ts", "5 seconds").alias("w"), "code")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    q = run_to_memory(agg, "sessions", output_mode="append")
    try:
        rows = {r.w.start.second: r for r in spark.sql("SELECT * FROM sessions").collect()}
        assert rows[0].n == 2 and rows[0].total == 3.0
        assert rows[0].w.end.second == 8  # last event + gap
        assert rows[20].n == 1 and rows[20].total == 5.0
    finally:
        q.stop()


def test_streaming_dedup_within_watermark(spark, tmp_path):
    # T8 family: watermarked dropDuplicates — exact dedup on a stream with
    # bounded state (the streaming arm of operators/dedup.exact_dedup)
    path = str(tmp_path / "in")
    _write_batch(spark, path, [(1, 1 * US, 10.0), (1, 1 * US, 10.0), (2, 2 * US, 5.0)])
    _write_batch(spark, path, [(1, 1 * US, 10.0), (3, 3 * US, 7.0)])  # replayed dup
    stream = _stream(spark, path)
    deduped = stream.withWatermark("ts", "1 minute").dropDuplicates(["code", "ts"])
    q = run_to_memory(deduped, "dedup_stream", output_mode="append")
    try:
        rows = spark.sql("SELECT code, count(*) n FROM dedup_stream GROUP BY code").collect()
        assert {r.code: r.n for r in rows} == {1: 1, 2: 1, 3: 1}
    finally:
        q.stop()


def test_foreach_batch_parquet_sink_idempotent(spark, tmp_path):
    from crypto_market_data_etl_spark.streaming.sinks import foreach_batch_parquet_sink

    in_path = str(tmp_path / "in")
    out_path = str(tmp_path / "out")
    _write_batch(spark, in_path, [(1, 1 * US, 10.0), (2, 2 * US, 20.0)])
    _write_batch(spark, in_path, [(3, 3 * US, 30.0)])
    stream = _stream(spark, in_path).select("code", "ts_us", "value")
    q = foreach_batch_parquet_sink(
        stream, out_path, str(tmp_path / "ckpt")
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(out_path)
    assert got.count() == 3
    assert {r.batch_id for r in got.select("batch_id").distinct().collect()} == {0, 1}
    # replaying batch 0 (same id) overwrites, not duplicates
    b0 = spark.read.parquet(out_path).filter(F.col("batch_id") == 0).drop("batch_id")
    b0_df = spark.createDataFrame(b0.collect(), b0.schema)
    b0_df.write.mode("overwrite").parquet(out_path + "/batch_id=0")
    assert spark.read.parquet(out_path).count() == 3


def test_stateful_ewma_across_microbatches(spark, tmp_path):
    path = str(tmp_path / "in")
    series = [(1, i * US, float(v)) for i, v in enumerate([10, 20, 15, 40, 5])]
    # two files -> two micro-batches (maxFilesPerTrigger=1): state must carry
    _write_batch(spark, path, series[:3])
    _write_batch(spark, path, series[3:])
    stream = _stream(spark, path).select("code", "ts_us", "value")
    out = stateful_ewma(stream, key_col="code", ts_col="ts_us", value_col="value")
    q = run_to_memory(out, "ewma_out", output_mode="append")
    try:
        got = (
            spark.sql("SELECT * FROM ewma_out ORDER BY ts_us").toPandas()["ewma"].tolist()
        )
        expected = (
            pd.Series([10.0, 20.0, 15.0, 40.0, 5.0]).ewm(alpha=0.8, adjust=False).mean().tolist()
        )
        assert got == pytest.approx(expected, rel=1e-12)
    finally:
        q.stop()


def test_stateful_ewma_bucketed_matches_per_key(spark, tmp_path):
    """The bucket-grouped form (hash(key)%n grouping, grouped-ewm across
    keys, array state) is bit-for-bit equal to the per-key form — including
    keys that skip a micro-batch (state must survive untouched) and several
    keys colliding into one bucket (n_buckets=2 over 7 keys)."""
    from crypto_market_data_etl_spark.streaming.stateful import (
        stateful_ewma_bucketed,
    )

    rng = np.random.default_rng(7)
    keys = list(range(7))
    batches = []
    for b in range(3):
        rows = []
        for k in keys:
            if (k + b) % 3 == 0:  # key absent from this batch
                continue
            for i in range(4):
                rows.append((k, (b * 100 + k * 10 + i) * US, float(rng.integers(1, 100))))
        batches.append(rows)

    def replay(fn, name, path, **kw):
        for rows in batches:
            _write_batch(spark, path, rows)
        stream = _stream(spark, path).select("code", "ts_us", "value")
        q = run_to_memory(fn(stream, key_col="code", **kw), name, output_mode="append")
        try:
            return (
                spark.sql(f"SELECT * FROM {name} ORDER BY code, ts_us").toPandas()
            )
        finally:
            q.stop()

    a = replay(stateful_ewma, "ewma_pk", str(tmp_path / "a"))
    b = replay(stateful_ewma_bucketed, "ewma_bk", str(tmp_path / "b"), n_buckets=2)
    assert a["code"].tolist() == b["code"].tolist()
    assert a["ts_us"].tolist() == b["ts_us"].tolist()
    assert a["ewma"].tolist() == b["ewma"].tolist()  # exact, not approx


def test_stateful_per_key_multi_chunk_disorder(spark, tmp_path):
    """A single key whose micro-batch spans several Arrow chunks, written in
    REVERSED ts order (so the chunk iterator's arrival order maximally
    disagrees with event time): per-chunk processing with carried state
    produced wrong recurrences here (the q28-at-sf0.1 mismatch); the fixed
    per-key ops concat the group before sorting."""
    from crypto_market_data_etl_spark.streaming.stateful import stateful_ewma

    n = 25_000  # > 2 Arrow chunks at the 10k default
    rows = [(1, i * 1000, float((i * 31) % 97)) for i in range(n)]
    df = spark.createDataFrame(
        list(reversed(rows)), "code long, ts_us long, value double"
    ).coalesce(1)
    path = str(tmp_path / "in")
    # sortWithinPartitions preserves the reversed insert order in the file
    df.write.parquet(path)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", "1").parquet(path)
    )
    out = stateful_ewma(stream, key_col="code", ts_col="ts_us", value_col="value")
    q = run_to_memory(out, "ewma_rev_chunks", output_mode="append")
    try:
        got = spark.sql(
            "SELECT * FROM ewma_rev_chunks ORDER BY ts_us"
        ).toPandas()["ewma"].to_numpy()
    finally:
        q.stop()
    expected = (
        pd.Series([v for _, _, v in rows]).ewm(alpha=0.8, adjust=False).mean().to_numpy()
    )
    assert len(got) == n
    assert got == pytest.approx(expected, rel=1e-12)


def test_stateful_ewma_bucketed_multi_chunk(spark, tmp_path):
    """A bucket whose micro-batch exceeds the Arrow batch size arrives as
    MULTIPLE pdf chunks — the concat path must still produce the exact
    recurrence (n_buckets=1 + 12k rows > the 10k default slice)."""
    from crypto_market_data_etl_spark.streaming.stateful import (
        stateful_ewma_bucketed,
    )

    n, keys = 12_000, 7
    rows = [(i % keys, i * US, float((i * 31) % 97)) for i in range(n)]
    path = str(tmp_path / "in")
    _write_batch(spark, path, rows)
    stream = _stream(spark, path).select("code", "ts_us", "value")
    out = stateful_ewma_bucketed(stream, key_col="code", n_buckets=1)
    q = run_to_memory(out, "ewma_chunks", output_mode="append")
    try:
        got = spark.sql(
            "SELECT * FROM ewma_chunks ORDER BY code, ts_us"
        ).toPandas()
    finally:
        q.stop()
    assert len(got) == n
    pdf = pd.DataFrame(rows, columns=["code", "ts_us", "value"]).sort_values(
        ["code", "ts_us"]
    )
    expected = pdf.groupby("code")["value"].transform(
        lambda s: s.ewm(alpha=0.8, adjust=False).mean()
    )
    assert got["ewma"].to_numpy() == pytest.approx(expected.to_numpy(), rel=1e-12)


def test_stateful_dollar_bars_bucketed_matches_per_key(spark, tmp_path):
    """Bucketed streaming dollar bars == per-key form: same cum_cents/bar_num
    trajectory (carried offsets per key), passthrough columns intact."""
    from crypto_market_data_etl_spark.streaming.stateful import (
        stateful_dollar_bars,
        stateful_dollar_bars_bucketed,
    )

    rng = np.random.default_rng(11)
    batches = []
    for b in range(3):
        rows = []
        for k in range(6):
            if (k + b) % 4 == 0:
                continue
            for i in range(5):
                rows.append((k, (b * 100 + i * 3 + k) * US, float(rng.integers(1, 500))))
        batches.append(rows)

    def replay(fn, name, path, **kw):
        for rows in batches:
            _write_batch(spark, path, rows)
        stream = _stream(spark, path).withColumn(
            "cents", F.round(F.col("value") * 100).cast("bigint")
        )
        out = fn(
            stream, key_col="code", ts_col="ts_us", notional_cents_col="cents",
            bar_cents=50_000, passthrough_cols=["value"], **kw,
        )
        q = run_to_memory(out, name, output_mode="append")
        try:
            return spark.sql(f"SELECT * FROM {name} ORDER BY code, ts_us").toPandas()
        finally:
            q.stop()

    a = replay(stateful_dollar_bars, "bars_pk", str(tmp_path / "a"))
    b = replay(
        stateful_dollar_bars_bucketed, "bars_bk", str(tmp_path / "b"), n_buckets=2
    )
    for col in ("code", "ts_us", "cents", "value", "cum_cents", "bar_num"):
        assert a[col].tolist() == b[col].tolist(), col


def test_stateful_ewma_bucketed_string_key(spark, tmp_path):
    # n_buckets=1: every key lands in ONE group — the hardest multi-key
    # vectorized path (object-dtype lexsort + segment extraction)
    from crypto_market_data_etl_spark.streaming.stateful import (
        stateful_ewma_bucketed,
    )

    path = str(tmp_path / "in")
    df = spark.createDataFrame(
        [("KRW-BTC", 1 * US, 10.0), ("KRW-BTC", 2 * US, 20.0), ("KRW-ETH", 1 * US, 5.0)],
        "code string, ts_us long, value double",
    )
    df.coalesce(1).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", "1").parquet(path)
    )
    out = stateful_ewma_bucketed(stream, key_col="code", n_buckets=1)
    q = run_to_memory(out, "ewma_bkt_str", output_mode="append")
    try:
        rows = {(r.code, r.ts_us): r.ewma for r in spark.sql("SELECT * FROM ewma_bkt_str").collect()}
        assert rows[("KRW-BTC", 1 * US)] == 10.0
        assert abs(rows[("KRW-BTC", 2 * US)] - (0.8 * 20.0 + 0.2 * 10.0)) < 1e-12
        assert rows[("KRW-ETH", 1 * US)] == 5.0
    finally:
        q.stop()


def test_stream_sliding_paned_matches_batch(spark, tmp_path):
    """Chained stateful aggs (pane -> sliding merge) emit exactly the batch
    pane-path rows once the watermark passes, bit-for-bit (shared exact
    integer partials + shared final expressions)."""
    from crypto_market_data_etl_spark.operators.candles import sliding_stats_paned
    from crypto_market_data_etl_spark.streaming.candles import (
        stream_sliding_stats_paned,
    )

    path = str(tmp_path / "in")
    rows1 = [(1, 2 * US, 10.25), (1, 7 * US, 30.5), (2, 3 * US, 7.75)]
    rows2 = [(1, 12 * US, 20.0), (2, 14 * US, 7.75), (1, 22 * US, 5.0)]
    _write_batch(spark, path, rows1)
    _write_batch(spark, path, rows2)
    # future-dated row: advances the watermark far enough to finalize both
    # stateful levels for every window of rows1+rows2
    _write_batch(spark, path, [(1, 500 * US, 1.0)])

    cents = F.round(F.col("value") * 100).cast("bigint")
    out = stream_sliding_stats_paned(
        _stream(spark, path).withColumn("cents", cents),
        ["code"], "ts", "cents",
        width_seconds=10, slide_seconds=5, watermark="5 seconds",
    )
    q = run_to_memory(out, "slide_paned", output_mode="append")
    try:
        got = {
            (r.w_start, r.code): (r.n_events, r.avg_value, r.stddev_value)
            for r in spark.sql("SELECT * FROM slide_paned").collect()
        }
    finally:
        q.stop()

    batch_df = (
        spark.createDataFrame(rows1 + rows2, "code long, ts_us long, value double")
        .withColumn("ts", F.timestamp_micros("ts_us"))
        .withColumn("cents", cents)
    )
    want = {
        (r.w_start, r.code): (r.n_events, r.avg_value, r.stddev_value)
        for r in sliding_stats_paned(batch_df, ["code"], "ts", 10, 5, "cents").collect()
    }
    assert got == want  # exact: integer partials merge identically


def test_continuous_aggregate_matches_batch_partials(spark, tmp_path):
    """Streaming-maintained partial store (update mode -> versioned parquet
    log -> merge-on-read) resolves exactly to a batch candle_partials
    recompute, survives compaction, and serves rollups identically."""
    from crypto_market_data_etl_spark.operators.candles import (
        candle_partials,
        rollup_candles,
    )
    from crypto_market_data_etl_spark.streaming.continuous_agg import (
        compact_continuous_aggregate,
        read_continuous_aggregate,
        stream_candle_partials,
    )
    from crypto_market_data_etl_spark.streaming.sinks import (
        foreach_batch_parquet_sink,
    )

    in_path = str(tmp_path / "in")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    W_US = 10 * US  # 10-second candle buckets
    # bucket 0 and key 1 get touched by several micro-batches -> the log
    # holds multiple generations that merge-on-read must resolve
    batches = [
        [(1, 2 * US, 10.0), (1, 7 * US, 30.0), (2, 3 * US, 7.5)],
        [(1, 9 * US, 20.0), (1, 12 * US, 40.0)],
        [(2, 8 * US, 9.5), (1, 14 * US, 35.0), (1, 21 * US, 50.0)],
    ]
    for rows in batches:
        _write_batch(spark, in_path, rows)

    cents = F.round(F.col("value") * 100).cast("bigint")
    partials = stream_candle_partials(
        _stream(spark, in_path).withColumn("cents", cents),
        ["code"], "ts", "ts_us", "value", W_US, [], "cents",
        watermark="1 hour",  # keep every group live: order-independent test
    )
    q = foreach_batch_parquet_sink(partials, store, ckpt).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def snap(df):
        return {
            (r.bucket, r.code): (
                r.open, r.high, r.low, r.close, r.n_trades,
                tuple(r.first_key), tuple(r.last_key), r.cents,
            )
            for r in df.collect()
        }

    all_rows = [r for b in batches for r in b]
    batch_df = (
        spark.createDataFrame(all_rows, "code long, ts_us long, value double")
        .withColumn("cents", cents)
    )
    want = snap(candle_partials(batch_df, ["code"], "ts_us", "value", W_US, [], "cents"))
    resolved = read_continuous_aggregate(spark, store, ["code"])
    assert snap(resolved) == want

    # the log really is incremental: >1 generation for the hot (bucket, key)
    log = spark.read.parquet(store)
    gens = log.groupBy("bucket", "code").count().filter("count > 1").count()
    assert gens >= 1

    # compaction preserves the resolved state
    compacted = str(tmp_path / "compacted")
    compact_continuous_aggregate(spark, store, compacted, ["code"])
    assert snap(read_continuous_aggregate(spark, compacted, ["code"])) == want

    # serving: coarse rollup from the maintained store == rollup from batch
    got_daily = snap(rollup_candles(resolved, ["code"], 3).withColumn("code", F.col("code")))
    want_daily = snap(
        rollup_candles(
            candle_partials(batch_df, ["code"], "ts_us", "value", W_US, [], "cents"),
            ["code"], 3,
        )
    )
    assert got_daily == want_daily


def test_file_stream_writer_native_partitioned_sink(spark, tmp_path):
    # S6: writeStream.format("parquet").partitionBy(...) + checkpoint, the
    # reference's archival shape (kafka_to_gcs_by_spark_streaming.py:74-88)
    from crypto_market_data_etl_spark.streaming.sinks import file_stream_writer

    in_path, out_path = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, in_path, [(1, 1 * US, 10.0), (2, 2 * US, 20.0)])
    _write_batch(spark, in_path, [(1, 3 * US, 30.0)])
    q = file_stream_writer(
        _stream(spark, in_path), out_path, ckpt, partition_cols=["code"]
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(out_path)
    assert back.count() == 3
    assert {r["code"] for r in back.select("code").distinct().collect()} == {1, 2}
    # partition pruning must reach the scan: code is a directory column
    import os

    assert any(d.startswith("code=") for d in os.listdir(out_path))
    # exactly-once bookkeeping: the file sink wrote its commit log
    assert os.path.isdir(os.path.join(out_path, "_spark_metadata"))

    # restart with the same checkpoint: no duplication, new data flows
    _write_batch(spark, in_path, [(2, 4 * US, 40.0)])
    q2 = file_stream_writer(
        _stream(spark, in_path), out_path, ckpt, partition_cols=["code"]
    ).start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(out_path).count() == 4


def test_console_stream_writer_runs(spark, tmp_path):
    # S8: console sink (kafka_spark_consumer_test_code.py:119-127)
    from crypto_market_data_etl_spark.streaming.sinks import console_stream_writer

    in_path = str(tmp_path / "in")
    _write_batch(spark, in_path, [(1, 1 * US, 10.0)])
    q = console_stream_writer(_stream(spark, in_path), num_rows=5).start()
    try:
        q.processAllAvailable()
        assert q.lastProgress is not None
    finally:
        q.stop()


def test_stateful_ewma_string_key(spark, tmp_path):
    # key/ts schemas derive from the input — the reference's `code` is a
    # STRING (schemas.py TRADE_SCHEMA); state ops must not assume long keys
    path = str(tmp_path / "in")
    df = spark.createDataFrame(
        [("KRW-BTC", 1 * US, 10.0), ("KRW-BTC", 2 * US, 20.0), ("KRW-ETH", 1 * US, 5.0)],
        "code string, ts_us long, value double",
    )
    df.coalesce(1).write.mode("append").parquet(path)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", "1").parquet(path)
    )
    out = stateful_ewma(stream, key_col="code")
    q = run_to_memory(out, "ewma_str_key", output_mode="append")
    try:
        rows = {(r.code, r.ts_us): r.ewma for r in spark.sql("SELECT * FROM ewma_str_key").collect()}
        assert rows[("KRW-BTC", 1 * US)] == 10.0
        assert abs(rows[("KRW-BTC", 2 * US)] - (0.8 * 20.0 + 0.2 * 10.0)) < 1e-12
        assert rows[("KRW-ETH", 1 * US)] == 5.0
    finally:
        q.stop()


def test_stateful_asof_enrich_matches_batch(spark, tmp_path):
    """Streaming as-of enrichment == batch asof_join on the same replay,
    including a snapshot carried as state across micro-batch boundaries."""
    from crypto_market_data_etl_spark.operators.asof import asof_join
    from crypto_market_data_etl_spark.streaming.stateful import stateful_asof_enrich

    tdir, sdir = str(tmp_path / "trades"), str(tmp_path / "snaps")
    t_schema = "code long, ts_us long, price double"
    s_schema = "code long, ts_us long, bid double, ask double"

    # batch 1: snapshot @1s, trades @2s,3s; batch 2: trade @4s BEFORE its own
    # snapshot arrives (must enrich from batch-1 state), snapshot @5s, trade @6s
    t1 = [(1, 2 * US, 100.0), (1, 3 * US, 101.0)]
    s1 = [(1, 1 * US, 99.0, 99.5)]
    t2 = [(1, 4 * US, 102.0), (1, 6 * US, 103.0), (2, 6 * US, 50.0)]
    s2 = [(1, 5 * US, 98.0, 98.5)]

    def write(path, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)

    write(tdir, t_schema, t1), write(sdir, s_schema, s1)
    time.sleep(1.1)
    write(tdir, t_schema, t2), write(sdir, s_schema, s2)

    tr = spark.readStream.schema(t_schema).option("maxFilesPerTrigger", "1").parquet(tdir)
    sn = spark.readStream.schema(s_schema).option("maxFilesPerTrigger", "1").parquet(sdir)
    out = stateful_asof_enrich(tr, sn, key_col="code", ts_col="ts_us")
    q = (
        out.writeStream.format("memory").queryName("asof_enrich")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.code, r.ts_us): (r.price, r.ts_us_r, r.bid_r, r.ask_r)
            for r in spark.table("asof_enrich").collect()
        }
    finally:
        q.stop()

    assert got == {
        (1, 2 * US): (100.0, 1 * US, 99.0, 99.5),
        (1, 3 * US): (101.0, 1 * US, 99.0, 99.5),
        (1, 4 * US): (102.0, 1 * US, 99.0, 99.5),  # state from batch 1
        (1, 6 * US): (103.0, 5 * US, 98.0, 98.5),
        (2, 6 * US): (50.0, None, None, None),     # no snapshot ever: left outer
    }

    # batch twin on the full data agrees (unbounded tolerance ~ huge band)
    bt = spark.createDataFrame(t1 + t2, t_schema)
    bs = spark.createDataFrame(s1 + s2, s_schema)
    batch = asof_join(
        bt, bs, on=["code"], left_ts="ts_us", right_ts="ts_us",
        tolerance=10**9, left_keys=["code", "ts_us"],
    )
    bgot = {
        (r.code, r.ts_us): (r.price, r.ts_us_r, r.bid_r, r.ask_r)
        for r in batch.collect()
    }
    assert bgot == got


def test_stateful_asof_enrich_bucketed_matches_per_key(spark, tmp_path):
    """Bucketed as-of enrich == per-key form over a multi-key randomized
    replay with int64 payloads (validity transport), never-snapshotted keys
    (left outer), a tolerance band, and cross-batch state carry — all keys
    forced into 2 buckets."""
    from crypto_market_data_etl_spark.streaming.stateful import (
        stateful_asof_enrich,
        stateful_asof_enrich_bucketed,
    )

    rng = np.random.default_rng(13)
    t_schema = "code long, ts_us long, price double, seq long"
    s_schema = "code long, ts_us long, bid double, qty long"
    t_batches, s_batches = [], []
    seq = 0
    for b in range(3):
        t_rows, s_rows = [], []
        for k in range(5):
            base = b * 100
            for i in range(3):
                seq += 1
                t_rows.append(
                    (k, (base + i * 7 + k) * US, float(rng.integers(90, 110)), seq)
                )
            if k != 4 and (k + b) % 2 == 0:  # key 4 never gets a snapshot
                s_rows.append(
                    (k, (base + k) * US, float(rng.integers(80, 120)),
                     int(rng.integers(1, 1000)))
                )
        t_batches.append(t_rows), s_batches.append(s_rows)

    def replay(fn, name, root, **kw):
        tdir, sdir = f"{root}/t", f"{root}/s"
        for t_rows, s_rows in zip(t_batches, s_batches):
            spark.createDataFrame(t_rows, t_schema).coalesce(1).write.mode(
                "append"
            ).parquet(tdir)
            spark.createDataFrame(
                s_rows or [(99, 0, 0.0, 0)], s_schema
            ).coalesce(1).write.mode("append").parquet(sdir)
            time.sleep(1.1)
        tr = spark.readStream.schema(t_schema).option("maxFilesPerTrigger", "1").parquet(tdir)
        sn = spark.readStream.schema(s_schema).option("maxFilesPerTrigger", "1").parquet(sdir)
        out = fn(tr, sn, key_col="code", ts_col="ts_us", tolerance=50 * US, **kw)
        q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
        try:
            q.processAllAvailable()
            return spark.sql(
                f"SELECT * FROM {name} ORDER BY code, ts_us, seq"
            ).toPandas()
        finally:
            q.stop()

    a = replay(stateful_asof_enrich, "asof_pk", str(tmp_path / "a"))
    b = replay(
        stateful_asof_enrich_bucketed, "asof_bk", str(tmp_path / "b"), n_buckets=2
    )
    assert list(a.columns) == list(b.columns)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        both_na = pd.isna(a[col]).to_numpy() & pd.isna(b[col]).to_numpy()
        assert ((av == bv) | both_na).all(), col


def test_stateful_asof_enrich_tolerance_and_equal_ts(spark, tmp_path):
    """Equal-ts snapshot is visible to its trade (<= semantics); stale
    snapshots beyond the tolerance band null out but state advances."""
    from crypto_market_data_etl_spark.streaming.stateful import stateful_asof_enrich

    tdir, sdir = str(tmp_path / "trades"), str(tmp_path / "snaps")
    t_schema = "code long, ts_us long, price double"
    s_schema = "code long, ts_us long, bid double, ask double"
    spark.createDataFrame(
        [(1, 2 * US, 100.0), (1, 10 * US, 101.0)], t_schema
    ).coalesce(1).write.parquet(tdir)
    spark.createDataFrame(
        [(1, 2 * US, 99.0, 99.5)], s_schema
    ).coalesce(1).write.parquet(sdir)

    tr = spark.readStream.schema(t_schema).parquet(tdir)
    sn = spark.readStream.schema(s_schema).parquet(sdir)
    out = stateful_asof_enrich(
        tr, sn, key_col="code", ts_col="ts_us", tolerance=3 * US
    )
    q = (
        out.writeStream.format("memory").queryName("asof_tol")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {r.ts_us: (r.ts_us_r, r.bid_r) for r in spark.table("asof_tol").collect()}
    finally:
        q.stop()
    assert got == {
        2 * US: (2 * US, 99.0),   # equal-ts snapshot counts
        10 * US: (None, None),    # 8s-old snapshot outside the 3s band
    }


def test_stateful_asof_enrich_mixed_payload_dtypes(spark, tmp_path):
    """String and big-int snapshot payloads survive the forward-fill in
    their native dtypes: object ffill for strings (previously a ValueError
    through a float64 astype), exact int64 for values past 2^53 (previously
    silently rounded through Arrow's long-with-null float64), and a genuine
    NULL in a snapshot payload stays NULL (never conflated with the
    zero-fill transport)."""
    from crypto_market_data_etl_spark.streaming.stateful import stateful_asof_enrich

    big = 2**60 + 1  # not representable in float64
    tdir, sdir = str(tmp_path / "trades"), str(tmp_path / "snaps")
    t_schema = "code long, ts_us long, seq long"
    s_schema = "code long, ts_us long, venue string, book_id long"
    spark.createDataFrame(
        [(1, 2 * US, big + 7), (1, 6 * US, None)], t_schema
    ).coalesce(1).write.parquet(tdir)
    spark.createDataFrame(
        [(1, 1 * US, "upbit", big), (1, 5 * US, None, None)], s_schema
    ).coalesce(1).write.parquet(sdir)

    tr = spark.readStream.schema(t_schema).parquet(tdir)
    sn = spark.readStream.schema(s_schema).parquet(sdir)
    out = stateful_asof_enrich(tr, sn, key_col="code", ts_col="ts_us")
    q = (
        out.writeStream.format("memory").queryName("asof_mixed")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.ts_us: (r.seq, r.ts_us_r, r.venue_r, r.book_id_r)
            for r in spark.table("asof_mixed").collect()
        }
    finally:
        q.stop()
    assert got == {
        2 * US: (big + 7, 1 * US, "upbit", big),      # exact, not float-rounded
        6 * US: (None, 5 * US, None, None),           # genuine NULLs preserved
    }


def test_stateful_asof_enrich_big_int_state_across_batches(spark, tmp_path):
    """A >2^53 snapshot payload carried as STATE into a later micro-batch
    comes back exact (the state round-trip must not pass through float64)."""
    from crypto_market_data_etl_spark.streaming.stateful import stateful_asof_enrich

    big = 2**61 + 3
    tdir, sdir = str(tmp_path / "trades"), str(tmp_path / "snaps")
    t_schema = "code long, ts_us long, price double"
    s_schema = "code long, ts_us long, book_id long"

    def write(path, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)

    write(sdir, s_schema, [(1, 1 * US, big)])
    write(tdir, t_schema, [(1, 2 * US, 100.0)])
    time.sleep(1.1)
    write(tdir, t_schema, [(1, 4 * US, 101.0)])  # enriched from carried state

    tr = spark.readStream.schema(t_schema).option("maxFilesPerTrigger", "1").parquet(tdir)
    sn = spark.readStream.schema(s_schema).parquet(sdir)
    out = stateful_asof_enrich(tr, sn, key_col="code", ts_col="ts_us")
    q = (
        out.writeStream.format("memory").queryName("asof_bigstate")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {r.ts_us: r.book_id_r for r in spark.table("asof_bigstate").collect()}
    finally:
        q.stop()
    assert got == {2 * US: big, 4 * US: big}


def test_stateful_asof_enrich_array_payload_across_batches(spark, tmp_path):
    """An array-typed snapshot payload (order-book depth levels) forward-
    fills within a batch AND survives the cross-batch state round-trip as a
    list — a masked numpy assign would scatter its ELEMENTS across slots,
    and GroupState.update needs a plain list, not an ndarray."""
    from crypto_market_data_etl_spark.streaming.stateful import stateful_asof_enrich

    tdir, sdir = str(tmp_path / "trades"), str(tmp_path / "snaps")
    t_schema = "code long, ts_us long, price double"
    s_schema = "code long, ts_us long, depth array<double>"

    def write(path, schema, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(path)

    write(sdir, s_schema, [(1, 1 * US, [99.0, 98.5, 98.0])])
    write(tdir, t_schema, [(1, 2 * US, 100.0)])
    time.sleep(1.1)
    # two trades in batch 2: first BEFORE the new snapshot (filled from the
    # batch-1 state — the list-valued seed path), second after it
    write(sdir, s_schema, [(1, 5 * US, [97.0, 96.5])])
    write(tdir, t_schema, [(1, 4 * US, 101.0), (1, 6 * US, 102.0)])

    tr = spark.readStream.schema(t_schema).option("maxFilesPerTrigger", "1").parquet(tdir)
    sn = spark.readStream.schema(s_schema).option("maxFilesPerTrigger", "1").parquet(sdir)
    out = stateful_asof_enrich(tr, sn, key_col="code", ts_col="ts_us")
    q = (
        out.writeStream.format("memory").queryName("asof_arraystate")
        .outputMode("append").start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.ts_us: (r.ts_us_r, list(r.depth_r) if r.depth_r is not None else None)
            for r in spark.table("asof_arraystate").collect()
        }
    finally:
        q.stop()
    assert got == {
        2 * US: (1 * US, [99.0, 98.5, 98.0]),
        4 * US: (1 * US, [99.0, 98.5, 98.0]),  # list-valued state carry
        6 * US: (5 * US, [97.0, 96.5]),
    }


def test_stateful_ewma_tws_matches_legacy_api(spark, tmp_path):
    """transformWithStateInPandas tier == applyInPandasWithState tier ==
    pandas ewm, with state carried across micro-batches. Needs RocksDB
    (transformWithState rejects the HDFS-backed provider)."""
    from crypto_market_data_etl_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        stateful_ewma_tws,
    )

    path = str(tmp_path / "in")
    series = [(k, i * US, float(v)) for k in (1, 2)
              for i, v in enumerate([10, 20, 15, 40, 5])]
    _write_batch(spark, path, series[:6])
    _write_batch(spark, path, series[6:])
    stream = _stream(spark, path).select("code", "ts_us", "value")
    out = stateful_ewma_tws(stream, key_col="code", ts_col="ts_us", value_col="value")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        try:
            q = run_to_memory(out, "ewma_tws_out", output_mode="append")
        except Exception as exc:  # pragma: no cover — env-dependent: needs
            # RocksDB JNI + google.protobuf (absent in this sandbox)
            pytest.skip(f"transformWithState runtime unavailable: {exc}")
        try:
            got = spark.sql(
                "SELECT * FROM ewma_tws_out ORDER BY code, ts_us"
            ).toPandas()
            expected = (
                pd.Series([10.0, 20.0, 15.0, 40.0, 5.0])
                .ewm(alpha=0.8, adjust=False).mean().tolist()
            )
            assert got["ewma"].tolist() == pytest.approx(expected * 2, rel=1e-12)
            assert list(got.columns) == ["code", "ts_us", "value", "ewma"]
        finally:
            q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_curate_gates_dedups_and_flags(spark, tmp_path):
    """Streaming corpus ingestion: quality gate drops the digit-heavy doc,
    a replayed identical doc is deduped within the watermark, benchmark
    n-gram overlap is flagged, and docs finalize in append mode once the
    watermark passes their event time."""
    import time as _t

    from crypto_market_data_etl_spark.streaming.corpus import stream_curate

    path = str(tmp_path / "docs")

    def write_docs(rows):
        spark.createDataFrame(
            rows, "doc_id long, ts_s long, text string"
        ).withColumn(
            "ingest_ts", F.timestamp_seconds(F.col("ts_s"))
        ).drop("ts_s").coalesce(1).write.mode("append").parquet(path)
        _t.sleep(1.1)

    write_docs(
        [
            (1, 1, "plain clean words here today"),
            (2, 2, "hello world alpha beta gamma delta again"),  # leaked
            (3, 3, "111 222 333"),  # digit-heavy -> quality-gated
        ]
    )
    write_docs(
        [
            (1, 4, "plain clean words here today"),  # re-crawl -> deduped
            (9, 100, "late watermark pusher words"),  # finalizes the rest
        ]
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_curate(stream, bench, quality_min=0.5, watermark="10 seconds")
    q = run_to_memory(out, "curated_stream", output_mode="append")
    try:
        rows = {r.doc_id: r for r in spark.sql("SELECT * FROM curated_stream").collect()}
        # doc 3 quality-gated; doc 9's event time hasn't expired; doc 1 once
        assert sorted(rows) == [1, 2]
        assert rows[1].clean and rows[1].n_hit == 0 and rows[1].n_grams == 3
        assert not rows[2].clean and rows[2].n_hit >= 1
    finally:
        q.stop()


def test_minhash_sig_cols_matches_agg_form(spark):
    """The in-row signature (transform + array_min) is bit-identical to the
    explode + groupBy form on the same docs — the contract that lets a
    streaming side collide correctly with a batch-built band index."""
    from crypto_market_data_etl_spark.operators.dedup import (
        gram_array_expr,
        minhash_sig_cols,
        minhash_signatures,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven eight"),
            (3, "alpha beta gamma delta epsilon different"),
            (4, "solo"),  # too short for bigrams -> no agg row, NULL in-row
        ],
        "doc_id long, text string",
    )
    agg = {
        r.doc_id: list(r.mhs)
        for r in minhash_signatures(
            word_shingles(docs, distinct=False), n_hashes=9
        ).collect()
    }
    toks = F.split(F.col("text"), " ")
    inrow = {
        r.doc_id: [r[f"mh{i}"] for i in range(9)]
        for r in docs.select(
            "doc_id",
            *minhash_sig_cols(gram_array_expr(toks, 2), n_hashes=9),
        ).collect()
    }
    assert 4 not in agg and inrow[4] == [None] * 9
    for did in (1, 2, 3):
        assert inrow[did] == agg[did], did


def test_stream_neardup_flag_against_static_corpus(spark, tmp_path):
    """Stream-static near-dup gate: a slightly edited re-post of a corpus
    document collides in at least one band; an unrelated doc and a
    gram-less doc emit with zero hits."""
    import time as _t

    from crypto_market_data_etl_spark.streaming.corpus import stream_neardup_flag

    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog near the river bank"),
            (101, "completely different historical content about markets and trades"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")

    def write_docs(rows):
        spark.createDataFrame(
            rows, "doc_id long, ts_s long, text string"
        ).withColumn(
            "ingest_ts", F.timestamp_seconds(F.col("ts_s"))
        ).drop("ts_s").coalesce(1).write.mode("append").parquet(path)
        _t.sleep(1.1)

    write_docs(
        [
            # near-dup of corpus doc 100 (one word changed at the end)
            (1, 1, "the quick brown fox jumps over the lazy dog near the river edge"),
            (2, 2, "totally unrelated fresh crawl text with novel vocabulary"),
            (3, 3, "solo"),  # gram-less
            (9, 100, "late watermark pusher words"),
        ]
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_neardup_flag(stream, corpus, watermark="10 seconds")
    q = run_to_memory(out, "neardup_stream", output_mode="append")
    try:
        rows = {r.doc_id: r for r in spark.sql("SELECT * FROM neardup_stream").collect()}
        assert sorted(rows) == [1, 2, 3]  # doc 9's event time hasn't expired
        assert rows[1].neardup and rows[1].n_band_hits >= 1
        assert not rows[2].neardup and rows[2].n_band_hits == 0
        assert not rows[3].neardup and rows[3].n_band_hits == 0
    finally:
        q.stop()


def test_stream_embedding_neardup_flag(spark, tmp_path):
    """Stream-static SEMANTIC near-dup gate over a prebuilt ivf_index: an
    edited re-post of a corpus document (one token appended — high raw
    cosine in hashed-BoW space) is flagged; an unrelated doc is not; a
    same-id exact re-post is excluded by the id filter; and the batch
    verdict (semantic_dedup-style raw cosine at 6dp) is what decides."""
    import time as _t

    from crypto_market_data_etl_spark.operators.similarity import (
        hashed_bow_embeddings,
        ivf_index,
    )
    from crypto_market_data_etl_spark.streaming.corpus import (
        stream_embedding_neardup_flag,
    )

    corpus_docs = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog near the river bank"),
            (101, "completely different historical content about markets and trades"),
        ],
        "doc_id long, text string",
    )
    embs = hashed_bow_embeddings(corpus_docs, dim=32)
    cents = embs.select(
        F.col("doc_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    idx = ivf_index(embs, cents, id_col="doc_id").localCheckpoint()

    path = str(tmp_path / "docs")

    def write_docs(rows):
        spark.createDataFrame(
            rows, "doc_id long, ts_s long, text string"
        ).withColumn(
            "ingest_ts", F.timestamp_seconds(F.col("ts_s"))
        ).drop("ts_s").coalesce(1).write.mode("append").parquet(path)
        _t.sleep(1.1)

    write_docs(
        [
            # edited re-post of corpus doc 100 (one appended token):
            # raw BoW cosine ~ 0.96 — past the MinHash bands' reach at
            # shingle level, caught in embedding space
            (1, 1, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (2, 2, "totally unrelated fresh crawl text with novel vocabulary"),
            # SAME id as corpus doc 100, exact text: the n_id != id filter
            # leaves only the dissimilar doc 101 to compare against
            (100, 3, "the quick brown fox jumps over the lazy dog near the river bank"),
            # NULL text: must emit with zero hits / NULL best_sim (the
            # zero-norm contract) — NOT embed as the md5("")-token vector
            (3, 2, None),
            (9, 100, "late watermark pusher words"),
        ]
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_embedding_neardup_flag(
        stream, idx, cents, dim=32, n_probe=2, threshold=0.9,
        watermark="10 seconds",
    )
    q = run_to_memory(out, "emb_neardup_stream", output_mode="append")
    try:
        rows = {
            r.doc_id: r
            for r in spark.sql("SELECT * FROM emb_neardup_stream").collect()
        }
        assert sorted(rows) == [1, 2, 3, 100]  # doc 9's event time hasn't expired
        assert rows[1].neardup and rows[1].n_hits >= 1
        assert rows[1].best_sim >= 0.9
        assert not rows[2].neardup and rows[2].n_hits == 0
        assert not rows[100].neardup  # self-id excluded, 101 dissimilar
        assert not rows[3].neardup and rows[3].n_hits == 0
        assert rows[3].best_sim is None  # NULL text → NULL embedding, no probes
    finally:
        q.stop()


def test_stream_neardup_verified_clears_band_false_positive(spark, tmp_path):
    """The wired verify arm (gate → foreachBatch exact jaccard): a TRUE
    near-dup arrives neardup=True AND verified=True with its corpus partner
    named; a band-collision FALSE positive (rows_per_band=1 makes single-
    hash collisions easy; the doc shares ~half its shingles with corpus doc
    100 — well under the 0.7 jaccard bar) arrives neardup=True but
    verified=False; an unrelated doc skips the verify entirely. The
    verify's best_jaccard is bit-identical to the x04-gated batch
    comparator (dedup.ngram_jaccard_pairs) on the same pair."""
    import time as _t

    from crypto_market_data_etl_spark.operators.dedup import ngram_jaccard_pairs
    from crypto_market_data_etl_spark.streaming.corpus import (
        stream_neardup_verified,
    )

    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog near the river bank"),
            (101, "completely different historical content about markets and trades"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "docs")
    got: dict[int, object] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got[r.doc_id] = r

    def write_docs(rows):
        spark.createDataFrame(
            rows, "doc_id long, ts_s long, text string"
        ).withColumn(
            "ingest_ts", F.timestamp_seconds(F.col("ts_s"))
        ).drop("ts_s").coalesce(1).write.mode("append").parquet(path)
        _t.sleep(1.1)

    # doc 2: first half of corpus doc 100's text + fresh tail — high band
    # collision odds at rows_per_band=1, true bigram jaccard ~0.3
    fp_text = "the quick brown fox jumps over many unrelated special brand new tokens"
    write_docs(
        [
            (1, 1, "the quick brown fox jumps over the lazy dog near the river edge"),
            (2, 2, fp_text),
            (3, 3, "totally unrelated fresh crawl text with novel vocabulary"),
            (9, 100, "late watermark pusher words"),
        ]
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = stream_neardup_verified(
        stream, corpus, sink,
        rows_per_band=1, threshold=0.7, watermark="10 seconds",
        checkpoint=str(tmp_path / "ckpt"),
        query_name="neardup_verified_test",
    )
    try:
        deadline = _t.time() + 60
        while _t.time() < deadline and sorted(got) != [1, 2, 3]:
            q.processAllAvailable()
            _t.sleep(0.3)
        assert sorted(got) == [1, 2, 3]  # doc 9's event time hasn't expired
        # true near-dup: flagged AND verified against its corpus source
        assert got[1].neardup and got[1].verified
        assert got[1].best_match == 100 and got[1].best_jaccard >= 0.7
        # band-collision false positive: flagged, CLEARED by the verify arm
        assert got[2].neardup and got[2].n_band_hits >= 1
        assert not got[2].verified
        assert got[2].best_jaccard is not None and got[2].best_jaccard < 0.7
        # unrelated: not a candidate, no verify columns
        assert not got[3].neardup and not got[3].verified
        assert got[3].best_jaccard is None
    finally:
        q.stop()

    # comparator identity: the verify arm's jaccard == ngram_jaccard_pairs
    # (the x04-gated batch operator) on the same (stream doc, corpus) pair
    both = corpus.unionByName(
        spark.createDataFrame([(2, fp_text)], "doc_id long, text string")
    )
    batch = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(both, rows_per_band=1).collect()
    }
    pair = batch.get((2, 100), batch.get((100, 2)))
    assert pair is not None and abs(pair - got[2].best_jaccard) < 1e-9


def test_verify_neardup_corpus_index_path_oracle_equal(spark):
    """The persisted-corpus-index verify path (r11: CorpusVerifyIndex built
    once, reused per trigger) is bit-identical to the per-call re-shingle
    path on every verdict column, and refuses knob drift loudly."""
    import pytest as _pt

    from crypto_market_data_etl_spark.streaming.corpus import (
        CorpusVerifyIndex,
        verify_neardup_batch,
    )

    corpus = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog near the river bank"),
            (101, "completely different historical content about markets and trades"),
            (102, "the quick brown fox jumps over the lazy dog near the river bend"),
        ],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river edge"),
            (2, "the quick brown fox jumps over many unrelated special brand new tokens"),
            (3, "totally unrelated fresh crawl text with novel vocabulary"),
        ],
        "doc_id long, text string",
    )
    idx = CorpusVerifyIndex(corpus, rows_per_band=1)
    via_index = {
        r.doc_id: r
        for r in verify_neardup_batch(
            cands, None, rows_per_band=1, corpus_index=idx
        ).collect()
    }
    via_reshingle = {
        r.doc_id: r
        for r in verify_neardup_batch(cands, corpus, rows_per_band=1).collect()
    }
    assert set(via_index) == set(via_reshingle) == {1, 2, 3}
    for d in (1, 2, 3):
        a, b = via_index[d], via_reshingle[d]
        assert a.best_match == b.best_match
        assert a.verified == b.verified
        if a.best_jaccard is None:
            assert b.best_jaccard is None
        else:
            assert abs(a.best_jaccard - b.best_jaccard) < 1e-12

    # the broadcast_candidates A/B knob (r12, committed perf negative —
    # kept for reproducibility) is join-strategy-only: verdicts identical
    via_bcast = {
        r.doc_id: r
        for r in verify_neardup_batch(
            cands, None, rows_per_band=1, corpus_index=idx,
            broadcast_candidates=True,
        ).collect()
    }
    for d in (1, 2, 3):
        a, b = via_index[d], via_bcast[d]
        assert a.best_match == b.best_match
        assert a.verified == b.verified
        if a.best_jaccard is None:
            assert b.best_jaccard is None
        else:
            assert abs(a.best_jaccard - b.best_jaccard) < 1e-12

    # knob drift refused: an index built at rows_per_band=1 cannot serve a
    # rows_per_band=3 verify (stale bands would silently change verdicts)
    with _pt.raises(ValueError, match="rebuild the index"):
        verify_neardup_batch(cands, None, rows_per_band=3, corpus_index=idx)
    # neither corpus nor index is an error, not a silent empty result
    with _pt.raises(ValueError, match="corpus or corpus_index"):
        verify_neardup_batch(cands, None, rows_per_band=1)


def test_stream_ivfpq_index_matches_batch_build(spark, tmp_path):
    """Streaming index maintenance (streaming/ann.py): the streamed
    (vec_id, c_id, codes) rows must be BIT-IDENTICAL to what the batch
    ivfpq_index emits for the same vectors — same frozen centroids,
    codebooks, residual coding, multi-assignment — so a batch-built index
    and its streamed continuation form one seamless table. NULL-vector
    rows are dropped, never poisoning an Arrow batch."""
    from crypto_market_data_etl_spark.operators.similarity import (
        coarse_residuals,
        ivfpq_index,
        kmeans_train,
        pq_train,
    )
    from crypto_market_data_etl_spark.streaming.ann import stream_ivfpq_index

    rng = np.random.default_rng(47)
    dim, m, kc, n = 16, 4, 8, 180
    centers = rng.normal(size=(5, dim))
    X = centers[np.arange(n) % 5] + 0.2 * rng.normal(size=(n, dim))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents = kmeans_train(df, centroid_filter=F.col("vec_id") % 30 == 1, n_iters=2)
    books = pq_train(
        coarse_residuals(df, cents), vec_col="resid", m=m, k=kc, n_iters=2, dim=dim
    )
    kw = dict(residual=True, assign_r=2)
    batch_rows = sorted(
        (r.vec_id, r.c_id, tuple(r.codes))
        for r in ivfpq_index(df, cents, books, **kw).collect()
    )

    in_path, out_path = str(tmp_path / "vin"), str(tmp_path / "vidx")
    ckpt = str(tmp_path / "vckpt")
    # three micro-batches; the middle one carries a NULL vector
    chunks = [range(0, 60), range(60, 120), range(120, 180)]
    for ci, ids in enumerate(chunks):
        rows = [(i, [float(v) for v in X[i]]) for i in ids]
        if ci == 1:
            rows.append((9_999, None))
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).coalesce(1).write.mode("append").parquet(in_path)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(in_path)
    )
    q = stream_ivfpq_index(stream, cents, books, out_path, ckpt, **kw).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed_rows = sorted(
        (r.vec_id, r.c_id, tuple(r.codes))
        for r in spark.read.parquet(out_path).collect()
    )
    assert streamed_rows == batch_rows  # NULL row dropped, nothing else


def test_ivfpq_warm_retrain_equals_cold_and_recovers_drift(spark):
    """The periodic-retrain half of streaming/ann.py's ingest-vs-retrain
    contract (ivfpq_warm_retrain):

    1. ORACLE EQUALITY — kmeans_train(init=seed_table) is mechanically the
       cold path with the seeds supplied outright, so warm-start with the
       SAME seed rows must reproduce the cold build's centroids
       bit-for-bit (single input partition ⇒ deterministic float order).
    2. DRIFT RECOVERY — an index kept current by frozen-artifact ingest
       (stream_ivfpq_index semantics) decays on queries from a drifted
       regime the coarse quantizer never saw; one ivfpq_warm_retrain over
       the merged corpus recovers recall while the base regime stays
       intact."""
    from crypto_market_data_etl_spark.operators.similarity import (
        ann_recall,
        coarse_residuals,
        cosine_topk_np,
        ivfpq_index,
        ivfpq_topk,
        kmeans_train,
        pq_train,
        with_norm,
    )
    from crypto_market_data_etl_spark.streaming.ann import ivfpq_warm_retrain

    rng = np.random.default_rng(29)
    dim, m, kc = 16, 4, 16
    base_centers = rng.normal(size=(5, dim))
    drift_centers = 3.0 * rng.normal(size=(5, dim))  # regime the serving build never saw
    n_base, n_drift = 200, 150

    def make(centers, n, id0):
        X = centers[np.arange(n) % 5] + 0.15 * rng.normal(size=(n, dim))
        X = X / np.linalg.norm(X, axis=1, keepdims=True)
        return X, [(id0 + i, [float(v) for v in X[i]]) for i in range(n)]

    Xb, base_rows = make(base_centers, n_base, 0)
    Xd, drift_rows = make(drift_centers, n_drift, n_base)
    base = spark.createDataFrame(base_rows, "vec_id long, embedding array<double>")
    merged = spark.createDataFrame(
        base_rows + drift_rows, "vec_id long, embedding array<double>"
    ).coalesce(1).localCheckpoint()

    def normed(df):
        return with_norm(df).select(
            "vec_id", F.expr("transform(embedding, x -> x / norm)").alias("embedding")
        )

    # --- 1. warm-start path == cold path given identical seeds ---
    merged_n = normed(merged).coalesce(1).localCheckpoint()
    seed_filter = F.col("vec_id") % 37 == 1
    cold = kmeans_train(merged_n, centroid_filter=seed_filter, n_iters=2)
    seeds = merged_n.filter(seed_filter).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    )
    warm = kmeans_train(merged_n, init=seeds, n_iters=2)
    canon = lambda df: sorted((r.c_id, tuple(r.c_vec)) for r in df.collect())
    assert canon(warm) == canon(cold)

    # --- 2. frozen-ingest recall decays on drift; warm retrain recovers ---
    base_n = normed(base)
    serving_cents = kmeans_train(
        base_n, centroid_filter=F.col("vec_id") % 11 == 1, n_iters=2
    ).localCheckpoint()
    serving_books = pq_train(
        coarse_residuals(base, serving_cents), vec_col="resid",
        m=m, k=kc, n_iters=2, dim=dim,
    )
    # frozen continuation over the merged corpus — bit-identical to what
    # stream_ivfpq_index appends (pytest above), composed here in batch
    frozen_idx = ivfpq_index(
        merged, serving_cents, serving_books, residual=True
    ).localCheckpoint()

    q_rows = [
        (10_000 + i, [float(v) for v in x])
        for i, x in enumerate(
            (Xd[::5] + 0.02 * rng.normal(size=(len(Xd[::5]), dim)))
            / np.linalg.norm(Xd[::5] + 0.0, axis=1, keepdims=True)
        )
    ]
    queries = spark.createDataFrame(q_rows, "vec_id long, embedding array<double>")
    exact = cosine_topk_np(merged, queries, k=5).localCheckpoint()

    def recall(idx, cents, books):
        approx = ivfpq_topk(
            idx, queries, cents, books, merged,
            n_probe=2, k=5, shortlist=15, residual=True,
        )
        return ann_recall(approx, exact).collect()[0]["recall"]

    r_frozen = recall(frozen_idx, serving_cents, serving_books)
    cents2, books2, idx2 = ivfpq_warm_retrain(
        merged, serving_cents, n_iters=2, m=m, k=kc, pq_iters=2, dim=dim
    )
    idx2 = idx2.localCheckpoint()
    r_warm = recall(idx2, cents2, books2)
    # measured operating point: frozen ~0.59, warm ~0.96 (margins well
    # clear of float-order jitter)
    assert r_warm >= r_frozen + 0.2, (r_frozen, r_warm)
    assert r_warm >= 0.9, r_warm

    # seed-expansion arm (the documented regime-shift recipe): serving
    # centroids ∪ sampled new vectors as init. At THIS scale warm-only
    # already recovers (10 clusters, ~19 cells — Lloyd migrates), so the
    # recovery delta is the SCALE rung's claim (SCALE_r12 stream_retrain:
    # 0.63 warm-only vs 0.96 seeded at 500k/632 cells); here we assert the
    # expansion PLUMBING: the offset seed ids survive into the trained
    # centroid table (new-regime cells exist) and recall stays sane at a
    # probe width scaled to the grown cell count.
    cents3, books3, idx3 = ivfpq_warm_retrain(
        merged, serving_cents, n_iters=2, m=m, k=kc, pq_iters=2, dim=dim,
        extra_seed_filter=(
            (F.col("vec_id") >= n_base) & (F.col("vec_id") % 7 == 1)
        ),
    )
    cents3 = cents3.localCheckpoint()
    n_serving = serving_cents.count()
    # seed c_ids are shifted just above the serving table's max c_id
    # (derived per call — r12 ADVICE: a fixed 1e9 offset collides once
    # corpus vec_ids reach it), so new-regime cells are exactly the ones
    # above serv_max and the two id ranges are disjoint by construction
    serv_max = serving_cents.agg(F.max("c_id")).collect()[0][0]
    assert cents3.filter(F.col("c_id") > serv_max).count() > 0
    assert cents3.count() > n_serving
    approx3 = ivfpq_topk(
        idx3.localCheckpoint(), queries, cents3, books3, merged,
        n_probe=4, k=5, shortlist=15, residual=True,
    )
    r_seeded = ann_recall(approx3, exact).collect()[0]["recall"]
    assert r_seeded >= 0.9, r_seeded


def test_ivfpq_warm_retrain_cell_split(spark):
    """The cell-split arm of the warm-retrain contract (r13 verdict: warm
    retrains keep the resident cell count frozen, so base-regime recall
    sits under cold's — the candidate fix splits oversized resident
    cells). Asserts the split PLUMBING on a fixture with one dominant
    cluster: (1) exactly the oversized cells gain a seed, and the seed is
    a member of that cell (the farthest-from-centroid member by the
    deterministic (dot, id) rule); (2) a split_factor no cell exceeds is
    a bit-exact no-op vs warm-only; (3) split composes with
    extra_seed_filter (shared offset space, distinct-deduped)."""
    from crypto_market_data_etl_spark.operators.similarity import (
        coarse_residuals,
        ivfpq_index,
        kmeans_train,
        pq_train,
        with_norm,
    )
    from crypto_market_data_etl_spark.streaming.ann import ivfpq_warm_retrain

    rng = np.random.default_rng(31)
    dim, m, kc, n = 16, 4, 16, 300
    centers = rng.normal(size=(4, dim))
    # 70% of mass in cluster 0 — its cell(s) end up oversized
    which = np.where(np.arange(n) % 10 < 7, 0, np.arange(n) % 4)
    X = centers[which] + 0.1 * rng.normal(size=(n, dim))
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    corpus = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).coalesce(1).localCheckpoint()

    corpus_n = with_norm(corpus).select(
        "vec_id", F.expr("transform(embedding, x -> x / norm)").alias("embedding")
    ).localCheckpoint()
    serving_cents = kmeans_train(
        corpus_n, centroid_filter=F.col("vec_id") % 75 == 1, n_iters=2
    ).localCheckpoint()
    serving_books = pq_train(
        coarse_residuals(corpus, serving_cents), vec_col="resid",
        m=m, k=kc, n_iters=2, dim=dim,
    )
    idx = ivfpq_index(
        corpus, serving_cents, serving_books, residual=True
    ).localCheckpoint()

    occ = {r["c_id"]: r["n"] for r in
           idx.groupBy("c_id").agg(F.count("*").alias("n")).collect()}
    mean_occ = sum(occ.values()) / len(occ)
    # the hot cluster lands as TWO ~110-member cells vs mean 75 on this
    # fixture — 1.4x is the factor that marks exactly those as oversized
    split_f = 1.4
    oversized = {c for c, v in occ.items() if v > split_f * mean_occ}
    assert oversized, occ  # the fixture must actually produce a hot cell

    serv_max = serving_cents.agg(F.max("c_id")).collect()[0][0]
    cents_s, _books_s, idx_s = ivfpq_warm_retrain(
        corpus, serving_cents, n_iters=2, m=m, k=kc, pq_iters=2, dim=dim,
        split_index=idx, split_factor=split_f,
    )
    cents_s = cents_s.localCheckpoint()
    # (1) one new cell per oversized cell, ids above serv_max
    new_cells = cents_s.filter(F.col("c_id") > serv_max).count()
    assert new_cells == len(oversized), (new_cells, oversized)
    assert cents_s.count() == serving_cents.count() + len(oversized)
    assert idx_s.count() == corpus.count()

    # (2) nothing oversized at a huge factor -> bit-exact warm-only
    cents_w, _, _ = ivfpq_warm_retrain(
        corpus, serving_cents, n_iters=2, m=m, k=kc, pq_iters=2, dim=dim,
    )
    cents_n, _, _ = ivfpq_warm_retrain(
        corpus, serving_cents, n_iters=2, m=m, k=kc, pq_iters=2, dim=dim,
        split_index=idx, split_factor=1e9,
    )
    canon = lambda df: sorted((r.c_id, tuple(r.c_vec)) for r in df.collect())
    assert canon(cents_n) == canon(cents_w)

    # (3) composes with extra_seed_filter: both seed families land, and
    # a vector picked by BOTH is seeded once (distinct dedup)
    pick_id = None
    # recompute the rule's pick for one oversized cell to pin determinism
    cell = sorted(oversized)[0]
    members = [r["vec_id"] for r in idx.filter(F.col("c_id") == cell)
               .select("vec_id").collect()]
    cen = serving_cents.filter(F.col("c_id") == cell).collect()[0]["c_vec"]
    cu = np.asarray(cen) / np.linalg.norm(cen)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    dots = {i: float(Xn[i] @ cu) for i in members}
    pick_id = min(members, key=lambda i: (dots[i], i))
    cents_b, _, _ = ivfpq_warm_retrain(
        corpus, serving_cents, n_iters=2, m=m, k=kc, pq_iters=2, dim=dim,
        extra_seed_filter=F.col("vec_id") == pick_id,
        split_index=idx, split_factor=split_f,
    )
    # the overlapping pick seeds ONE cell, not two
    assert cents_b.count() == serving_cents.count() + len(oversized)
