"""Hot-bucket cap (operators/skew.py): degenerate LSH buckets stay bounded."""

import time

import pyspark.sql.functions as F
import pytest

from crypto_market_data_etl_spark.operators.dedup import lsh_candidate_pairs
from crypto_market_data_etl_spark.operators.similarity import lsh_candidates
from crypto_market_data_etl_spark.operators.skew import (
    cap_bucket_size,
    cap_bucket_size_chained,
)


def _await(cond, timeout=10.0):
    deadline = time.monotonic() + timeout
    while not cond() and time.monotonic() < deadline:
        time.sleep(0.05)


def test_cap_truncates_hot_bucket_deterministically(spark):
    # one degenerate bucket of 500 members + one healthy bucket of 3
    rows = [(i, "hot") for i in range(500)] + [(1000 + i, "cold") for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id bigint, bucket string")
    logs = []
    capped = cap_bucket_size(df, ["bucket"], "vec_id", 10, log_fn=logs.append)
    out = {r["bucket"]: r["n"] for r in capped.groupBy("bucket").agg(F.count("*").alias("n")).collect()}
    assert out == {"hot": 10, "cold": 3}
    # deterministic: smallest ids survive
    kept = sorted(r["vec_id"] for r in capped.filter(F.col("bucket") == "hot").collect())
    assert kept == list(range(10))
    _await(lambda: len(logs) == 1)  # reporter thread logs after the action
    assert len(logs) == 1 and "490" in logs[0]  # 500 - 10 dropped, logged


def test_cap_noop_below_threshold_logs_nothing(spark):
    df = spark.createDataFrame([(i, i % 5) for i in range(50)], "vec_id bigint, bucket bigint")
    logs = []
    capped = cap_bucket_size(df, ["bucket"], "vec_id", 100, log_fn=logs.append)
    assert capped.count() == 50
    time.sleep(0.3)  # give a (wrong) late log a chance to land
    assert logs == []


def test_lsh_candidates_degenerate_bucket_bounded(spark):
    # 2000 vectors all landing in ONE bucket: uncapped would emit ~2M pairs;
    # capped emits at most cap*(cap-1)/2
    df = spark.createDataFrame([(i, "deadbeef") for i in range(2000)], "vec_id bigint, bucket string")
    pairs = lsh_candidates(df, max_bucket_size=50, log_dropped=False)
    assert pairs.count() == 50 * 49 // 2


def test_lsh_candidate_pairs_degenerate_band_bounded_but_connected(spark):
    # 1000 exact-dup members in one band bucket, cap 20: the joined pairs are
    # bounded at cap*(cap-1)/2, and each of the 980 dropped members keeps
    # exactly one chain pair to the bucket min — linear, not quadratic
    bands = spark.createDataFrame(
        [(i, 0, "samesig") for i in range(1000)],
        "doc_id bigint, band_idx int, band_sig string",
    )
    pairs = lsh_candidate_pairs(bands, max_bucket_size=20, log_dropped=False)
    rows = pairs.collect()
    assert len(rows) == 20 * 19 // 2 + 980
    # no member is orphaned: every id participates in some pair
    seen = {r["id_a"] for r in rows} | {r["id_b"] for r in rows}
    assert seen == set(range(1000))
    # dropped members chain to the bucket's canonical (min) id
    chained = {r["id_b"] for r in rows if r["id_a"] == 0}
    assert set(range(20, 1000)) <= chained


def test_cap_chained_links_every_dropped_member_to_bucket_min(spark):
    rows = [(i, "hot") for i in range(100, 130)] + [(5, "cold"), (7, "cold")]
    df = spark.createDataFrame(rows, "vec_id bigint, bucket string")
    kept, chains = cap_bucket_size_chained(
        df, ["bucket"], "vec_id", 10, log_dropped=False
    )
    assert sorted(r["vec_id"] for r in kept.filter("bucket = 'hot'").collect()) == list(
        range(100, 110)
    )
    assert kept.filter("bucket = 'cold'").count() == 2
    got = sorted(map(tuple, chains.collect()))
    assert got == [(100, i) for i in range(110, 130)]  # (bucket min, dropped)


def test_cap_inert_at_default_threshold_preserves_pairs(spark):
    # default DEFAULT_MAX_BUCKET_SIZE must not change results on healthy data
    bands = spark.createDataFrame(
        [(i, 0, f"sig{i % 7}") for i in range(70)],
        "doc_id bigint, band_idx int, band_sig string",
    )
    capped = lsh_candidate_pairs(bands)  # default cap
    uncapped = lsh_candidate_pairs(bands, max_bucket_size=0)
    assert sorted(map(tuple, capped.collect())) == sorted(map(tuple, uncapped.collect()))


def test_lsh_candidate_pairs_log_fn_passthrough(spark):
    """The log_fn knob must reach the bucket-cap observer so scale
    harnesses (tools/scale_skew_run.py) capture dropped counts without a
    logging handler."""
    import time

    from pyspark.sql import functions as F

    from crypto_market_data_etl_spark.operators.dedup import lsh_candidate_pairs

    bands = spark.range(100).select(
        F.lit(0).alias("band_idx"),
        F.lit("sig").alias("band_sig"),
        F.col("id").alias("doc_id"),
    )
    logs: list[str] = []
    pairs = lsh_candidate_pairs(
        bands, "doc_id", max_bucket_size=10, log_fn=logs.append
    )
    pairs.count()  # action completes -> observer fires (polling thread)
    deadline = time.time() + 10
    while not logs and time.time() < deadline:
        time.sleep(0.1)
    assert logs and "dropped 90 membership" in logs[0]
