"""interval_join / interval_coverage (operators/interval.py): grain-bucketed
interval×interval range join — equivalence to the naive overlap join,
exactly-once pair emission across shared buckets, negative bounds, and
invalid-interval handling."""

import pyspark.sql.functions as F

from crypto_market_data_etl_spark.operators.interval import (
    interval_coverage,
    interval_join,
)


def _pairs(df):
    return sorted((r.lid, r.rid_r) for r in df.select("lid", "rid_r").collect())


def _naive(spark, left, right, on_key=True):
    cond = (F.col("l.s") <= F.col("r.e")) & (F.col("r.s") <= F.col("l.e"))
    if on_key:
        cond = cond & (F.col("l.k") == F.col("r.k"))
    j = left.alias("l").join(right.alias("r"), cond)
    return sorted(
        (r["lid"], r["rid"])
        for r in j.select(F.col("l.lid").alias("lid"), F.col("r.rid").alias("rid")).collect()
    )


def test_interval_join_matches_naive_overlap(spark):
    left = spark.createDataFrame(
        [(1, 1, 0, 10), (1, 2, 5, 7), (1, 3, 20, 30), (2, 4, 0, 100)],
        "k int, lid int, s long, e long",
    )
    right = spark.createDataFrame(
        [(1, 10, 8, 12), (1, 11, 31, 40), (1, 12, 6, 6), (2, 13, 99, 250)],
        "k int, rid int, s long, e long",
    )
    got = interval_join(left, right, ("s", "e"), ("s", "e"), grain=4, on=["k"])
    naive = _naive(
        spark,
        left.select("k", "lid", "s", "e"),
        right.select("k", "rid", "s", "e"),
    )
    assert _pairs(got) == naive
    # several grains, same answer (grain is physical, not semantic)
    for grain in (1, 7, 1000):
        g = interval_join(left, right, ("s", "e"), ("s", "e"), grain=grain, on=["k"])
        assert _pairs(g) == naive


def test_interval_join_emits_each_pair_exactly_once(spark):
    # intervals sharing MANY grain buckets: without the first-overlap-bucket
    # filter this pair would appear once per shared bucket
    left = spark.createDataFrame([(1, 0, 1000)], "lid int, s long, e long")
    right = spark.createDataFrame([(10, 0, 1000)], "rid int, s long, e long")
    got = interval_join(left, right, ("s", "e"), ("s", "e"), grain=10)
    assert _pairs(got) == [(1, 10)]


def test_interval_join_negative_bounds(spark):
    # trunc-div bucketing must stay consistent across zero (sign included)
    left = spark.createDataFrame(
        [(1, -25, -5), (2, -100, -80)], "lid int, s long, e long"
    )
    right = spark.createDataFrame(
        [(10, -6, 3), (11, -79, -70)], "rid int, s long, e long"
    )
    got = interval_join(left, right, ("s", "e"), ("s", "e"), grain=10)
    assert _pairs(got) == [(1, 10)]


def test_interval_join_drops_invalid_and_null_intervals(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 0), (3, None, 10), (4, 0, None)],
        "lid int, s long, e long",
    )
    right = spark.createDataFrame([(10, 0, 100)], "rid int, s long, e long")
    got = interval_join(left, right, ("s", "e"), ("s", "e"), grain=5)
    assert _pairs(got) == [(1, 10)]


def test_interval_join_plans_equi_join_not_nested_loop(spark):
    left = spark.createDataFrame([(1, 1, 0, 10)], "k int, lid int, s long, e long")
    right = spark.createDataFrame([(1, 10, 8, 12)], "k int, rid int, s long, e long")
    plan = (
        interval_join(left, right, ("s", "e"), ("s", "e"), grain=4, on=["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_coverage_counts_live_intervals_per_bucket(spark):
    df = spark.createDataFrame(
        [(1, 0, 29), (2, 10, 19), (3, 25, 45), (4, 5, 4)],  # 4 is invalid
        "iid int, s long, e long",
    )
    cov = interval_coverage(df, ("s", "e"), grain=10)
    got = {
        r.bucket: r.n
        for r in cov.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {0: 1, 1: 2, 2: 2, 3: 1, 4: 1}
