"""Interval-overlap join — the interval×interval member of the range-join
family (``operators/asof.py`` covers point-in-band lookup).

Spark has no native range join; the naive formulation — an inner join whose
only condition is ``l_start <= r_end AND r_start <= l_end`` — plans as a
BroadcastNestedLoopJoin (or a cartesian with post-filter), the same trap the
reference's as-of band join falls into
(``spark_src/processing_raw_data_from_gcs.py:143-152``). The scalable shape
is grain bucketing:

- pick a ``grain`` (same unit as the bounds; ideally ≈ the typical interval
  span),
- explode each side's interval into the grain buckets it covers
  (``sequence(start div grain, end div grain)`` — bounded fan-out
  span/grain + 1),
- shuffled **equi-join** on (keys…, bucket) with the exact overlap predicate
  in the join condition,
- emit each qualifying pair exactly ONCE without a distinct shuffle: a pair
  overlapping several shared buckets is kept only in the bucket of
  ``greatest(l_start, r_start)`` — the first bucket where both are live —
  a pure filter, no dedup state.

Cost: fan-out × input shuffle volume, one equi-join, no nested loop; AQE
skew-join splits hot (key, bucket) pairs. Pick ``grain`` near the P95
interval span: too small inflates the explode, too large degrades buckets
toward all-pairs (the asof tolerance-bucket trade-off, SURVEY §4 item 1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_bounds: tuple[str, str],
    right_bounds: tuple[str, str],
    grain: int,
    on: Sequence[str] = (),
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of *left* and *right* where the integer intervals
    ``[left_start, left_end]`` and ``[right_start, right_end]`` overlap
    (closed bounds, same units), optionally also matching equality keys
    ``on``. Right-side non-key columns are emitted with ``suffix``.

    Bounds must be non-null with ``start <= end``; rows violating that are
    dropped (an open-ended interval can be closed with a sentinel bound
    before the call).
    """
    ls, le = left_bounds
    rs, re = right_bounds
    on = list(on)

    def buckets(start: str, end: str):
        # trunc-div everywhere (incl. the first-bucket filter) so the bucket
        # of any point is consistent, signs included
        return F.explode(
            F.sequence(
                F.expr(f"CAST({start} AS BIGINT) div {grain}"),
                F.expr(f"CAST({end} AS BIGINT) div {grain}"),
            )
        )

    lb = left.filter(
        F.col(ls).isNotNull() & F.col(le).isNotNull() & (F.col(ls) <= F.col(le))
    ).withColumn("__bucket", buckets(ls, le))
    rb = right.filter(
        F.col(rs).isNotNull() & F.col(re).isNotNull() & (F.col(rs) <= F.col(re))
    ).withColumn("__bucket", buckets(rs, re))
    for c in right.columns:
        if c not in on:
            rb = rb.withColumnRenamed(c, c + suffix)
    rs_, re_ = rs + suffix, re + suffix
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs_) <= F.col(le))
    # first-overlap-bucket filter: dedups multi-bucket pairs with no shuffle
    first_bucket = F.expr(
        f"CAST(greatest(CAST({ls} AS BIGINT), CAST({rs_} AS BIGINT)) div {grain} "
        "AS BIGINT)"
    )
    return (
        lb.join(rb, [*on, "__bucket"])
        .filter(overlap & (F.col("__bucket") == first_bucket))
        .drop("__bucket")
    )


def interval_coverage(
    df: DataFrame,
    bounds: tuple[str, str],
    grain: int,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Exploded interval membership per grain bucket — one row per interval
    per covered bucket, for downstream aggregation (count live intervals,
    sum a measure, distinct keys… per bucket).

    The explode-then-aggregate shape replaces an interval×calendar join:
    there is no join at all, just a bounded fan-out projection that
    pipelines into whatever aggregation follows.
    """
    s, e = bounds
    live = df.filter(
        F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(s) <= F.col(e))
    )
    return live.select(
        "*",
        F.explode(
            F.sequence(
                F.expr(f"CAST({s} AS BIGINT) div {grain}"),
                F.expr(f"CAST({e} AS BIGINT) div {grain}"),
            )
        ).alias(bucket_name),
    )
