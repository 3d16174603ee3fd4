"""As-of (backward, tolerance-bounded) join — SURVEY §2.3 J1+J2.

Reference semantics (``spark_src/processing_raw_data_from_gcs.py:143-160``):
left rows (dollar bars stamped with their final timestamp) pick up the most
recent right row (orderbook snapshot) with the same key and
``left_ts - tolerance <= right_ts <= left_ts``; left outer — bars with no
snapshot in the band keep NULLs.

Physical design (the reference's raw band-condition join plans as a
BroadcastNestedLoopJoin — per-key cartesian — fine at 3 symbols, fatal at
100 TB; SURVEY §4 item 1): we bucket time by the tolerance and turn the band
into a **shuffled equi-join**:

- left bucket  = left_ts div tolerance
- each right row can only serve left rows in its own bucket or the next one,
  so the right side explodes into exactly 2 (bucket, bucket+1) candidates,
- equi-join on (keys..., bucket) with the band predicate *inside the join
  condition* (keeps unmatched left rows for the outer join),
- ``row_number`` desc over right (ts, tiebreak) keeps the latest in band.

Cost: 2x right-side shuffle volume, one shuffle each side, no nested loop.
AQE skew-join splits any hot (key, bucket). An event-time-sorted merge-asof
(``applyInPandas`` + ``pd.merge_asof``) is available as ``merge_asof_grouped``
for very dense right sides where the 2x dup or rank dedupe dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int,
    right_tiebreak: Sequence[str] = (),
    how: str = "left",
    suffix: str = "_r",
    left_keys: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of join on integer time columns (e.g. epoch µs).

    Every right column except the keys is emitted with ``suffix``. One right
    row per left row (latest with ``left_ts - tolerance <= right_ts <= left_ts``).
    ``left_keys`` must uniquely identify a left row (default: all left
    columns — pass the real key for a cheaper rank partition).
    """
    on = list(on)
    lb = left.withColumn("__bucket", F.expr(f"{left_ts} div {tolerance}"))
    rb = (
        right.withColumn("__b0", F.expr(f"{right_ts} div {tolerance}"))
        .withColumn("__bucket", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)))
        .drop("__b0")
    )
    # rename right payload columns to avoid collisions
    payload = [c for c in right.columns if c not in on]
    for c in payload:
        rb = rb.withColumnRenamed(c, c + suffix)
    r_ts = right_ts + suffix

    cond = (F.col(f"__l.__bucket") == F.col("__r.__bucket"))
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    cond = (
        cond
        & (F.col(f"__r.{r_ts}") <= F.col(f"__l.{left_ts}"))
        & (F.col(f"__r.{r_ts}") >= F.col(f"__l.{left_ts}") - F.lit(tolerance))
    )
    joined = lb.alias("__l").join(rb.alias("__r"), cond, how)

    out_cols = [F.col(f"__l.{c}") for c in left.columns] + [
        F.col(f"__r.{c}{suffix}").alias(c + suffix) for c in payload
    ]
    joined = joined.select(*out_cols)

    # keep latest-in-band per left row: rank right rows (NULLs from the outer
    # join sort last under desc, so unmatched lefts survive with rn=1)
    rank_order = [F.col(r_ts).desc_nulls_last()] + [
        F.col(c + suffix).desc_nulls_last() for c in right_tiebreak
    ]
    part = list(left_keys) if left_keys else list(left.columns)
    w = F.row_number().over(Window.partitionBy(*part).orderBy(*rank_order))
    return joined.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")


def merge_asof_grouped(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int,
    suffix: str = "_r",
) -> DataFrame:
    """Alternative as-of via per-key ``pd.merge_asof`` (Arrow-batched).

    Groups both sides by key and runs a sorted merge per group — O(n+m) per
    key vs the rank-join's O(n log n); preferable when the right side is much
    denser than tolerance buckets. Requires each key's data to fit in one
    executor's memory (use the bucketed ``asof_join`` otherwise).
    """
    on = list(on)
    payload = [c for c in right.columns if c not in on]
    l_tag = left.withColumn("__side", F.lit(0))
    r_tag = right.select(
        *on, *[F.col(c).alias(c + suffix) for c in payload]
    ).withColumn("__side", F.lit(1))
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields)
        + ", "
        + ", ".join(
            f"`{f.name}{suffix}` {f.dataType.simpleString()}"
            for f in right.schema.fields
            if f.name not in on
        )
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    lcols = list(left.columns)
    rcols = [c + suffix for c in payload]
    r_ts_s = right_ts + suffix

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lf = pdf[pdf["__side"] == 0][lcols].sort_values(left_ts)
        rf = pdf[pdf["__side"] == 1][rcols].sort_values(r_ts_s)
        if lf.empty:
            return pd.DataFrame(columns=lcols + rcols)
        merged = pd.merge_asof(
            lf,
            rf,
            left_on=left_ts,
            right_on=r_ts_s,
            direction="backward",
            tolerance=tolerance,
        )
        return merged[lcols + rcols]

    return unioned.groupBy(*on).applyInPandas(merge, schema=out_schema)
