"""Sketch-based approximate aggregates — the 100 TB substitutes for exact
distinct/quantile/frequency operators.

None of these exist in the reference (SURVEY §2.4: no count-distinct at all);
they are extension-surface operators every large-scale data pipeline needs:

- :func:`hll_distinct` — Apache DataSketches HLL via Spark's built-in
  ``hll_sketch_agg``/``hll_sketch_estimate``. The sketch is a MERGEABLE
  binary: partial sketches per partition/day union into totals without
  rescanning (the same partial-merge pattern as candle rollups).
- :func:`approx_quantiles` — ``percentile_approx`` (KLL-style bounded-memory
  quantiles) vs the exact ``percentile`` used in q17.
- :func:`heavy_hitters` — exact share-threshold frequency (the groupBy-count
  form; at extreme cardinality swap in count-min + a second pass).

Approximation accuracy is asserted in tests against exact answers (no DuckDB
oracle — sketch internals are engine-specific by nature, which is exactly why
the driver contract allows rows-only entries for them).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Approximate distinct count per group + the mergeable sketch itself."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_estimate(hll_sketch_agg({value_col}, {lg_k}))").alias(
            "approx_distinct"
        ),
        F.expr(f"hll_sketch_agg({value_col}, {lg_k})").alias("sketch"),
    )


def hll_merge(sketches: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Union partial sketches (e.g. per-day) into coarser groups — no rescan."""
    return sketches.groupBy(*group_cols).agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch))").alias("approx_distinct")
    )


def approx_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.9),
    accuracy: int = 10_000,
) -> DataFrame:
    probs = ", ".join(str(p) for p in probabilities)
    return df.groupBy(*group_cols).agg(
        F.expr(
            f"percentile_approx({value_col}, array({probs}), {accuracy})"
        ).alias("quantiles")
    )


def heavy_hitters(
    df: DataFrame,
    group_cols: Sequence[str],
    item_col: str,
    min_share: float = 0.01,
) -> DataFrame:
    """Items with frequency share >= min_share within each group."""
    counts = (
        df.groupBy(*group_cols, item_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("total", F.sum("n").over(Window.partitionBy(*group_cols)))
    )
    return (
        counts.withColumn("share", F.col("n") / F.col("total"))
        .filter(F.col("share") >= min_share)
        .drop("total")
    )
