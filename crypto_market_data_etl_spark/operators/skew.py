"""Skew guards for bucketed candidate-join operators (extension surface).

LSH-style candidate generation (minhash bands, sign-LSH buckets) is a
self-equi-join on the bucket key: a single degenerate bucket of *n* members
emits O(n²) candidate pairs. At 100 TB a near-duplicate-heavy corpus (boiler-
plate pages, empty/short docs hashing to one signature) turns that into a
quadratic stage on one shuffle partition. The guard: deterministically
truncate each bucket to its ``max_bucket_size`` smallest ids before the join
and LOG the dropped-member count — never a silent cap.

Members dropped from a hot bucket only lose candidacy through *that* bucket;
banded/multi-table schemes still surface the pair through their other bands,
which is why truncation (not sampling) is the standard production choice.
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

#: Default per-bucket member cap. Far above anything the test corpora
#: produce (so oracle parity is unaffected) while bounding a degenerate
#: bucket's pair blow-up to cap² at production scale.
DEFAULT_MAX_BUCKET_SIZE = 10_000


def cap_bucket_size(
    df: DataFrame,
    bucket_cols: Sequence[str],
    id_col: str,
    max_bucket_size: int = DEFAULT_MAX_BUCKET_SIZE,
    log_dropped: bool = True,
    log_fn: Callable[[str], None] | None = None,
) -> DataFrame:
    """Keep at most *max_bucket_size* members per bucket (smallest *id_col*
    first — deterministic), logging how many members were dropped.

    The rank is one window over the same key the candidate join shuffles on,
    so no extra shuffle is introduced. ``log_dropped`` runs a small
    aggregation action over the bucket projection at plan-build time (an
    extra scan of the narrow bucket table); pass ``False`` on hot paths
    where the caller audits bucket sizes separately.
    """
    if max_bucket_size is None:
        return df
    if log_dropped:
        n = F.col("n")
        stats = (
            df.groupBy(*bucket_cols)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.sum(F.when(n > max_bucket_size, n - max_bucket_size).otherwise(0)).alias(
                    "dropped"
                ),
                F.sum(F.when(n > max_bucket_size, 1).otherwise(0)).alias("hot_buckets"),
                F.max("n").alias("max_size"),
            )
            .first()
        )
        if stats["dropped"]:
            (log_fn or logger.warning)(
                f"cap_bucket_size: truncated {stats['hot_buckets']} hot bucket(s) "
                f"to {max_bucket_size} members (max seen {stats['max_size']}), "
                f"dropping {stats['dropped']} bucket membership(s)"
            )
    w = Window.partitionBy(*[F.col(c) for c in bucket_cols]).orderBy(id_col)
    return (
        df.withColumn("__bucket_rn", F.row_number().over(w))
        .filter(F.col("__bucket_rn") <= max_bucket_size)
        .drop("__bucket_rn")
    )
