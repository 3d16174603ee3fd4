"""Probe-scale A/B for the Arrow rerank tier (VERDICT r15 #6).

The gated fixtures rerank a few thousand candidate pairs, where the x13
lesson holds: shipping BOTH vectors of every pair through the Arrow
boundary costs more than the per-pair JVM fold saves, so the tier is
default-off. This probe measures the crossover shape the tier exists for —
a large candidate set (queries × shortlist) over a synthetic corpus — by
timing _rerank_candidates with arrow=True vs False, interleaved within one
session, best-of-N noop-sink walls.

Usage: python tools/rerank_probe_r16.py [--n 200000] [--dim 64]
         [--n-queries 1000] [--shortlist 200] [--inner 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--n-queries", type=int, default=1000)
    ap.add_argument("--shortlist", type=int, default=200)
    ap.add_argument("--inner", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crypto_market_data_etl_spark.operators.similarity import (
        _rerank_candidates,
    )
    from crypto_market_data_etl_spark.session import get_spark

    spark = get_spark(app_name="rerank_probe_r16")
    vecs = (
        spark.range(args.n)
        .selectExpr(
            "id as vec_id",
            f"cast(transform(sequence(1, {args.dim}), "
            "i -> rand(7) * 2 - 1) as array<float>) as embedding",
        )
        .repartition(64)
        .localCheckpoint()
    )
    vecs.count()
    # deterministic candidate set: n_queries query ids x shortlist neighbor
    # ids each (disjoint from the query id), pairs = n_queries * shortlist
    cand = (
        spark.range(args.n_queries)
        .selectExpr("id * 97 % {n} as q_id".format(n=args.n))
        .crossJoin(spark.range(args.shortlist).selectExpr("id as s"))
        .selectExpr("q_id", f"(q_id + 1 + s * 131) % {args.n} as n_id")
        .filter("q_id != n_id")
        .repartition(64)
        .localCheckpoint()
    )
    n_pairs = cand.count()
    print(f"# {n_pairs} candidate pairs over {args.n}x{args.dim}", file=sys.stderr)

    walls = {"arrow": [], "fold": []}
    for rep in range(args.inner):
        for arm, flag in (("arrow", True), ("fold", False)):
            spark.sparkContext.setJobDescription(f"rerank_probe:{arm}:{rep}")
            t0 = time.time()
            _rerank_candidates(
                cand, vecs, "vec_id", "embedding", 10, arrow=flag
            ).write.format("noop").mode("overwrite").save()
            walls[arm].append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
    out = {
        "n": args.n, "dim": args.dim, "pairs": n_pairs,
        "arrow_best": min(walls["arrow"]), "fold_best": min(walls["fold"]),
        "arrow_walls": walls["arrow"], "fold_walls": walls["fold"],
        "arrow_over_fold": round(min(walls["arrow"]) / min(walls["fold"]), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
