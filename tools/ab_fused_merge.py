"""Interleaved A/B of ivfpq_topk_fused's two merge strategies (round-14
verdict ask #1 adjudication): ``merge="window"`` (the r13 physical form —
per-partition top-shortlist ROWS into a global row_number window) vs
``merge="arrays"`` (r14 — per-(partition, query) array emission + a
groupBy(q_id) applyInPandas fold).

Why interleaved: the r14 one-shot 12.8M rung ran on a box with ROVING
per-arm noise (the UNCHANGED ivfpq_topk reference arm landed at 2.46x
its r13 wall on one config and 0.88x on another; interleaved warm brute
walls spanned 18.2-38.8 s in one session) — one-shot walls cannot
attribute a wall delta to the merge change. Here both merges run
ABAB-interleaved against the SAME built index in the SAME session, so
box state hits both arms equally; the reading is the per-arm best and
the per-rep ratio.

Usage:
    SPARK_DRIVER_MEMORY=80g python tools/ab_fused_merge.py
        [--vectors 12800000] [--cells 3578] [--m 16]
        [--configs 96:6400,128:3200] [--reps 2]
Emits one JSON line per (config, merge, rep) + a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_data_etl_spark.operators.similarity import (  # noqa: E402
    PQ_TRAIN_PROBE_CAP,
    center_embeddings,
    coarse_residuals,
    embedding_mean,
    ivfpq_index,
    ivfpq_topk_fused,
    kmeans_train,
    pq_train,
)
from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def _emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=12_800_000)
    ap.add_argument("--queries", type=int, default=500)
    ap.add_argument("--cells", type=int, default=3578)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--kc", type=int, default=64)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--assign-r", type=int, default=2, dest="assign_r")
    ap.add_argument("--configs", default="96:6400,128:3200",
                    help="comma-separated n_probe:shortlist pairs")
    ap.add_argument("--reps", type=int, default=2,
                    help="ABAB reps per config (A=window, B=arrays)")
    args = ap.parse_args()

    spark = get_spark(app_name="ab_fused_merge")

    # same fixture as scale_ann_run --bow (shared helper)
    import scale_ann_run as sar

    sar_args = argparse.Namespace(vectors=args.vectors, queries=args.queries)
    corpus, queries = sar._bow_fixture(spark, sar_args)

    # build recipe mirrors scale_ann_run's crivfpq family exactly
    # (centered kmeans n_iters=4, centered residual codebooks)
    t0 = time.time()
    bow_mean = embedding_mean(corpus)
    seed_mod = max(1, args.vectors // args.cells)
    cents = kmeans_train(
        center_embeddings(corpus, bow_mean, out_col="cvec"),
        vec_col="cvec",
        centroid_filter=F.col("vec_id") % seed_mod == 1,
        n_iters=4,
    ).localCheckpoint()
    n_cells = cents.count()
    resid = coarse_residuals(
        corpus, cents, center_vec=bow_mean
    ).localCheckpoint()
    resid.count()
    pq_seed = (
        {} if args.vectors <= PQ_TRAIN_PROBE_CAP
        else {"seed_mod": max(1, args.vectors // args.kc)}
    )
    books = pq_train(
        resid, vec_col="resid", m=args.m, k=args.kc, n_iters=3, dim=64,
        **pq_seed,
    ).localCheckpoint()
    books.count()
    idx = ivfpq_index(
        corpus, cents, books, center_vec=bow_mean, residual=True,
        assign_r=args.assign_r,
    ).localCheckpoint()
    idx.count()
    _emit(job="build", sec=round(time.time() - t0, 2), cells=n_cells)

    walls: dict = {}
    rows: dict = {}
    for cfg in args.configs.split(","):
        n_probe, shortlist = (int(x) for x in cfg.split(":"))
        name = f"probe{n_probe}_rerank{shortlist}"
        for rep in range(args.reps):
            for merge_mode in ("window", "arrays"):
                t0 = time.time()
                out = ivfpq_topk_fused(
                    idx, queries, cents, books, corpus,
                    n_probe=n_probe, k=args.k, shortlist=shortlist,
                    center_vec=bow_mean, residual=True, merge=merge_mode,
                ).localCheckpoint()
                n = out.count()
                wall = round(time.time() - t0, 2)
                walls.setdefault((name, merge_mode), []).append(wall)
                rows[(name, merge_mode)] = n
                _emit(job=f"{name}_{merge_mode}", rep=rep, sec=wall, rows=n)
                spark.catalog.clearCache()

    summary = {}
    for cfg in args.configs.split(","):
        n_probe, shortlist = (int(x) for x in cfg.split(":"))
        name = f"probe{n_probe}_rerank{shortlist}"
        a = walls[(name, "window")]
        b = walls[(name, "arrays")]
        summary[name] = {
            "window_walls": a, "arrays_walls": b,
            "window_best": min(a), "arrays_best": min(b),
            "arrays_over_window": round(min(b) / min(a), 3),
            "rows_equal": rows[(name, "window")] == rows[(name, "arrays")],
        }
    _emit(job="summary", configs=summary)
    spark.stop()


if __name__ == "__main__":
    main()
