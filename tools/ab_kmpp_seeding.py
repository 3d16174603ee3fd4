"""k-means|| vs hashed-id-sample seeding for the IVF coarse quantizer —
controlled A/B on the 400k hashed-BoW rung (round-10 verdict ask #5: a
probe-coverage lever measured, or a committed negative with numbers).

Both arms share EVERYTHING except the seed set: same corpus/queries, same
cell count (sqrt-N), same Lloyd iterations, same residual-PQ codebook
recipe, same probe/shortlist ladder (crivfpq2 = centered residual IVFADC,
multi-assignment r=2 — the round-10 champion config family). Reported per
arm: recall@10 / tail recall, wall (interleaved best-of-N with brute IN
the rotation), per-query probed-candidate volume, and cell-balance stats
(p99 / max cell size) — balanced cells are HOW better seeding shows up:
at equal n_probe a balanced index probes fewer candidates or covers more
true neighbors.

Usage: python tools/ab_kmpp_seeding.py [--vectors 400000] [--queries 200]
       [--cells 632] [--reps 2]
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

from scale_ann_run import DIM, _bow_fixture  # noqa: E402

from crypto_market_data_etl_spark.operators.similarity import (  # noqa: E402
    ann_recall,
    center_embeddings,
    coarse_residuals,
    cosine_topk_np,
    embedding_mean,
    ivfpq_index,
    ivfpq_topk,
    kmeans_parallel_init,
    kmeans_train,
    pq_train,
)
from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=400_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--cells", type=int, default=632)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="ab_kmpp_seeding")
    corpus, queries = _bow_fixture(spark, args)

    def build(name, fn):
        t0 = time.time()
        out = fn()
        if hasattr(out, "count"):
            out.count()
        print(
            json.dumps({"job": name, "sec": round(time.time() - t0, 2)}),
            flush=True,
        )
        return out

    bow_mean = embedding_mean(corpus)
    ccorp = build(
        "build_centered_corpus",
        lambda: center_embeddings(corpus, bow_mean, out_col="cvec")
        .select("vec_id", F.col("cvec").alias("embedding"))
        .localCheckpoint(),
    )

    seed_mod = max(1, args.vectors // args.cells)
    arms = {}
    # ARM A: hashed id-sample seeds (the incumbent protocol)
    arms["hash"] = build(
        "build_kmeans_hashseed_4iter",
        lambda: kmeans_train(
            ccorp, centroid_filter=F.col("vec_id") % seed_mod == 1, n_iters=4
        ),
    )
    # ARM B: k-means|| seeds, same k, same Lloyd budget
    kmpp_seeds = build(
        "build_kmeanspar_init",
        lambda: kmeans_parallel_init(ccorp, k=args.cells, rounds=4),
    )
    arms["kmpp"] = build(
        "build_kmeans_kmppseed_4iter",
        lambda: kmeans_train(ccorp, init=kmpp_seeds, n_iters=4),
    )

    built = {}
    for arm, cents in arms.items():
        cresid = build(
            f"build_residuals_{arm}",
            lambda c=cents: coarse_residuals(
                corpus, c, center_vec=bow_mean
            ).localCheckpoint(),
        )
        books = build(
            f"build_residual_pq_train_{arm}",
            lambda r=cresid: pq_train(
                r, vec_col="resid", m=8, k=64, n_iters=3, dim=DIM
            ),
        )
        idx = build(
            f"build_residual_index_r2_{arm}",
            lambda c=cents, b=books: ivfpq_index(
                corpus, c, b, center_vec=bow_mean, residual=True, assign_r=2
            ).localCheckpoint(),
        )
        sizes = idx.groupBy("c_id").count()
        q = sizes.approxQuantile("count", [0.5, 0.99], 0.0)
        stats = sizes.agg(
            F.count("*").alias("cells"), F.max("count").alias("max")
        ).first()
        print(
            json.dumps(
                {
                    "job": f"cell_balance_{arm}",
                    "cells_nonempty": stats["cells"],
                    "p50": q[0],
                    "p99": q[1],
                    "max": stats["max"],
                }
            ),
            flush=True,
        )
        built[arm] = (cents, books, idx)

    configs = [("brute_exact", lambda: cosine_topk_np(corpus, queries, k=args.k))]
    for arm in arms:
        cents, books, idx = built[arm]
        for n_probe in (16, 32):
            configs.append(
                (
                    f"crivfpq2_{arm}_probe{n_probe}_rerank400",
                    lambda c=cents, b=books, i=idx, p=n_probe: ivfpq_topk(
                        i, queries, c, b, corpus,
                        n_probe=p, k=args.k, shortlist=400,
                        center_vec=bow_mean, residual=True,
                    ),
                )
            )

    outs, walls = {}, {name: [] for name, _ in configs}
    for rep in range(args.reps):
        for name, fn in configs:
            t0 = time.time()
            out = fn().localCheckpoint()
            out.count()
            walls[name].append(round(time.time() - t0, 2))
            outs[name] = out
            print(
                json.dumps({"job": f"{name}_rep{rep}", "sec": walls[name][-1]}),
                flush=True,
            )
    exact = outs["brute_exact"]
    planted_pred = F.col("n_id") == F.col("q_id") - args.vectors
    tail = exact.filter(~planted_pred).localCheckpoint()
    tail.count()
    brute_best = min(walls["brute_exact"])

    # per-arm probed-candidate volume at each n_probe (the efficiency lens)
    from crypto_market_data_etl_spark.operators.similarity import (
        _collect_small_side,
        probe_cells_expr,
    )

    nq = queries.count()
    for name, _ in configs:
        d = {
            "job": name,
            "sec": min(walls[name]),
            "walls": walls[name],
            "cost_vs_brute_warm": round(min(walls[name]) / brute_best, 3),
        }
        if name != "brute_exact":
            arm = name.split("_")[1]
            n_probe = int(name.split("probe")[1].split("_")[0])
            cents, _books, idx = built[arm]
            cent_rows = _collect_small_side(
                cents.select("c_id", "c_vec").orderBy("c_id"), "centroid"
            )
            cand = (
                queries.select(
                    F.explode(
                        probe_cells_expr(
                            F.col("embedding"), cent_rows, n_probe, bow_mean
                        )
                    ).alias("c_id")
                )
                .join(idx.groupBy("c_id").count(), "c_id")
                .agg(F.sum("count").alias("cand"))
                .first()["cand"]
                or 0
            )
            d["avg_candidates_per_q"] = round(cand / max(nq, 1), 1)
            d["recall_at_k"] = float(ann_recall(outs[name], exact).first()["recall"])
            d["tail_recall_at_k"] = float(
                ann_recall(outs[name], tail).first()["recall"]
            )
        print(json.dumps(d), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
