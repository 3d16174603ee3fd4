"""Residual-IVFADC vs centered-ADC on the 400k BoW rung — interleaved
best-of-N (round-9 headline measurement, closes the round-8 verdict ask #1:
"a SCALE_r09 sweep_bow_400k tier beating 0.64 recall @ 0.34x brute").

The single-shot brute reference in the sweep harness is a weak denominator
(measured 6.0 / 8.7 / 15.1 / 19.9 s across four same-box runs of the same
code — driver-box noise); here BRUTE RUNS IN THE ROTATION like every other
config, so the cost ratio is best-of-N over best-of-N on identical box
state — the judge-accepted interleaved protocol (the x02 / scale_ivfpq
template).

Configs: exact brute (cosine_topk_np), full-scan centered-ADC + rerank400
(the r8 champion: 0.64 recall @ 0.34x), and the residual ladder
crivfpq probe{32,64,96} x rerank{400,1600} — centered assignment space,
PQ codebooks over per-cell residuals, per-(query, cell) ADC tables, exact
raw rerank. Build costs reported separately as one-off index costs.

Usage: python tools/ab_bow_residual.py [--vectors 400000] [--queries 200]
       [--reps 3]
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
    kmeans_train,
    pq_encode,
    pq_topk_rerank,
    pq_train,
)
from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=400_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = get_spark(app_name="ab_bow_residual")
    corpus, queries = _bow_fixture(spark, args)

    def build(name, fn):
        t0 = time.time()
        out = fn()
        out.count()
        print(
            json.dumps({"job": name, "sec": round(time.time() - t0, 2)}), flush=True
        )
        return out

    bow_mean = embedding_mean(corpus)
    trained_cen = build(
        "build_centered_kmeans_4iter",
        lambda: kmeans_train(
            center_embeddings(corpus, bow_mean, out_col="cvec"),
            vec_col="cvec",
            centroid_filter=F.col("vec_id") % 400 == 1,
            n_iters=4,
        ),
    )
    # centered-ADC build (the r8 champion's artifacts)
    ccorp = build(
        "build_centered_corpus",
        lambda: center_embeddings(corpus, bow_mean, out_col="cvec")
        .select("vec_id", F.col("cvec").alias("embedding"))
        .localCheckpoint(),
    )
    cq = (
        center_embeddings(queries, bow_mean, out_col="cvec")
        .select("vec_id", F.col("cvec").alias("embedding"))
        .localCheckpoint()
    )
    cq.count()
    books_cen = build(
        "build_centered_pq_train",
        lambda: pq_train(ccorp, m=8, k=64, n_iters=3, dim=DIM),
    )
    codes_cen = build(
        "build_centered_pq_encode",
        lambda: pq_encode(ccorp, books_cen).localCheckpoint(),
    )
    cen_idx = build(
        "build_centered_ivfpq_index",
        lambda: ivfpq_index(ccorp, trained_cen, books_cen).localCheckpoint(),
    )
    # residual build (round-9): codebooks over per-cell residuals in the
    # centered assignment space; fused one-pass index
    cresid = build(
        "build_coarse_residuals",
        lambda: coarse_residuals(
            corpus, trained_cen, center_vec=bow_mean
        ).localCheckpoint(),
    )
    books_cres = build(
        "build_residual_pq_train",
        lambda: pq_train(cresid, vec_col="resid", m=8, k=64, n_iters=3, dim=DIM),
    )
    cres_idx = build(
        "build_residual_ivfpq_index",
        lambda: ivfpq_index(
            corpus, trained_cen, books_cres, center_vec=bow_mean, residual=True
        ).localCheckpoint(),
    )
    # strict-contract variant: cells trained on the NORMALIZED centered
    # column, so centroids are exactly assignment-space means (the
    # residual-mode contract; trained_cen above is centered-unnormalized —
    # scale ~1, within tolerance, but not exact means of what assignment
    # actually compares)
    from crypto_market_data_etl_spark.operators.similarity import with_norm

    ccorp_n = (
        with_norm(ccorp)
        .select(
            "vec_id", F.expr("transform(embedding, x -> x / norm)").alias("embedding")
        )
        .localCheckpoint()
    )
    ccorp_n.count()
    trained_cen_n = build(
        "build_centered_norm_kmeans_4iter",
        lambda: kmeans_train(
            ccorp_n, centroid_filter=F.col("vec_id") % 400 == 1, n_iters=4
        ),
    )
    cresid_n = build(
        "build_coarse_residuals_norm",
        lambda: coarse_residuals(
            corpus, trained_cen_n, center_vec=bow_mean
        ).localCheckpoint(),
    )
    books_cres_n = build(
        "build_residual_norm_pq_train",
        lambda: pq_train(cresid_n, vec_col="resid", m=8, k=64, n_iters=3, dim=DIM),
    )
    cres_n_idx = build(
        "build_residual_norm_ivfpq_index",
        lambda: ivfpq_index(
            corpus, trained_cen_n, books_cres_n, center_vec=bow_mean, residual=True
        ).localCheckpoint(),
    )

    configs = [
        ("brute_exact", lambda: cosine_topk_np(corpus, queries, k=args.k)),
    ]
    for shortlist in (400, 1600):
        configs.append(
            (
                f"cpq_m8k64_rerank{shortlist}",
                lambda s=shortlist: pq_topk_rerank(
                    codes_cen, cq, books_cen, corpus,
                    k=args.k, shortlist=s, rerank_queries=queries,
                ),
            )
        )
    # the controlled ablation: civfpq (centered-global codes) vs crivfpq
    # (per-cell residual codes) at IDENTICAL cells/probes/shortlist — only
    # the code space differs
    for n_probe, shortlist in [(64, 1600), (96, 1600)]:
        configs.append(
            (
                f"civfpq_probe{n_probe}_rerank{shortlist}",
                lambda p=n_probe, s=shortlist: ivfpq_topk(
                    cen_idx, cq, trained_cen, books_cen, corpus,
                    n_probe=p, k=args.k, shortlist=s,
                    rerank_queries=queries,
                ),
            )
        )
    for n_probe, shortlist in [(32, 400), (64, 400), (96, 400), (64, 1600), (96, 1600)]:
        configs.append(
            (
                f"crivfpq_probe{n_probe}_rerank{shortlist}",
                lambda p=n_probe, s=shortlist: ivfpq_topk(
                    cres_idx, queries, trained_cen, books_cres, corpus,
                    n_probe=p, k=args.k, shortlist=s,
                    center_vec=bow_mean, residual=True,
                ),
            )
        )
    for n_probe, shortlist in [(64, 1600), (96, 1600)]:
        configs.append(
            (
                f"crivfpqn_probe{n_probe}_rerank{shortlist}",
                lambda p=n_probe, s=shortlist: ivfpq_topk(
                    cres_n_idx, queries, trained_cen_n, books_cres_n, corpus,
                    n_probe=p, k=args.k, shortlist=s,
                    center_vec=bow_mean, residual=True,
                ),
            )
        )

    outs: dict[str, object] = {}
    walls: dict[str, list[float]] = {name: [] for name, _ in configs}
    for rep in range(args.reps):
        for name, fn in configs:  # interleaved: every config, every rep
            t0 = time.time()
            out = fn().localCheckpoint()
            out.count()
            wall = time.time() - t0
            walls[name].append(round(wall, 2))
            outs[name] = out  # deterministic: any rep's result works
            print(
                json.dumps({"job": f"{name}_rep{rep}", "sec": round(wall, 2)}),
                flush=True,
            )
    exact = outs["brute_exact"]
    planted_pred = F.col("n_id") == F.col("q_id") - args.vectors
    tail = exact.filter(~planted_pred).localCheckpoint()
    tail.count()
    brute_best = min(walls["brute_exact"])
    for name, _ in configs:
        d = {
            "job": name,
            "sec": min(walls[name]),
            "walls": walls[name],
            "cost_vs_brute": round(min(walls[name]) / brute_best, 3),
        }
        if name != "brute_exact":
            d["recall_at_k"] = float(ann_recall(outs[name], exact).first()["recall"])
            d["tail_recall_at_k"] = float(
                ann_recall(outs[name], tail).first()["recall"]
            )
        print(json.dumps(d), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
