"""Connected-components distributed-tier scale rung (round-9, closes the
round-8 verdict ask #6): the star-contraction loop's geometric edge-shrink
claim, measured as a committed per-round artifact instead of a docstring
number.

Fixture: a deterministic mixed-topology edge list well above the 2M-edge
driver threshold —

- **chains** (depth stress: pointer jumping must halve label-chain depth),
- **cliques** (volume stress: a clique's edges collapse to nothing in one
  contraction round — the geometric-shrink best case),
- **random block pairs** (Erdős–Rényi-ish small components, the typical
  near-dup residue shape).

The run forces the DISTRIBUTED tier on the full list (driver_threshold
stays at its default, so the loop also demonstrates the production
cut-over: the moment the contracted residue fits the driver budget, the
numpy kernel finishes it). Per-round (edges_in, sec) comes from the
operator's own ``round_stats`` hook; correctness is checked by re-running
the SAME edge list through the numpy kernel alone (driver_threshold high
enough to swallow it) and asserting identical (node, comp) labels — the
unique min-id fixpoint is engine- and tier-independent.

Usage: python tools/scale_cc_run.py [--chains 10000] [--chain-len 100]
       [--cliques 2000] [--clique-size 40] [--random-edges 4000000]
Emits one JSON line per stage; rows feed SCALE_r{N}.json cc_distributed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_data_etl_spark.operators.clustering import (  # noqa: E402
    connected_components,
)
from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def build_edges(spark, args):
    """Deterministic mixed-topology undirected edge list, generated
    DISTRIBUTED (spark.range + expressions — no driver-side edge array)."""
    chain_nodes = args.chains * args.chain_len
    # chains: node i -> i+1 within each chain of chain_len consecutive ids
    chains = (
        spark.range(chain_nodes)
        .filter((F.col("id") % args.chain_len) != args.chain_len - 1)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    # cliques: all pairs within consecutive-id groups, offset past chains
    base_c = chain_nodes
    s = args.clique_size
    cliques = (
        spark.range(args.cliques * s)
        .select((F.col("id") + base_c).alias("u"), (F.col("id") % s).alias("pos"))
        .select(
            "u",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.lit(s - 1) - F.col("pos"), F.lit(0))
                )
            ).alias("step"),
        )
        .select(F.col("u").alias("id_a"), (F.col("u") + F.col("step")).alias("id_b"))
    )
    # random pairs inside 64-node blocks, offset past cliques (xxhash64 —
    # deterministic, no RNG state)
    base_r = base_c + args.cliques * s
    rand = (
        spark.range(args.random_edges)
        .select(
            (
                base_r
                + F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(args.random_nodes))
            ).alias("id_a"),
            (
                base_r
                + F.pmod(F.xxhash64(F.col("id") * 2), F.lit(args.random_nodes))
            ).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    return chains.unionByName(cliques).unionByName(rand).repartition(32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=10_000)
    ap.add_argument("--chain-len", type=int, default=100)
    ap.add_argument("--cliques", type=int, default=2_000)
    ap.add_argument("--clique-size", type=int, default=40)
    ap.add_argument("--random-edges", type=int, default=4_000_000)
    ap.add_argument("--random-nodes", type=int, default=2_000_000)
    args = ap.parse_args()

    spark = get_spark(app_name="scale_cc")
    edges = build_edges(spark, args).localCheckpoint()
    n_edges = edges.count()
    n_nodes = (
        edges.select(F.col("id_a").alias("n"))
        .unionByName(edges.select(F.col("id_b").alias("n")))
        .distinct()
        .count()
    )
    print(json.dumps({"job": "cc_fixture", "edges": n_edges, "nodes": n_nodes}), flush=True)

    stats: list = []
    t0 = time.time()
    dist = connected_components(edges, round_stats=stats).localCheckpoint()
    n_rows = dist.count()
    dist_wall = round(time.time() - t0, 2)
    for s in stats:
        print(json.dumps({"job": "cc_round", **s}), flush=True)
    rounds = [s for s in stats if "round" in s]
    shrink = [
        round(rounds[i + 1]["edges_in"] / rounds[i]["edges_in"], 3)
        for i in range(len(rounds) - 1)
    ]
    print(
        json.dumps(
            {
                "job": "cc_distributed_total",
                "sec": dist_wall,
                "rows": n_rows,
                "rounds": len(rounds),
                "edge_shrink_per_round": shrink,
            }
        ),
        flush=True,
    )

    # ground truth: the numpy kernel alone over the same list (the driver
    # tier swallows it wholesale); identical labels required
    t0 = time.time()
    ref = connected_components(
        edges, driver_threshold=max(n_edges + 1, 10_000_000)
    ).localCheckpoint()
    ref_wall = round(time.time() - t0, 2)
    diff = (
        dist.join(ref.withColumnRenamed("comp", "ref_comp"), "node")
        .filter(F.col("comp") != F.col("ref_comp"))
        .count()
    )
    print(
        json.dumps(
            {
                "job": "cc_driver_reference",
                "sec": ref_wall,
                "rows": ref.count(),
                "label_mismatches": diff,
            }
        ),
        flush=True,
    )
    assert diff == 0, "distributed tier diverged from the numpy fixpoint"
    spark.stop()


if __name__ == "__main__":
    main()
