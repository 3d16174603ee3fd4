"""Duplicate clustering: connected components over a near-dup pair list.

The missing last step of every dedup pipeline: pair generation (MinHash/LSH,
``operators/dedup.py``) yields edges, but the *action* — keep one doc per
duplicate group — needs the transitive closure: if A~B and B~C, then A,B,C
are one group even though (A,C) was never a candidate pair. Not in the
reference (no graph ops anywhere); standard map-reduce CC literature
(Kiveris et al., "Connected Components in MapReduce and Beyond").

Algorithm: iterative **min-label propagation with pointer jumping**, pure
DataFrame joins:

  label(v) <- min(label(v), min over neighbours u of label(u))     (spread)
  label(v) <- label(label(v))                                      (jump)

The pointer-jumping step halves the depth of label chains each round, giving
O(log d) rounds on path-shaped components (plain propagation is O(d)). Each
round is two shuffled equi-joins on bounded keys; the per-round convergence
check is a scalar ``count`` of changed labels (a driver-side scalar, not a
collect of data).

Iterative DataFrame algorithms MUST cut lineage every round: the labels
table is referenced three times per round, so the logical plan tree grows
exponentially — ``persist()`` alone caches data but keeps the full plan (a
20-round loop overflows Catalyst's 2 GiB plan-string limit before it runs
out of anything else). Each round therefore ends in an eager
``localCheckpoint()``, making the next round's plan O(1) deep; on a real
cluster with a fault-tolerance requirement, swap in reliable
``checkpoint()`` against a checkpoint dir — same shape.

Determinism: the fixpoint is unique (min id of the component), so the result
is engine-independent — a DuckDB recursive-CTE reachability oracle computes
the identical labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """Component label (min node id in the component) per node.

    ``pairs`` is an undirected edge list; nodes are everything appearing in
    either column. Output: ``(node, comp)`` with ``comp = min(id)`` over the
    node's component. Raises if ``max_rounds`` is hit without convergence
    (pointer jumping makes that ~2^25-deep chains — unreachable in practice).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        # spread: min over self + neighbour labels (old label carried along
        # so the convergence check below needs no extra join)
        nbr = (
            edges.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        spread = labels.join(nbr, "node", "left").select(
            "node",
            F.least("comp", F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            F.col("comp").alias("old"),
        )
        # jump: comp <- label(comp); a component label is always a node
        jumped = (
            spread.join(
                labels.select(
                    F.col("node").alias("comp"), F.col("comp").alias("comp2")
                ),
                "comp",
            )
            .select("node", F.least("comp", "comp2").alias("comp"), "old")
            .localCheckpoint()  # eager: cuts lineage AND materializes the round
        )
        # scan of the just-cached result — no join, no shuffle
        changed = jumped.filter(F.col("comp") != F.col("old")).count()
        labels = jumped.select("node", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")


def dup_groups(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Duplicate groups from a pair list: ``(node, comp, group_size)``.

    ``comp`` is the canonical survivor id (min id of the group); a dedup
    pipeline keeps ``node == comp`` rows and drops the rest.
    """
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("comp").agg(F.count(F.lit(1)).alias("group_size"))
    return cc.join(sizes, "comp").select("node", "comp", "group_size")
