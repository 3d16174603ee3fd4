"""Shared-subtree materialization with a cluster-safe fallback.

Several operators reference one expensive subtree multiple times (an LSH
signature table feeds the band explode AND both pair sides; Spark does not
share subtrees, so without materialization it would be computed 3x). Two
strategies, each right in a different deployment:

- ``localCheckpoint(eager=False)`` — blocks live in executor storage and are
  freed by the ContextCleaner when the result DataFrame becomes unreferenced,
  so repeated operator calls in a long-lived session (bench, notebook) cannot
  accumulate cached tables the way un-``unpersist()``-ed ``persist()`` does.
  BUT the truncated lineage is not recomputable: on a real cluster an
  executor loss or dynamic-allocation decommission makes the blocks
  unrecoverable and fails the job.
- ``persist(MEMORY_AND_DISK)`` — keeps lineage, so lost blocks recompute;
  the production-cluster choice. Costs explicit lifecycle management (or a
  job-scoped session) to avoid storage accumulation.

:func:`materialize` picks by master (``local[*]`` -> localCheckpoint, else
persist) and exposes an override knob ``SPARK_GRAFT_MATERIALIZE`` in
{``localCheckpoint``, ``persist``} for benchmarking either path.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize a multiply-referenced subtree (see module docstring)."""
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE")
    if mode not in ("localCheckpoint", "persist"):
        master = ""
        try:
            master = df.sparkSession.conf.get("spark.master", "") or ""
        except Exception:  # pragma: no cover - connect mode has no master conf
            pass
        mode = "localCheckpoint" if master.startswith("local") else "persist"
    if mode == "persist":
        return df.persist(StorageLevel.MEMORY_AND_DISK)
    return df.localCheckpoint(eager=eager)
