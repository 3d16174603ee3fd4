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

Lifecycle on the persist path: the persisted DataFrames are internal to the
operators, so callers have no handle to ``unpersist()``. Every persist is
therefore tracked in a module registry, and a long-lived cluster session
calls :func:`release_all` between pipeline runs (a job-scoped session makes
even that unnecessary — storage dies with the session). The
localCheckpoint path needs neither: the ContextCleaner frees blocks when
the DataFrames become unreferenced.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

#: persist-mode DataFrames awaiting release. STRONG references on purpose:
#: the registry exists precisely for DataFrames that are operator-LOCAL —
#: Python collects the wrapper the moment the operator returns, but the JVM
#: CacheManager keeps the MEMORY_AND_DISK blocks until an explicit
#: unpersist, which Python GC never issues. A weakref here would be dead by
#: the time release_all() ran (measured: it released 0 of the operator-
#: internal tables). The handles are tiny (plan wrappers), and
#: :func:`release_all` drains the list.
_PERSISTED: list[DataFrame] = []


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
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED.append(out)
        return out
    return df.localCheckpoint(eager=eager)


def release(df: DataFrame) -> bool:
    """Unpersist ONE materialized DataFrame and drop it from the persist
    registry. For iterative operators (e.g. ``bpe_learn``) that supersede a
    materialized table every round: a bare ``unpersist()`` would free the
    blocks but leave the dead plan wrapper in :data:`_PERSISTED` — tens of
    thousands of stale entries for a real BPE vocabulary — until
    :func:`release_all`. Returns True when the DataFrame was registered
    (persist mode); False on the localCheckpoint path (still unpersisted —
    harmless no-op there, the ContextCleaner owns those blocks)."""
    try:
        df.unpersist()
    except Exception:  # pragma: no cover - session already stopped
        pass
    try:
        _PERSISTED.remove(df)
        return True
    except ValueError:
        return False


def release_all() -> int:
    """Unpersist every DataFrame :func:`materialize` persisted (persist
    mode only — localCheckpoint blocks are ContextCleaner-managed). Call
    between pipeline runs in a long-lived cluster session; returns the
    number of tables released."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # pragma: no cover - session already stopped
            pass
    return n
