"""As-of (backward, tolerance-bounded) join — SURVEY §2.3 J1+J2.

Reference semantics (``spark_src/processing_raw_data_from_gcs.py:143-160``):
left rows (dollar bars stamped with their final timestamp) pick up the most
recent right row (orderbook snapshot) with the same key and
``left_ts - tolerance <= right_ts <= left_ts``; left outer — bars with no
snapshot in the band keep NULLs.

Physical design (the reference's raw band-condition join plans as a
BroadcastNestedLoopJoin — per-key cartesian — fine at 3 symbols, fatal at
100 TB; SURVEY §4 item 1): we bucket time by the tolerance and turn the band
into a **shuffled equi-join**:

- left bucket  = left_ts div tolerance
- each right row can only serve left rows in its own bucket or the next one,
  so the right side explodes into exactly 2 (bucket, bucket+1) candidates,
- equi-join on (keys..., bucket) with the band predicate *inside the join
  condition* (keeps unmatched left rows for the outer join),
- ``row_number`` desc over right (ts, tiebreak) keeps the latest in band.

Cost: 2x right-side shuffle volume, one shuffle each side, no nested loop.
AQE skew-join splits any hot (key, bucket). An event-time-sorted merge-asof
(``applyInPandas`` + ``pd.merge_asof``) is available as ``merge_asof_grouped``
for very dense right sides where the 2x dup or rank dedupe dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int,
    right_tiebreak: Sequence[str] = (),
    how: str = "left",
    suffix: str = "_r",
    left_keys: Sequence[str] | None = None,
) -> DataFrame:
    """Backward as-of join on integer time columns (e.g. epoch µs).

    Every right column except the keys is emitted with ``suffix``. One right
    row per left row (latest with ``left_ts - tolerance <= right_ts <= left_ts``).
    ``left_keys`` must uniquely identify a left row (pass the real key for
    the cheapest rank partition). When omitted, a per-row unique id is
    generated so fully-duplicate left rows each keep their own output row
    (instead of silently collapsing under an all-columns rank partition).
    """
    on = list(on)
    gen_id = left_keys is None
    if gen_id:
        left = left.withColumn("__lid", F.monotonically_increasing_id())
    lb = left.withColumn("__bucket", F.expr(f"{left_ts} div {tolerance}"))
    rb = (
        right.withColumn("__b0", F.expr(f"{right_ts} div {tolerance}"))
        .withColumn("__bucket", F.explode(F.array(F.col("__b0"), F.col("__b0") + 1)))
        .drop("__b0")
    )
    # rename right payload columns to avoid collisions
    payload = [c for c in right.columns if c not in on]
    for c in payload:
        rb = rb.withColumnRenamed(c, c + suffix)
    r_ts = right_ts + suffix

    cond = (F.col(f"__l.__bucket") == F.col("__r.__bucket"))
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    cond = (
        cond
        & (F.col(f"__r.{r_ts}") <= F.col(f"__l.{left_ts}"))
        & (F.col(f"__r.{r_ts}") >= F.col(f"__l.{left_ts}") - F.lit(tolerance))
    )
    joined = lb.alias("__l").join(rb.alias("__r"), cond, how)

    out_cols = [F.col(f"__l.{c}") for c in left.columns] + [
        F.col(f"__r.{c}{suffix}").alias(c + suffix) for c in payload
    ]
    joined = joined.select(*out_cols)

    # keep latest-in-band per left row: rank right rows (NULLs from the outer
    # join sort last under desc, so unmatched lefts survive with rn=1)
    rank_order = [F.col(r_ts).desc_nulls_last()] + [
        F.col(c + suffix).desc_nulls_last() for c in right_tiebreak
    ]
    part = ["__lid"] if gen_id else list(left_keys)
    w = F.row_number().over(Window.partitionBy(*part).orderBy(*rank_order))
    out = joined.withColumn("__rn", w).filter(F.col("__rn") == 1).drop("__rn")
    return out.drop("__lid") if gen_id else out


#: Measured adaptive-vs-rank crossover (tools/scale_market_run on the
#: gen_market_fixture ladder, local[32], 10 s tolerance): hottest-key
#: density ~81 right rows per tolerance bucket -> the plain rank join wins
#: (adaptive 2x SLOWER, tuned_speedup 0.49 at the 2M rung — its stats/lead/
#: interval passes over the full right side are pure overhead when buckets
#: are small); ~324 -> adaptive wins 1.96x; ~810 -> 5.05x. 128 sits between
#: the measured rungs.
ASOF_ADAPTIVE_MIN_DENSITY = 128.0


#: asof_hot_density memo: semantic-hash of the right plan -> density. The
#: probe is a (sampled) scan of the right side; repeated calls on the same
#: plan in one session (bench best-of-N, notebook iteration) should pay it
#: once — the same contract as a production catalog's table statistics.
_DENSITY_MEMO: dict[tuple, float] = {}


def clear_density_memo() -> None:
    """Invalidate :func:`asof_hot_density`'s per-plan memo (e.g. after
    overwriting a path the probed plan reads)."""
    _DENSITY_MEMO.clear()


def asof_hot_density(
    right: DataFrame,
    on: Sequence[str],
    right_ts: str,
    tolerance: int,
    probe_rows: int = 1_000_000,
) -> float:
    """Hottest key's expected right rows per tolerance bucket — the scalar
    that decides rank-join vs interval-adaptive as-of (one stats probe:
    per-key count + ts span, map-side combined; the same job shape as
    ``blocked.auto_block_span``).

    Density is a RATE (rows per tolerance-sized bucket), so it can be
    measured on a bounded WINDOW of the input instead of the whole table:
    the probe reads at most ``probe_rows`` rows (``limit`` short-circuits
    the scan — at 10M fixture rows the probe drops from a 3-4 s full
    aggregation to a sub-second partial read, which is what makes the
    ``adaptive_asof="auto"`` knob affordable at SMALL scale where the
    decision is "stay with the rank join"). Uniform-rate windows estimate
    the full-table density exactly; bursty windows wobble it, and the
    decision threshold sits between rungs measured at 81 vs 324 — a 2.5x
    margin either side. ``probe_rows=0`` scans everything. Results are
    memoized per analyzed plan (``semanticHash``): bench/notebook re-runs
    pay the probe once; :func:`clear_density_memo` invalidates after a
    path rewrite.
    """
    key = None
    try:
        # probe_rows is part of the key: a sampled estimate must not be
        # served to a later probe_rows=0 ("scan everything") call — the
        # two are different measurements of the same plan
        key = (
            right._jdf.queryExecution().analyzed().semanticHash(),
            tuple(str(c) for c in on),
            right_ts,
            tolerance,
            int(probe_rows),
        )
        if key in _DENSITY_MEMO:
            return _DENSITY_MEMO[key]
    except Exception:  # pragma: no cover - connect mode lacks _jdf
        pass
    probe = right.select(*[str(c) for c in on], right_ts)
    if probe_rows:
        probe = probe.limit(int(probe_rows))
    per_key = probe.groupBy(*[str(c) for c in on]).agg(
        F.count(F.lit(1)).alias("__n"),
        (F.max(right_ts) - F.min(right_ts)).alias("__span"),
    )
    row = per_key.agg(
        F.max(
            F.col("__n")
            / F.greatest(F.col("__span") / F.lit(float(tolerance)), F.lit(1.0))
        )
    ).first()
    out = float(row[0] or 0.0)
    if key is not None:
        _DENSITY_MEMO[key] = out
    return out


def asof_join_adaptive(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int,
    right_tiebreak: Sequence[str] = (),
    suffix: str = "_r",
    target_per_bucket: float = 4.0,
) -> DataFrame:
    """Backward as-of join, dense-right scale path (interval formulation).

    The rank-based :func:`asof_join` buckets time by the *tolerance*, so each
    left row is checked against every right row in its bucket — O(bars x
    snaps_per_tolerance) pairs, which explodes when the right side is much
    denser than the tolerance (measured: 20M rows, 1 h tolerance, ~19k
    snapshots/bucket on the hot key -> the join dominated the whole job).

    Interval formulation instead: each right row owns the half-open interval
    ``[ts, min(next_ts, ts+tol))`` (``next_ts`` = lead per key). A left row's
    as-of match is the UNIQUE interval containing its timestamp — an interval
    join with at most one match, no rank dedupe. That decouples the bucket
    width from the tolerance: buckets only need to cover intervals, whose
    length is ~the per-key arrival gap. Width is chosen PER KEY from the
    observed rate (count/span, broadcast-joined to both sides), so a hot key
    gets narrow buckets and a sparse key wide ones — explode factor and
    probe cost stay O(target_per_bucket) for every key simultaneously.
    """
    on = list(on)
    payload = [c for c in right.columns if c not in on]
    r = right
    for c in payload:
        r = r.withColumnRenamed(c, c + suffix)
    r_ts = right_ts + suffix

    # per-key bucket width from the observed right-side rate (tiny agg,
    # broadcast): width ~ target_per_bucket * avg gap, clamped to [1, tol]
    stats = (
        r.groupBy(*on)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            (F.max(r_ts) - F.min(r_ts)).alias("__span"),
        )
        .withColumn(
            "__w",
            F.greatest(
                F.least(
                    (F.col("__span") / F.col("__n") * target_per_bucket).cast("bigint"),
                    F.lit(tolerance),
                ),
                F.lit(1),
            ),
        )
        .select(*on, "__w")
    )
    # MATERIALIZED (r15, guide §2.3): stats is referenced THREE times (the
    # left-side bucket assignment, the main interval build, and — through
    # r's lineage — block_firsts' aggregate). Spark shares no subtrees, so
    # the un-materialized form aggregated the ENTIRE right side three times
    # (q29 plan: three Scan+HashAggregate+Exchange pipelines over events,
    # scans (11)/(23)/(38) in plans/r15/q29_asof_adaptive_before.txt). The
    # table itself is tiny (one row per key), so the checkpoint is
    # broadcast-cheap; deployment-aware strategy per materialize.py.
    from ..materialize import materialize

    stats = materialize(stats)

    # lead(ts) per key — computed BLOCKED: a plain per-key lead window would
    # serialize a hot key through one task (the same skew the blocked cumsum
    # avoids). Within a (key, time-block) the lead is local; the last row of
    # each block takes the next non-empty block's first ts from a tiny
    # per-(key, block) aggregate.
    lead_span = tolerance * 16
    # block_firsts from the PRE-stats-join right side (r15): __lblk depends
    # only on the constant lead_span, and the broadcast stats join never
    # drops rows (stats aggregates r itself, so every key matches) — so the
    # old post-join formulation only added a redundant third stats
    # aggregation pass + broadcast under this subtree. NULL-key rows group
    # here but never match the main join below — identical output either
    # way (the old inner join dropped them up front).
    rblk = r.withColumn("__lblk", F.expr(f"{r_ts} div {lead_span}"))
    order = [F.col(r_ts)] + [F.col(c + suffix) for c in right_tiebreak]
    w_local = Window.partitionBy(*on, "__lblk").orderBy(*order)
    w_blocks = Window.partitionBy(*on).orderBy("__lblk")
    block_firsts = (
        rblk.groupBy(*on, "__lblk")
        .agg(F.min(r_ts).alias("__first"))
        .withColumn("__next_first", F.lead("__first").over(w_blocks))
        .select(*on, "__lblk", "__next_first")
    )
    r = rblk.join(F.broadcast(stats), on)
    r = (
        r.withColumn("__next_local", F.lead(r_ts).over(w_local))
        .join(F.broadcast(block_firsts), [*on, "__lblk"])
        .withColumn("__next", F.coalesce(F.col("__next_local"), F.col("__next_first")))
        .withColumn(
            "__end",
            F.least(
                F.coalesce(F.col("__next"), F.col(r_ts) + tolerance + 1),
                F.col(r_ts) + tolerance + 1,
            ),
        )
        .drop("__lblk", "__next_local", "__next_first")
        # empty intervals (same-ts duplicates superseded by the tiebreak
        # winner) can never contain a left timestamp — drop before exploding,
        # also keeps the bucket sequence ascending
        .filter(F.col("__end") > F.col(r_ts))
        # interval [ts, end) covers buckets ts div w .. (end-1) div w
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.expr(f"{r_ts} div __w"), F.expr(f"(__end - 1) div __w")
                )
            ),
        )
    )
    lb = left.join(F.broadcast(stats), on, "left").withColumn(
        "__bucket", F.expr(f"{left_ts} div __w")
    )

    cond = F.col("__l.__bucket") == F.col("__r.__bucket")
    for k in on:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    cond = (
        cond
        & (F.col(f"__r.{r_ts}") <= F.col(f"__l.{left_ts}"))
        & (F.col(f"__l.{left_ts}") < F.col("__r.__end"))
    )
    joined = lb.alias("__l").join(r.alias("__r"), cond, "left")
    return joined.select(
        *[F.col(f"__l.{c}") for c in left.columns],
        *[F.col(f"__r.{c}{suffix}").alias(c + suffix) for c in payload],
    )


def merge_asof_grouped(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance: int,
    suffix: str = "_r",
) -> DataFrame:
    """Alternative as-of via per-key ``pd.merge_asof`` (Arrow-batched).

    Groups both sides by key and runs a sorted merge per group — O(n+m) per
    key vs the rank-join's O(n log n); preferable when the right side is much
    denser than tolerance buckets. Requires each key's data to fit in one
    executor's memory (use the bucketed ``asof_join`` otherwise).
    """
    on = list(on)
    payload = [c for c in right.columns if c not in on]
    l_tag = left.withColumn("__side", F.lit(0))
    r_tag = right.select(
        *on, *[F.col(c).alias(c + suffix) for c in payload]
    ).withColumn("__side", F.lit(1))
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields)
        + ", "
        + ", ".join(
            f"`{f.name}{suffix}` {f.dataType.simpleString()}"
            for f in right.schema.fields
            if f.name not in on
        )
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    lcols = list(left.columns)
    rcols = [c + suffix for c in payload]
    r_ts_s = right_ts + suffix

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lf = pdf[pdf["__side"] == 0][lcols].sort_values(left_ts)
        rf = pdf[pdf["__side"] == 1][rcols].sort_values(r_ts_s)
        if lf.empty:
            return pd.DataFrame(columns=lcols + rcols)
        merged = pd.merge_asof(
            lf,
            rf,
            left_on=left_ts,
            right_on=r_ts_s,
            direction="backward",
            tolerance=tolerance,
        )
        return merged[lcols + rcols]

    return unioned.groupBy(*on).applyInPandas(merge, schema=out_schema)
