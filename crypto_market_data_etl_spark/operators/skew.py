"""Skew guards for bucketed candidate-join operators (extension surface).

LSH-style candidate generation (minhash bands, sign-LSH buckets) is a
self-equi-join on the bucket key: a single degenerate bucket of *n* members
emits O(n²) candidate pairs. At 100 TB a near-duplicate-heavy corpus (boiler-
plate pages, empty/short docs hashing to one signature) turns that into a
quadratic stage on one shuffle partition. The guard: deterministically
truncate each bucket to its ``max_bucket_size`` smallest ids before the join
and LOG the dropped-member count — never a silent cap.

Truncation alone has a recall hole precisely in the degenerate case that
motivates it: EXACT duplicates produce the same signature in *every* band,
so each band's bucket truncates to the same smallest ids and members beyond
the cap lose all candidacy — no other band rescues them. (Bands do rescue
*near*-dups, whose signatures differ per band.) The fix is
:func:`cap_bucket_size_chained`: for every dropped member, emit one chain
pair linking it to the bucket's smallest id. That is O(dropped) extra pairs
— linear, not quadratic — and it preserves connected-component/dedup
correctness: every member of a capped bucket stays reachable from the
bucket's canonical (min-id) member. Pair-generating operators
(``lsh_candidate_pairs``, ``embedding_neardup_pairs``) route chain pairs
through the same exact-verification step as joined candidates, so claimed
similarities are never fabricated.
"""

from __future__ import annotations

import logging
import threading
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..materialize import checkpoint_nostats

logger = logging.getLogger(__name__)

#: Default per-bucket member cap. Far above anything the test corpora
#: produce (so oracle parity is unaffected) while bounding a degenerate
#: bucket's pair blow-up to cap² at production scale.
DEFAULT_MAX_BUCKET_SIZE = 10_000

#: How long the drop-count reporter keeps polling an unexecuted plan before
#: giving up (seconds). Generous for real actions; bounded for plans that
#: are built and discarded — the thread (and its Observation reference)
#: always exits by this deadline, so unexecuted plans cannot accumulate
#: parked threads for the life of the session.
_REPORT_TIMEOUT_S = 900.0


_reporter_warned = False


def _warn_reporter_unavailable() -> None:
    global _reporter_warned
    if not _reporter_warned:
        _reporter_warned = True
        logger.warning(
            "cap_bucket_size: Observation.getRowOrEmpty internal API "
            "unavailable on this PySpark build — dropped-membership counts "
            "will not be logged (still recorded as observed metrics)"
        )


def _watch_observation(
    obs,  # pyspark.sql.Observation
    max_bucket_size: int,
    log_fn: Callable[[str], None] | None,
) -> None:
    """Log the observed drop count once the first action over the plan
    completes — without parking a thread forever if it never runs.

    Polls the JVM ``getRowOrEmpty`` (a ≤100ms peek) with exponential
    backoff instead of blocking on ``Observation.get``, and gives up after
    ``_REPORT_TIMEOUT_S``. The thread must hold the only durable reference
    to the Observation (``DataFrame.observe`` registers it JVM-side but
    keeps no Python-side ref), so lifetime is bounded by the deadline, not
    by garbage collection. Even when the log window is missed, the count
    remains visible as an observed metric on the listener bus / Spark UI.
    """

    def _poll() -> None:
        deadline = time.monotonic() + _REPORT_TIMEOUT_S
        backoff = 0.02  # tight at first (actions usually follow the build
        while time.monotonic() < deadline:  # immediately), easing off to 1s
            try:
                row_opt = obs._jo.getRowOrEmpty()  # waits ≤100ms JVM-side
            except (AttributeError, TypeError):
                # `_jo`/`getRowOrEmpty` is a private accessor — absent or
                # renamed on another PySpark build. Say so ONCE instead of
                # silently voiding the drop-count logging guarantee; the
                # count stays visible as an observed metric on the listener
                # bus / Spark UI.
                _warn_reporter_unavailable()
                return
            except Exception:  # py4j gateway gone / session stopped — the
                return  # query is over, nothing left to report
            if row_opt.isDefined():
                got = obs.get  # now non-blocking
                if got["dropped"]:
                    (log_fn or logger.warning)(
                        f"cap_bucket_size: dropped {got['dropped']} membership(s) "
                        f"from buckets over {max_bucket_size} "
                        f"(max bucket seen {got['max_size']})"
                    )
                return
            time.sleep(backoff)
            backoff = min(backoff * 2, 1.0)

    threading.Thread(target=_poll, daemon=True).start()


def _with_rank(df: DataFrame, bucket_cols: Sequence[str], id_col: str) -> DataFrame:
    """Rank members within each bucket by id (deterministic), carrying the
    bucket's smallest id alongside. One window — the same key the candidate
    join shuffles on, so no extra shuffle."""
    w = Window.partitionBy(*[F.col(c) for c in bucket_cols]).orderBy(id_col)
    return df.withColumn("__bucket_rn", F.row_number().over(w)).withColumn(
        "__bucket_min", F.first(id_col).over(w)
    )


def ranked_pair_sides(
    df: DataFrame,
    bucket_cols: Sequence[str],
    id_col: str,
    max_bucket_size: int,
    log_dropped: bool = True,
    log_fn: Callable[[str], None] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The capped-and-chained candidate self-join as ONE join — no second
    traversal, no union, no materialization.

    Returns ``(a, b)``: the a-side keeps only in-cap members (plus their
    rank ``__rn_a``); the b-side keeps every member (rank ``__rn_b``).
    Joining them on the bucket key under :func:`capped_pair_condition`
    yields exactly the capped pair set PLUS the chain pairs — a dropped
    member (``__rn_b > cap``) pairs only with the bucket's min-id member
    (``__rn_a == 1``), O(dropped) extra rows. The rank window shuffles on
    the same key the join shuffles on, so the exchange is reused; relative
    to an uncapped self-join the guard costs one in-partition sort.
    """
    ranked = _with_rank(df, bucket_cols, id_col)
    if log_dropped:
        ranked = _observed(ranked, max_bucket_size, log_fn)
    a = ranked.filter(F.col("__bucket_rn") <= max_bucket_size).withColumnRenamed(
        "__bucket_rn", "__rn_a"
    )
    b = ranked.withColumnRenamed("__bucket_rn", "__rn_b")
    return a.drop("__bucket_min"), b.drop("__bucket_min")


def needs_cap(
    df: DataFrame,
    bucket_cols: Sequence[str],
    max_bucket_size: int,
    log_fn: Callable[[str], None] | None = None,
) -> bool:
    """Adaptive guard: does any bucket actually exceed the cap?

    One tiny scalar job — a map-side partial count per bucket, an 8-byte max
    — decided at plan-build time. The capped self-join costs an extra
    exchange+sort+window pair of stage boundaries; on healthy corpora (no
    bucket over the cap) that is pure overhead AND the capped join's output
    is identical to the plain one, so the plain plan is simply the better
    physical choice. Callers probing an expensive upstream should persist it
    (the pair operators persist their signature table) so the probe and the
    main action share the computation.
    """
    row = (
        df.groupBy(*[str(c) for c in bucket_cols])
        .agg(F.count(F.lit(1)).alias("__bucket_n"))
        .agg(F.max("__bucket_n"))
        .first()
    )
    max_n = row[0] or 0
    hot = max_n > max_bucket_size
    if hot:
        (log_fn or logger.warning)(
            f"needs_cap: hottest bucket has {max_n} members (cap "
            f"{max_bucket_size}) — engaging capped+chained candidate join"
        )
    return hot


def capped_pair_condition(id_a, id_b, max_bucket_size: int):
    """Join condition completing :func:`ranked_pair_sides`: ordinary
    ``id_a < id_b`` pairs while both sides are within the cap, min-id chain
    pairs for dropped members."""
    in_cap = (F.col("__rn_b") <= max_bucket_size) & (F.col(id_a) < F.col(id_b))
    chain = (F.col("__rn_b") > max_bucket_size) & (F.col("__rn_a") == 1)
    return in_cap | chain


def _observed(ranked: DataFrame, max_bucket_size: int, log_fn) -> DataFrame:
    from pyspark.sql import Observation

    obs = Observation()
    # the metric node sits ABOVE the rank but BELOW the filter, so it sees
    # every member while the query runs — one action, one pass. The count is
    # also visible as an observed metric on the listener bus / Spark UI even
    # when the log line is not watched.
    out = ranked.observe(
        obs,
        F.sum(
            F.when(F.col("__bucket_rn") > max_bucket_size, 1).otherwise(0)
        ).alias("dropped"),
        F.max("__bucket_rn").alias("max_size"),
    )
    _watch_observation(obs, max_bucket_size, log_fn)
    return out


def cap_bucket_size(
    df: DataFrame,
    bucket_cols: Sequence[str],
    id_col: str,
    max_bucket_size: int = DEFAULT_MAX_BUCKET_SIZE,
    log_dropped: bool = True,
    log_fn: Callable[[str], None] | None = None,
) -> DataFrame:
    """Keep at most *max_bucket_size* members per bucket (smallest *id_col*
    first — deterministic), accounting for how many members were dropped.

    Dropped members lose ALL candidacy through this bucket — for exact-dup
    classes that means through every bucket (see module docstring). Use
    :func:`cap_bucket_size_chained` when downstream consumers need
    connected-component/dedup completeness; plain truncation is the right
    call only for top-k ANN candidate lists, where a capped bucket costs
    recall, not correctness.
    """
    if max_bucket_size is None:
        return df
    ranked = _with_rank(df, bucket_cols, id_col)
    if log_dropped:
        ranked = _observed(ranked, max_bucket_size, log_fn)
    return (
        ranked.filter(F.col("__bucket_rn") <= max_bucket_size)
        .drop("__bucket_rn", "__bucket_min")
    )


def cap_bucket_size_chained(
    df: DataFrame,
    bucket_cols: Sequence[str],
    id_col: str,
    max_bucket_size: int = DEFAULT_MAX_BUCKET_SIZE,
    log_dropped: bool = True,
    log_fn: Callable[[str], None] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Cap buckets AND return the chain pairs that keep dropped members
    connected.

    Returns ``(kept, chains)``:

    - ``kept`` — as :func:`cap_bucket_size`.
    - ``chains`` — one ``(id_a, id_b)`` row per dropped membership, linking
      the bucket's smallest id (``id_a``) to the dropped member (``id_b``);
      ``id_a < id_b`` by construction (the min ranks first). Distinct across
      buckets. O(dropped) rows — restores candidacy for every truncated
      member at linear cost.

    Pair-generating operators should prefer :func:`ranked_pair_sides`,
    which folds cap + chains into their candidate self-join (one window,
    one join); this two-output form is for consumers that need the capped
    TABLE itself. The ranked plan is lazily materialized
    (``localCheckpoint(eager=False)``) because both outputs filter it —
    without that, each would recompute the expensive upstream.
    """
    if max_bucket_size is None:
        raise ValueError("cap_bucket_size_chained requires a finite cap")
    ranked = _with_rank(df, bucket_cols, id_col)
    if log_dropped:
        ranked = _observed(ranked, max_bucket_size, log_fn)
    ranked = checkpoint_nostats(ranked)
    kept = (
        ranked.filter(F.col("__bucket_rn") <= max_bucket_size)
        .drop("__bucket_rn", "__bucket_min")
    )
    chains = (
        ranked.filter(F.col("__bucket_rn") > max_bucket_size)
        .select(
            F.col("__bucket_min").alias("id_a"),
            F.col(id_col).alias("id_b"),
        )
        .distinct()
    )
    return kept, chains
