"""OHLCV candle / windowed-stat aggregations (SURVEY.md §2.4 A1-A8, §2.8 T2-T3).

The reference builds candles with order-sensitive ``first``/``last`` after a
pre-sort (``kafka_to_kafka_by_spark_for_druid.py:99-132``,
``processing_raw_data_from_gcs.py:110,122-141``). Order-dependent aggregates
are nondeterministic under shuffle, so we use ``min_by``/``max_by`` keyed on a
total order (timestamp + unique tiebreaker) — same semantics, deterministic on
any cluster (SURVEY §7.3 item 3).

Scale notes: one hash aggregation = one shuffle on the grouping keys; partial
aggregation (map-side combine) is automatic. Candle grouping keys
(window bucket, instrument) are high-cardinality and evenly spread, so no
salting is needed; AQE handles residual skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICROS_PER_SEC = 1_000_000


def order_key(ts_col: str, *tiebreak: str) -> Column:
    """Total-order key for deterministic first/last (struct compare)."""
    return F.struct(*[F.col(c) for c in (ts_col, *tiebreak)])


def ohlcv_aggs(
    price_col: str,
    ts_col: str,
    tiebreak: Sequence[str],
    volume_cents_col: str | None = None,
) -> list[Column]:
    """A1-A5 as deterministic aggregate expressions.

    open  = price at min order key   (A1 ``first`` intent)
    close = price at max order key   (A2 ``last`` intent)
    high/low = max/min price         (A3)
    volume sums as exact integer cents when ``volume_cents_col`` given (A4).
    """
    key = order_key(ts_col, *tiebreak)
    aggs = [
        F.min_by(F.col(price_col), key).alias("open"),
        F.max(F.col(price_col)).alias("high"),
        F.min(F.col(price_col)).alias("low"),
        F.max_by(F.col(price_col), key).alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
    ]
    if volume_cents_col is not None:
        aggs.append((F.sum(volume_cents_col) / F.lit(100.0)).alias("volume"))
    return aggs


def tumbling_candles(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    price_col: str,
    width_seconds: int,
    tiebreak: Sequence[str] = (),
    volume_cents_col: str | None = None,
) -> DataFrame:
    """T2: tumbling-window OHLCV candles, batch form.

    Uses ``F.window`` (same operator the streaming path uses —
    ``kafka_to_kafka_by_spark_for_druid.py:100,110``) and projects
    ``window.start`` so batch and oracle column shapes match.
    """
    w = F.window(F.col(ts_col), f"{width_seconds} seconds")
    return (
        df.groupBy(w.alias("w"), *key_cols)
        .agg(*ohlcv_aggs(price_col, ts_col, tiebreak, volume_cents_col))
        .withColumn("w_start", F.col("w.start"))
        .drop("w")
    )


def candle_partials(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_us_col: str,
    price_col: str,
    width_us: int,
    tiebreak: Sequence[str] = (),
    volume_cents_col: str | None = None,
) -> DataFrame:
    """Hypertable-style continuous-aggregate partials at ``width_us`` grain.

    Each partial carries a MERGEABLE state: (open@min-key, close@max-key,
    high, low, cents, n, min/max order keys). Coarser candles are computed by
    :func:`rollup_candles` from partials alone — the raw events are never
    re-scanned. This is the TimescaleDB continuous-aggregate / OLAP-cube
    pattern: at 100 TB you materialize minute partials once and serve
    hour/day/week queries from ~1/60000th of the data.
    """
    bucket = F.expr(f"{ts_us_col} div {width_us}")
    key = order_key(ts_us_col, *tiebreak)
    aggs = [
        F.min_by(F.col(price_col), key).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(F.col(price_col), key).alias("close"),
        F.count(F.lit(1)).alias("n_trades"),
        F.min(key).alias("first_key"),
        F.max(key).alias("last_key"),
    ]
    if volume_cents_col is not None:
        aggs.append(F.sum(volume_cents_col).alias("cents"))
    return df.groupBy(bucket.alias("bucket"), *key_cols).agg(*aggs)


def rollup_candles(
    partials: DataFrame,
    key_cols: Sequence[str],
    factor: int,
) -> DataFrame:
    """Merge fine-grained candle partials into candles ``factor`` x coarser.

    Pure partial-merge: open = open of the partial with the smallest
    first_key, close = close of the largest last_key, high/low/volume/count
    associative. Output matches computing the coarse candle from raw events
    (asserted in tests and by the q19 oracle).
    """
    coarse = F.expr(f"bucket div {factor}")
    return (
        partials.groupBy(coarse.alias("bucket"), *key_cols)
        .agg(
            F.min_by("open", F.col("first_key")).alias("open"),
            F.max("high").alias("high"),
            F.min("low").alias("low"),
            F.max_by("close", F.col("last_key")).alias("close"),
            F.sum("n_trades").alias("n_trades"),
            F.min("first_key").alias("first_key"),
            F.max("last_key").alias("last_key"),
            F.sum("cents").alias("cents"),
        )
    )


def salted_candle_partials(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_us_col: str,
    price_col: str,
    width_us: int,
    tiebreak: Sequence[str],
    volume_cents_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof candle aggregation for EXTREME hot keys.

    When one (window, key) group exceeds what a single reducer can hold
    (e.g. one instrument is 90% of all volume — a single 100 TB-scale key),
    plain hash aggregation funnels that group through one task. This salts
    the grouping key with ``hash(tiebreak) % n_salts``, aggregates mergeable
    candle partials per salted sub-key (n_salts-way parallel), then merges
    the sub-candles with the same partial-merge algebra :func:`rollup_candles`
    uses — open/close travel with their order keys, so the merged candle is
    exactly the unsalted result (asserted in tests and by the q21 oracle).

    Map-side combine already shrinks each partition to ~1 row per (window,
    key, salt), so the extra stage shuffles n_salts rows per group — the
    two-stage cost is O(n_salts) rows, not O(events). Output: same mergeable
    partial shape as :func:`candle_partials` (minus the salt).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in tiebreak]), F.lit(n_salts))
    partials = candle_partials(
        df.withColumn("__salt", salt),
        [*key_cols, "__salt"],
        ts_us_col,
        price_col,
        width_us,
        tiebreak,
        volume_cents_col,
    )
    return rollup_candles(partials, key_cols, 1)


def sliding_stats(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    width_seconds: int,
    slide_seconds: int,
    cents_col: str | None = None,
) -> DataFrame:
    """T3: sliding-window mean/stddev/count stats, batch form.

    Reference intent: ``kafka_upbit_realtime_processing.py:107-118`` —
    ``window(server_datetime, "10 minute", "15 second")`` + avg/stddev aggs.
    stddev is guarded to NULL for n==1 groups (Spark yields NaN, DuckDB NULL).
    With ``cents_col`` the mean is computed as exact-integer-sum / count —
    reproducible under any summation order (a float ``avg`` can land on a
    rounding boundary and differ from the oracle by 1 ulp).

    Scale note: an event lands in width/slide panes — state/shuffle amplifies
    by that factor (40x in the reference's 10min/15s case, SURVEY §7.3 item 1).
    Keep the ratio modest or pre-aggregate per slide-pane then roll up.
    """
    w = F.window(F.col(ts_col), f"{width_seconds} seconds", f"{slide_seconds} seconds")
    n = F.count(F.lit(1))
    # exact-rational mean left UNROUNDED: the double is bit-identical on any
    # engine, while round() implementations disagree on .5-at-6dp boundaries
    avg = (
        F.sum(cents_col) / 100.0 / n
        if cents_col is not None
        else F.round(F.avg(value_col), 6)
    )
    return (
        df.groupBy(w.alias("w"), *key_cols)
        .agg(
            n.alias("n_events"),
            avg.alias("avg_value"),
            F.when(n > 1, F.round(F.stddev_samp(value_col), 4)).alias("stddev_value"),
        )
        .withColumn("w_start", F.col("w.start"))
        .drop("w")
    )


# --------------------------------------------------------------------------
# Pane-decomposed sliding windows (SURVEY §7.3 item 1 — the 40x fix)
# --------------------------------------------------------------------------

def sliding_pane_partials(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    slide_seconds: int,
    cents_col: str,
) -> DataFrame:
    """Phase 1 of the pane decomposition: mergeable (n, Σc, Σc²) partials per
    TUMBLING pane of ``slide_seconds``.

    A direct sliding window (``sliding_stats``) replicates every EVENT into
    width/slide overlapping windows before the shuffle — 40x shuffle/state
    amplification at the reference's 10min/15s config
    (``kafka_upbit_realtime_processing.py:108``). Panes aggregate first
    (map-side combine collapses each partition to ~1 row per (pane, key)),
    so only the tiny partial rows are replicated.

    The partial is exact: cents are integers, so Σc and Σc² are
    order-independent bigints (bound: n·max_cents² < 2^63 per group — at a
    scale where that overflows, swap the two sums to DecimalType(38,0),
    still exact). Variance merges by summing the three components.
    """
    w = F.window(F.col(ts_col), f"{slide_seconds} seconds")
    c = F.col(cents_col)
    return df.groupBy(w.alias("w"), *key_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(c).alias("sum_c"),
        F.sum(c * c).alias("sumsq_c"),
    ).select(F.col("w.start").alias("pane_start"), *key_cols, "n_events", "sum_c", "sumsq_c")


def merged_pane_stats_aggs() -> list[Column]:
    """Final merge + closed-form stats over pane partials (shared by the
    batch and streaming pane paths so both emit bit-identical columns).

    stddev from exact integer sums: sqrt(max(Σc² − (Σc)²/n, 0)/(n−1))/100.
    Every input is an exact integer, so the double arithmetic is the same
    IEEE op sequence on any engine — the oracle mirrors the expression
    shape verbatim and hashes bit-equal (no round() needed, unlike the
    engine-native ``stddev_samp`` in :func:`sliding_stats`).
    """
    n = F.sum("n_events")
    sum_c = F.sum("sum_c")
    sumsq = F.sum("sumsq_c")
    sum_d = sum_c.cast("double")
    var_num = F.greatest(sumsq.cast("double") - sum_d * sum_d / n, F.lit(0.0))
    return [
        n.alias("n_events"),
        (sum_c / 100.0 / n).alias("avg_value"),
        F.when(n > 1, F.sqrt(var_num / (n - 1)) / 100.0).alias("stddev_value"),
    ]


def sliding_stats_paned(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    width_seconds: int,
    slide_seconds: int,
    cents_col: str,
) -> DataFrame:
    """T3 at scale: sliding mean/stddev via pane decomposition (two-level).

    panes = tumbling agg at slide grain → each pane row is exploded into the
    width/slide sliding windows containing it → merge partials. The explode
    amplifies (n_keys × n_panes) PARTIAL rows, not raw events — the classic
    panes optimization (Li et al., "No pane, no gain", SIGMOD Record 2005).

    Semantics match :func:`sliding_stats` exactly for n/avg (integer sums are
    associative) and to ~1 ulp for stddev (different but exact-input formula;
    oracle-gated bit-exact via the mirrored expression in q24).
    """
    if width_seconds % slide_seconds:
        raise ValueError("width_seconds must be a multiple of slide_seconds")
    n_panes = width_seconds // slide_seconds
    slide_us = slide_seconds * MICROS_PER_SEC
    panes = sliding_pane_partials(df, key_cols, ts_col, slide_seconds, cents_col)
    exploded = panes.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_panes - 1))).alias("j")
    ).withColumn(
        "w_start",
        # j is int32 (F.sequence); widen before the multiply — j*slide_us
        # overflows int32 for slides beyond ~35 min at j=39
        F.timestamp_micros(
            F.unix_micros("pane_start") - F.col("j").cast("bigint") * F.lit(slide_us)
        ),
    )
    return (
        exploded.groupBy("w_start", *key_cols)
        .agg(*merged_pane_stats_aggs())
        .select("w_start", *key_cols, "n_events", "avg_value", "stddev_value")
    )
