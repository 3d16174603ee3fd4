"""Deterministic sampling for training-data pipelines.

``df.sample()`` is seed-stable only per partitioning — repartition the input
and the sample changes, which makes experiment reruns irreproducible and is
useless as an oracle-gated operator. These samplers decide membership from a
**content hash of the row id**, so the sample is a pure function of the data:
stable across partitionings, engines, and reruns, and any engine (the DuckDB
oracle included) computes the identical sample.

Mechanics: md5 produces lowercase hex uniform over [0, 16^32); a row is kept
iff the first 8 hex chars compare lexicographically below the rate's
threshold (``format(int(rate * 16**8), '08x')``). Hex-string comparison is
byte-identical across engines; granularity is 1/2^32. A ``salt`` decorrelates
independent samples over the same ids.

Scale: membership is a map-only projection — no shuffle, pipelines into the
scan. Per-stratum rates come in via a broadcast-joined rates dim (never a
driver-side collect of the fact table); an unmatched stratum keeps rate 0 —
explicit-allowlist semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_threshold(rate: float) -> str:
    """Keep-threshold string for a sampling rate in [0, 1]: an 8-hex-char
    digest prefix is kept iff it sorts strictly below the threshold. Rate 1.0
    returns ``"g"`` — lexicographically above every hex digest (keep all) —
    because ``16**8`` itself needs 9 digits and would break the 8-char
    string comparison."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    n = int(rate * 16**8)
    return "g" if n >= 16**8 else format(n, "08x")


def _keep(id_col: str, thr_col, salt: str):
    digest = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return F.substring(digest, 1, 8) < thr_col


def hash_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Uniform deterministic sample: keep ~``rate`` of rows by id hash."""
    return df.filter(_keep(id_col, F.lit(rate_threshold(rate)), salt))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sample (training-mix construction: 'keep
    90% of wiki, 10% of crawl').

    ``rates`` maps stratum value -> keep rate; strata absent from the map are
    dropped. The rates dim is broadcast-joined (inner), so the filter stays
    map-side with no shuffle of the fact table.
    """
    spark = SparkSession.getActiveSession() or df.sparkSession
    dim = spark.createDataFrame(
        [(k, rate_threshold(v)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, __thr string",
    )
    return (
        df.join(F.broadcast(dim), stratum_col)
        .filter(_keep(id_col, F.col("__thr"), salt))
        .drop("__thr")
    )


def pack_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_tokens: int = 1_000,
    block_span: int | str | None = None,
) -> DataFrame:
    """Pack documents into fixed-token-budget training shards: running
    whitespace-token cumsum in deterministic ``id_col`` order, shard id =
    ``(cum - 1) div budget`` (the doc that crosses the budget closes its
    shard — same boundary rule as the dollar-bar operator it reuses).

    Output: ``(id, n_tok, cum_tok, shard)``. Downstream writers
    ``repartition(shard).write.partitionBy(shard)`` to lay the corpus out as
    equal-token shards for data loaders.

    A global ordered cumsum is one task's critical path on a naive window;
    ``block_span`` (an ``id_col`` range width) switches to the keyless form
    of :func:`..bars.blocked_cumsum` — block-local prefix sums in parallel
    plus a tiny per-block offset table — which is the only shape that holds
    at corpus scale. Exact either way (integer addition), so both plans gate
    against the same oracle.
    """
    from .bars import blocked_cumsum

    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tok"),
    )
    cum = blocked_cumsum(
        toks, [], id_col, "n_tok", out="cum_tok", block_span=block_span
    )
    return cum.withColumn(
        "shard", F.expr(f"(cum_tok - 1) div {int(shard_tokens)}")
    )


def domain_mixture_rates(
    df: DataFrame, domain_col: str = "lang", alpha: float = 0.5
) -> DataFrame:
    """Temperature-flattened mixture rates per domain (the multilingual-LM
    alpha-sampling rule: target share ∝ n_d^alpha, realized by subsampling
    only — no upsampling, so every rate is a valid keep probability).

    Solving ``q_d ∝ n_d^alpha`` under "keep the biggest corpus the rates
    allow" gives the closed form ``rate_d = (min_e n_e / n_d)^(1-alpha)``:
    the smallest domain is kept whole, larger domains are downsampled toward
    it. ``alpha=1`` keeps everything (no flattening); ``alpha=0`` equalizes
    all domains to the smallest.

    Output: ``(domain_col, n_docs, rate)`` — one row per domain, rates
    rounded to 6dp (engine-stable). One groupBy over the corpus; the result
    is a broadcast-sized dim.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    from ..materialize import materialize

    # MATERIALIZED: counts feeds both the min() aggregate and the crossJoin
    # side — unmaterialized, the corpus groupBy would run twice per call
    counts = materialize(
        df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    )
    m = counts.agg(F.min("n_docs").alias("__mn"))
    return counts.crossJoin(F.broadcast(m)).select(
        domain_col,
        "n_docs",
        F.round(
            F.pow(F.col("__mn") / F.col("n_docs"), F.lit(1.0 - alpha)), 6
        ).alias("rate"),
    )


def domain_mixture_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "lang",
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature resampling of a multi-domain corpus: keep
    each doc with its domain's :func:`domain_mixture_rates` rate, decided by
    the same content-hash threshold as :func:`hash_sample` (stable across
    partitionings, engines, reruns).

    The data-dependent rates become in-plan hex thresholds
    (``lower(hex(floor(rate·16^8)))`` — byte-identical to what
    ``rate_threshold`` computes for literal rates), broadcast-joined on the
    domain, so the membership filter is map-side over the corpus: the only
    shuffle is the tiny counts agg inside the rates dim.

    Output: kept rows as ``(id_col, domain_col, rate)``.
    """
    rates = domain_mixture_rates(df, domain_col, alpha)
    thr = F.when(F.col("rate") >= 1.0, F.lit("g")).otherwise(
        F.lpad(
            F.lower(F.hex(F.floor(F.col("rate") * F.lit(float(16**8))))),
            8,
            "0",
        )
    )
    dim = F.broadcast(rates.select(domain_col, "rate", thr.alias("__thr")))
    return (
        df.join(dim, domain_col)
        .filter(_keep(id_col, F.col("__thr"), salt))
        .select(id_col, domain_col, "rate")
    )


#: Namespace prefix for split-assignment digests. Membership sampling
#: (:func:`hash_sample`, :func:`domain_mixture_sample`) hashes
#: ``md5(salt || id)``; a split digest over the SAME ids and salt must not
#: reuse that value — for singleton clusters anchor == id, and an
#: un-namespaced split digest is then byte-identical to the membership
#: digest, so every mixture-kept singleton in a downsampled domain would
#: satisfy ``digest < rate_thr <= train_thr`` and land in the first split
#: (val/test starved). The prefix decorrelates the two hash families.
SPLIT_NS = "split|"


def split_expr(anchor_col, boundaries, labels, salt: str = ""):
    """Shared split-assignment expression (used by
    :func:`leakage_safe_splits` and ``curation.curate_corpus`` so the rule
    and its validation cannot drift): digest on ``SPLIT_NS``-namespaced
    anchor, ascending cumulative ``boundaries``, one more label than
    boundary."""
    if len(labels) != len(boundaries) + 1:
        raise ValueError("need len(labels) == len(boundaries) + 1")
    if list(boundaries) != sorted(boundaries):
        raise ValueError("boundaries must ascend")
    digest = F.substring(
        F.md5(F.concat(F.lit(salt + SPLIT_NS), anchor_col.cast("string"))), 1, 8
    )
    expr = None
    for b, lab in zip(boundaries, labels[:-1]):
        cond = digest < F.lit(rate_threshold(b))
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
    return expr.otherwise(labels[-1])


def leakage_safe_splits(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    boundaries: tuple[float, ...] = (0.8, 0.9),
    labels: tuple[str, ...] = ("train", "val", "test"),
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test assignment in which near-duplicate
    documents never straddle splits.

    Plain hash-splitting leaks: two near-identical docs hash independently,
    one lands in train and one in test, and the eval set is contaminated by
    construction. Here the split is decided by the duplicate CLUSTER's
    canonical id (connected components over ``pairs`` — any pair generator:
    MinHash, SimHash, embedding near-dup), so every member of a cluster
    moves together; docs in no pair anchor on their own id. Assignment is
    the same content-hash threshold as :func:`hash_sample` — a pure
    function of the data, stable across partitionings and engines.

    ``boundaries`` are ascending cumulative fractions; ``labels`` has one
    more entry. Output: ``(id, anchor, split)``.

    Scale: components over the PAIR list (edges ≪ corpus), one broadcast-
    free left join back on id, then a map-only hash projection.
    """
    from .clustering import connected_components

    cc = connected_components(pairs, "id_a", "id_b").withColumnRenamed(
        "node", id_col
    )
    anchored = df.select(id_col).join(cc, id_col, "left")
    anchor = F.coalesce(F.col("comp"), F.col(id_col))
    expr = split_expr(anchor, boundaries, labels, salt)
    return anchored.select(
        F.col(id_col), anchor.alias("anchor"), expr.alias("split")
    )


def dsir_logratios(
    df: DataFrame,
    target_filter,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    k_smooth: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weights (Data Selection via Importance
    Resampling, Xie et al. 2023): score every document by how much more
    likely its hashed-n-gram features are under the TARGET distribution
    (rows matching ``target_filter``, e.g. a trusted high-quality slice)
    than under the raw corpus. Downstream either resamples by the weight or
    keeps the top slice — the "make the crawl look like Wikipedia" selection
    step of published LLM data pipelines.

    Features are unigrams + word bigrams hashed into ``n_buckets`` buckets
    (md5 → 60-bit int → mod, engine-portable); both bag-of-buckets models
    get add-k smoothing:

        log_ratio(doc) = sum_f [ ln p_target(bkt(f)) - ln p_raw(bkt(f)) ]

    Shape at 100 TB: ONE corpus pass (r15 rewrite — the pre-r15 form
    re-exploded and re-hashed every feature a second time for the per-doc
    scoring pass). The explode + md5 bucketing runs once and reduces
    immediately to a per-(doc, bucket) HISTOGRAM (``groupBy(id, bkt)``
    count — map-side partials, output bounded by
    ``min(feats_per_doc, n_buckets)`` rows per doc), which is materialized
    (deployment-aware; orders of magnitude smaller than the raw feature
    stream). Bucket occupancies re-aggregate FROM the histogram; totals
    from summing that tiny table; the per-doc score is then
    ``sum(cnt * w)`` over the histogram joined to the ≤ ``n_buckets``-row
    BROADCAST weight table. ``sum(cnt * w)`` replaces the old per-feature
    ``sum(w)``: same value up to FP associativity (both engines already
    round to 6dp over an engine-ordered double sum — oracle-verified at
    all three SFs). The input is SPREAD (see ``dedup.spread_small_input``)
    — the r15 profile showed both old passes serializing through one task
    on the single-row-group bench input; no-op at production split counts.
    The token array is STAGED in its own projection before the bigram
    lambda references it (a raw ``split`` would be re-evaluated per gram —
    the CollapseProject pitfall measured in ``text.fingerprints``;
    un-staged this ran 6x slower at 20k docs). NULL text coalesces to ''
    (whole-corpus coverage; the empty doc still carries its one
    empty-string unigram). Output: (id, n_feats, log_ratio).
    """
    from .dedup import spread_small_input

    staged = spread_small_input(df).select(
        F.col(id_col),
        target_filter.alias("__is_target"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("__toks"),
    )
    tk = F.col("__toks")
    n2 = F.size(tk) - 1
    # sequence(1, 0) is DESCENDING in Spark — short docs short-circuit to []
    bigrams = F.when(n2 < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n2, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tk, i, 2)),
        )
    )
    fb = staged.select(
        F.col(id_col),
        "__is_target",
        F.explode(F.concat(tk, bigrams)).alias("f"),
    ).select(
        id_col,
        "__is_target",
        (
            F.conv(F.substring(F.md5(F.col("f")), 1, 15), 16, 10).cast("bigint")
            % n_buckets
        ).alias("bkt"),
    )
    # MATERIALIZED: the per-(doc, bucket) histogram is referenced twice
    # (bucket occupancies + per-doc scoring) and Spark does not share
    # subtrees — materializing HERE (instead of the old bucket-level counts)
    # is what removes the second corpus-scale explode+md5 pass entirely
    # (deployment-aware: localCheckpoint locally, persist on a cluster)
    from ..materialize import materialize

    hist = materialize(
        fb.groupBy(id_col, "__is_target", "bkt").agg(
            F.count(F.lit(1)).alias("__cnt")
        )
    )
    counts = hist.groupBy("bkt").agg(
        F.sum("__cnt").alias("c_raw"),
        F.sum(F.when(F.col("__is_target"), F.col("__cnt")).otherwise(0)).alias(
            "c_tgt"
        ),
    )
    totals = counts.agg(
        F.sum("c_raw").alias("tot_raw"), F.sum("c_tgt").alias("tot_tgt")
    )
    kb = F.lit(k_smooth) * F.lit(n_buckets)
    weights = counts.crossJoin(F.broadcast(totals)).select(
        "bkt",
        (
            F.log((F.col("c_tgt") + F.lit(k_smooth)) / (F.col("tot_tgt") + kb))
            - F.log((F.col("c_raw") + F.lit(k_smooth)) / (F.col("tot_raw") + kb))
        ).alias("w"),
    )
    # every feature bucket exists in counts by construction — inner join
    return (
        hist.join(F.broadcast(weights), "bkt")
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_feats"),
            F.round(F.sum(F.col("__cnt") * F.col("w")), 6).alias("log_ratio"),
        )
    )


def domain_quality_gate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "lang",
    keep_frac: float = 0.5,
) -> DataFrame:
    """Per-domain RELATIVE quality gate: keep the top ``keep_frac`` fraction
    of each domain ranked by the composite quality score (FineWeb-style
    selection). An absolute threshold drifts across domains — a punctuation
    ratio that is mid-pack for one language is an outlier for another; a
    relative gate adapts per domain with no tuning.

    Deterministic: rank = (quality desc NULLS LAST, id asc), cutoff =
    ``ceil(keep_frac * n_domain)``. Output: (id, domain, quality, rnk) for
    the kept rows. NULL domains form their own domain (rows with no
    language tag are still gated and kept at the same fraction) — the
    whole-corpus-coverage contract the sibling operators keep; the internal
    group/join key is null-safe (a (string-cast, is-null) composite, no
    sentinel value that could collide with a real domain).

    Shape at 100 TB: one projection pass for scores, per-domain counts via
    groupBy + broadcast join (never count-over-window — a hot domain would
    become one unsplittable window partition; see the x06 history), and a
    rank window per domain. The exact rank needs a per-domain sort; the
    scale relaxation is to pre-compute each domain's quality cutoff with
    ``percentile_approx`` and gate map-side — same selection up to
    boundary ties, no sort.
    """
    from pyspark.sql import Window

    from .text import quality_expr

    scored = df.select(
        F.col(id_col), F.col(domain_col), quality_expr(text_col).alias("quality")
    ).withColumn(
        # null-safe composite key: an inner equi-join on the raw domain
        # would silently drop NULL-domain rows (NULL never equals NULL)
        "__dom", F.coalesce(F.col(domain_col).cast("string"), F.lit(""))
    ).withColumn("__dom_null", F.col(domain_col).isNull())
    counts = scored.groupBy("__dom", "__dom_null").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w = Window.partitionBy("__dom", "__dom_null").orderBy(
        F.col("quality").desc_nulls_last(), F.col(id_col)
    )
    return (
        scored.join(F.broadcast(counts), ["__dom", "__dom_null"])
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= F.ceil(F.lit(keep_frac) * F.col("__n")))
        .select(id_col, domain_col, "quality", "rnk")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    block_span: int | str | None = None,
) -> DataFrame:
    """Fixed-length training-sequence packing: concatenate documents in
    ``id_col`` order and split the token stream every ``seq_len`` tokens —
    the causal-LM data-loader layout where documents CROSS sequence
    boundaries (what :func:`pack_shards` budgets at shard granularity, this
    resolves to exact per-sequence spans).

    One output row per (sequence, document) overlap:
    ``(seq_id, id, off_start, n_span)`` — read ``n_span`` tokens starting at
    token ``off_start`` of the document into sequence ``seq_id``. A document
    spanning k boundaries emits k+1 rows (fan-out bounded by
    ``n_tok/seq_len + 1``); the loader reassembles each sequence by
    ``(seq_id, id)`` order.

    Scale: the only global structure is the token cumsum, delegated to the
    keyless two-phase :func:`..bars.blocked_cumsum` (``block_span``) — the
    same skew-proof shape pack_shards uses; everything after is a bounded
    per-row explode. Exact integer arithmetic end to end.
    """
    from .bars import blocked_cumsum

    # NON-EMPTY token count: split('') is [''] and runs of spaces emit ''
    # tokens — counting those would hand the loader phantom spans (a 1-token
    # read from an empty document) and shift every later doc's offsets; the
    # token-array contract here must match bpe_encode's (0 tokens -> no
    # spans), since its arrays are what the spans index into
    toks = df.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                lambda t: t != "",
            )
        )
        .cast("long")
        .alias("n_tok"),
    )
    cum = blocked_cumsum(
        toks, [], id_col, "n_tok", out="cum_tok", block_span=block_span
    )
    start = F.col("cum_tok") - F.col("n_tok")  # global token span [start, cum)
    # `div` (not float `/` + floor): seq ids stay exact LONG arithmetic at
    # any cumulative token count — float64 division loses integer precision
    # past 2^53 tokens, silently diverging from the oracle's integer `//`
    # (both operands are non-negative here, so div == floor-division)
    first_seq = F.expr(f"(cum_tok - n_tok) div {int(seq_len)}")
    last_seq = F.expr(f"(cum_tok - 1) div {int(seq_len)}")
    # 0-token docs emit no span — and must not reach the explode: their
    # degenerate range can run DESCENDING (sequence(1, 0) is [1, 0])
    spans = cum.filter(F.col("n_tok") > 0).select(
        F.col(id_col),
        start.alias("__start"),
        F.col("cum_tok"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    span_start = F.greatest(F.col("__start"), F.col("seq_id") * seq_len)
    span_end = F.least(F.col("cum_tok"), (F.col("seq_id") + 1) * seq_len)
    return spans.select(
        F.col("seq_id").cast("long").alias("seq_id"),
        F.col(id_col),
        (span_start - F.col("__start")).cast("long").alias("off_start"),
        (span_end - span_start).cast("long").alias("n_span"),
    )
