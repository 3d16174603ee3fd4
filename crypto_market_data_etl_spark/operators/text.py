"""Text-analysis operators for training-data pipelines (extension surface).

Language-ID scoring, quality scoring, token counting, and document
fingerprinting — all as built-in column expressions (regex/split/md5), no
Python in the hot path. Each is one narrow-shuffle aggregation or a pure
projection, so they compose with dedup/similarity at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Languages the hash-profile scorer can emit (sorted — ties break by order).
LANGS = ["de", "en", "es", "fr", "zh"]

#: Stopword list for quality scoring (domain vocabulary of the test corpus).
STOPWORDS = ["the", "a", "of", "and", "data", "value"]


def lang_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Language-ID via token-profile scoring.

    Real language ID scores tokens/char-n-grams against per-language profiles;
    here the profile membership test is hash-derived (token t belongs to lang
    L's profile iff md5(L|t) starts in '0'-'3' — a deterministic 1/4-density
    profile) so the oracle can replicate it exactly. The *plumbing* — explode
    tokens, score per (doc, lang), argmax with deterministic tie-break — is
    the operator; swap the profile test for real trained profiles in prod.

    Output: (id, pred_lang, best_score).
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    )
    scores = [
        F.sum(
            F.when(
                F.substring(F.md5(F.concat(F.lit(f"{lang}|"), F.col("tok"))), 1, 1).isin(
                    "0", "1", "2", "3"
                ),
                1,
            ).otherwise(0)
        ).alias(f"score_{lang}")
        for lang in LANGS
    ]
    per_doc = toks.groupBy(id_col).agg(*scores)
    # argmax with tie-break on lang order: pack (score, neg-rank) structs
    packed = F.array(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("score"),
                F.lit(-i).alias("nrank"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(LANGS)
        ]
    )
    best = F.array_max(packed)
    return per_doc.select(
        id_col,
        best.getField("lang").alias("pred_lang"),
        best.getField("score").alias("best_score"),
    )


def _quality_parts(text_col: str):
    """The shared quality expressions (pure projections — streaming-safe)."""
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = F.split(text, " ")
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,!?;:]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    stop_ratio = F.round(n_stop * 1.0 / n_tokens, 6)
    punct_ratio = F.round(n_punct * 1.0 / n_chars, 6)
    digit_ratio = F.round(n_digit * 1.0 / n_chars, 6)
    score = F.round(
        0.4 * stop_ratio + 0.3 * (1 - punct_ratio) + 0.3 * (1 - digit_ratio), 6
    )
    return n_chars, toks, n_tokens, stop_ratio, punct_ratio, digit_ratio, score


def quality_expr(text_col: str = "text"):
    """The composite quality score as ONE column expression — usable in any
    projection, including on a streaming DataFrame (same formula the x08
    oracle checks via :func:`quality_scores`)."""
    return _quality_parts(text_col)[-1]


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality metrics + composite score per document.

    n_tokens, avg token length, stopword ratio, punctuation ratio, digit
    ratio; score = 0.4*stopword + 0.3*(1-punct) + 0.3*(1-digit), rounded.
    """
    n_chars, toks, n_tokens, stop_ratio, punct_ratio, digit_ratio, score = (
        _quality_parts(text_col)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round((n_chars - n_tokens + 1) * 1.0 / n_tokens, 6).alias("avg_tok_len"),
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        score.alias("quality"),
    )


#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-alnum marks
#: (the GPT-2 pre-tokenizer shape, simplified to a regex both engines share).
#: NOTE a literal space, not \s: Spark SQL string literals consume the
#: backslash ('\s' -> 's'), silently changing the class.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_stats(df: DataFrame, group_col: str = "source", text_col: str = "text") -> DataFrame:
    """Corpus token statistics per group (source/shard/lang).

    Two token counts: whitespace tokens (split) and BPE-ish regex tokens
    (letter/digit/punct runs — the subword pre-tokenization granularity an
    LLM-data pipeline budgets by).
    """
    n_tokens = F.size(F.split(F.col(text_col), " "))
    n_bpe = F.size(F.expr(f"regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0)"))
    n = F.count(F.lit(1))
    return df.groupBy(group_col).agg(
        n.alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        (F.sum(n_tokens) / n).alias("avg_tokens"),  # exact int sum, unrounded
        F.sum(n_bpe).alias("total_bpe_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("total_chars"),
    )


def fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing-style document fingerprint — fully columnar, zero shuffle.

    Hash every word ``gram_n``-gram (rolling-hash analog via md5), take the
    min hash in every sliding window of ``window`` consecutive grams, and
    digest the sorted distinct window-minima. Near-identical documents share
    most window minima -> similar fingerprint sets; the single digest is the
    exact-match index key. Output: (id, n_minima, fingerprint).

    The whole computation is per-document, so it runs as array higher-order
    functions inside the row — no explode, no window shuffle (an earlier
    explode+Window formulation shuffled ~60 gram-rows per doc: 26.9 s for
    505k docs vs ~2 s columnar). Docs with fewer than ``window`` grams have
    no complete window and are omitted (mirrors the oracle's filter).

    IMPORTANT staging note: Spark column expressions are TREES, not DAGs,
    and staging a derived array in its own ``select`` does NOT protect it —
    CollapseProject inlines a single-reference projection straight into a
    HOF lambda body, where it is then re-evaluated on every lambda
    invocation (measured: the md5-gram array was recomputed per sliding
    window — 1.97 s for 5k docs vs 0.85 s fixed). The robust device is an
    expression-level LET: wrap the expensive array in a one-element array
    and bind it as a ``transform`` lambda variable — lambda arguments are
    evaluated exactly once per row and the optimizer cannot inline through
    them. ``inline`` at the end emits the result struct's fields without
    re-evaluating the chain per output column.
    """

    if gram_n < 1 or window < 1:
        raise ValueError(f"gram_n and window must be >= 1, got {gram_n}/{window}")

    def let(val, body):  # evaluate `val` once, use it via a lambda variable
        return F.element_at(F.transform(F.array(val), body), 1)

    toks = F.split(F.col(text_col), " ")

    def gram_hashes(tk):
        grams = F.transform(
            F.sequence(F.lit(1), F.size(tk) - (gram_n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tk, i, gram_n)),
        )
        return F.transform(grams, F.md5)

    def minima_of(h):
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(h) - (window - 1)),
                lambda j: F.array_min(F.slice(h, j, window)),
            )
        )

    result = let(
        toks,
        lambda tk: let(
            gram_hashes(tk),
            lambda h: let(
                minima_of(h),
                lambda m: F.struct(
                    F.size(m).alias("n_minima"),
                    F.md5(F.concat_ws("|", F.array_sort(m))).alias("fingerprint"),
                ),
            ),
        ),
    )
    # no floor on the gram count here: with window=1 a floored bound would
    # admit sub-gram_n docs whose gram sequence(1, n<=0) runs DESCENDING and
    # crashes F.slice with index 0 — the filter must reject them itself
    keep = (F.size(toks) - (gram_n - 1)) >= window
    # spread (r15, guide §2.5): the whole fingerprint is one zero-shuffle
    # projection, so on a low-split input (the sf fixtures are a single
    # parquet row group) ALL the md5/HOF compute serializes through one
    # task. No-op at production split counts (see spread_small_input).
    from .dedup import spread_small_input

    return spread_small_input(df.filter(keep)).select(
        F.col(id_col), F.inline(F.array(result))
    )


#: Default sensitive-term pattern for :func:`redact_terms`. Production swaps
#: in PII patterns (emails, phone numbers, ID numbers); the mechanics —
#: global regex replace + match counting, one projection, no shuffle — are
#: identical, and the test corpus actually contains these tokens.
SENSITIVE_PATTERN = r"\b(customer|query|value)\b"


def redact_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = SENSITIVE_PATTERN,
    replacement: str = "<REDACTED>",
) -> DataFrame:
    """Content scrubbing for training corpora: globally replace every match
    of ``pattern`` and count the hits per document.

    Pure projection (regexp_replace + regexp_extract_all, JVM regex) — zero
    shuffle, scales linearly; at 100 TB this is a map-only pass that
    pipelines into the scan. Output keeps the original columns plus
    ``redacted`` (scrubbed text) and ``n_redacted`` (match count) — callers
    that only need audit counts should drop ``redacted`` so parquet writers
    don't store both texts.
    """
    return df.withColumn(
        "redacted", F.regexp_replace(F.col(text_col), pattern, replacement)
    ).withColumn(
        "n_redacted",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)).cast("long"),
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus vocabulary: top-``k`` tokens by frequency, deterministic
    (count desc, token asc). Output: (token, cnt, rnk).

    Shape at 100 TB: explode + map-side-combined count (one shuffle on
    token), then ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject
    (per-partition top-k merged on the driver), NOT a global sort; the final
    rank is a window over just k rows.
    """
    tok = F.explode(F.split(F.col(text_col), " ")).alias("token")
    tokens = df.select(tok)
    if lowercase:
        tokens = tokens.select(F.lower(F.col("token")).alias("token"))
    counts = (
        tokens.filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    topk = counts.orderBy(F.col("cnt").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("long"))


def ngram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_smooth: float = 0.5,
) -> DataFrame:
    """Corpus-trained bigram-LM fluency scoring (the CCNet perplexity-filter
    shape: reference `spark_src/` has no text ops — extension surface).

    Trains add-k-smoothed bigram statistics on the corpus itself and scores
    every document by the mean negative log2-probability of its word
    bigrams: ``avg_nll`` = bits per bigram, the perplexity proxy CCNet
    buckets corpora into head/middle/tail by. Far above the corpus norm →
    gibberish/boilerplate; far below → templated repetition. Production
    swaps the self-trained count tables for a held-out LM's (e.g. trained
    on Wikipedia) — the scoring join is identical.

        P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k · V),   V = |vocabulary|

    Shape at 100 TB (r15 single-explode rewrite, guide §2.3): the gram
    stream is exploded ONCE and reduced immediately to a per-(doc, bigram)
    HISTOGRAM (``groupBy(id, s)`` count — map-side partials; output bounded
    by distinct bigrams per doc, never gram occurrences), which is
    materialized. Everything else derives from the histogram: the bigram
    count table ``c2`` re-aggregates it (vocabulary²-bounded), the history
    rollup ``c1`` re-aggregates ``c2``, and the scoring join carries one
    row per DISTINCT (doc, bigram) instead of one per occurrence — the
    per-doc mean becomes the count-weighted ``sum(cnt·nll)/sum(cnt)``
    (identical up to FP summation order; both engines already sum engine-
    ordered doubles and round to 6dp — oracle-verified at all three SFs).
    The pre-r15 form re-ran the corpus-scale explode TWICE (count pass +
    scoring pass — Spark shares no subtrees) and shuffled every gram
    occurrence into the scoring aggregation. The vocab scalar V stays
    in-plan as a broadcast cross join — no driver collect; its token
    explode is the one remaining second pass (single-token docs appear in
    no bigram, so V cannot be derived from the histogram). Docs with < 2
    tokens have no bigram and are omitted (oracle-mirrored).
    Output: (id, n_bigrams, avg_nll).
    """
    from .dedup import word_shingles

    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    grams = word_shingles(df, id_col, text_col, n=2, distinct=False)
    from ..materialize import materialize

    # MATERIALIZED: the histogram feeds the c2 rollup AND the scoring join —
    # Spark shares no subtrees, so an unmaterialized hist would replay the
    # corpus-scale explode once per reference
    hist = materialize(
        grams.groupBy(id_col, "s").agg(F.count(F.lit(1)).alias("__cnt"))
    )
    c2 = hist.groupBy("s").agg(F.sum("__cnt").alias("c2"))
    # history counts re-aggregate the DISTINCT-bigram table (vocabulary²-
    # bounded), not the corpus-scale gram stream — same value, one fewer
    # corpus pass: c(w1 ·) = sum over s of c(w1 w2)
    c1 = (
        c2.groupBy(F.substring_index(F.col("s"), " ", 1).alias("w1"))
        .agg(F.sum("c2").alias("c1"))
    )
    vocab = df.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).agg(F.countDistinct("w").alias("v"))
    nll = -F.log2(
        (F.col("c2") + F.lit(k_smooth))
        / (F.col("c1") + F.lit(k_smooth) * F.col("v"))
    )
    return (
        hist.withColumn("w1", F.substring_index(F.col("s"), " ", 1))
        .join(c2, "s")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_bigrams"),
            F.round(
                F.sum(F.col("__cnt") * nll) / F.sum("__cnt"), 6
            ).alias("avg_nll"),
        )
    )


def repetition_metrics(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition signals (the Gopher/MassiveText quality
    rules): per doc, the duplicate fraction of word 2-grams and 3-grams
    (``1 - distinct/total``) and the share of the single most frequent
    token. High values flag template/spam/keyword-stuffed pages that
    length/punctuation heuristics (:func:`quality_scores`) miss.

    Shape at 100 TB: explode + two-level map-side-combined aggregation per
    signal — linear in grams, shuffling one row per (doc, distinct gram).
    A per-row ``array_distinct`` formulation was tried and reverted: the
    JVM dedups arrays by pairwise comparison (quadratic per doc — measured
    7.6 s vs 1.5 s at sf0.1 on ~200-token docs), so "map-only" lost to the
    linear shuffle by 5x. Fractions round to 6dp (oracle-mirrored).
    """
    from .dedup import word_shingles

    # NULL text counts as the empty document, not a dropped/sentinel row:
    # legacy size(split(NULL)) is -1, the DuckDB oracle would yield NULL, and
    # chunk_dedup would drop the doc — three different answers. Coalescing
    # here (mirrored in the X29 oracle) keeps whole-corpus coverage like
    # contamination_report's contract.
    df = df.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))

    def dup_frac(n: int, out: str):
        g = word_shingles(df, id_col, text_col, n=n, distinct=False)
        return (
            g.groupBy(id_col, "s")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy(id_col)
            .agg(
                F.round(1 - F.count(F.lit(1)) / F.sum("c"), 6).alias(out)
            )
        )

    base = df.select(
        F.col(id_col),
        # bigint cast: oracle dtype parity (DuckDB len() is BIGINT)
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    tok_counts = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t"))
        .filter(F.col("t") != "")
        .groupBy(id_col, "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("tot_c"))
        .select(
            F.col(id_col),
            F.round(F.col("top_c") / F.col("tot_c"), 6).alias("top_token_frac"),
        )
    )
    return (
        base.join(dup_frac(2, "dup_2gram_frac"), id_col, "left")
        .join(dup_frac(3, "dup_3gram_frac"), id_col, "left")
        .join(tok_counts, id_col, "left")
        .na.fill(
            {"dup_2gram_frac": 0.0, "dup_3gram_frac": 0.0, "top_token_frac": 0.0}
        )
    )


#: The Gopher rule's "must contain >= 2 of these" stop set (MassiveText,
#: Rae et al. 2021 Appendix A).
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    stops: list[str] | None = None,
) -> DataFrame:
    """The Gopher/MassiveText document-level quality rules (Rae et al.
    2021, Appendix A) as one columnar projection: word-count bounds, mean
    word length bounds, symbol-to-word ratio (# and ...), bullet-start and
    ellipsis-end line fractions, alphabetic-word fraction, and the
    stop-word-presence test. Emits every signal plus the composite
    ``pass`` flag so callers can audit WHICH rule fired, not just that one
    did (the practical difference between tuning a filter and flying
    blind).

    Shape at 100 TB: pure map-side expressions — zero shuffle, pipelines
    into the scan like :func:`quality_scores` / :func:`redact_terms`.
    Ratios round to 6dp (oracle-mirrored).

    ``stops`` defaults to Gopher's English set (``GOPHER_STOPS``); it is a
    corpus parameter — a corpus whose vocabulary lacks the English
    function words (non-English data, this repo's synthetic tables) needs
    its own list or the presence rule rejects everything.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.split(text, " ")
    n_words = F.size(toks)
    mean_wl = F.round((F.length(text) - (n_words - 1)) * 1.0 / n_words, 6)
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ellipsis = F.size(F.split(text, r"\.\.\.")) - 1
    symbol_ratio = F.round((n_hash + n_ellipsis) * 1.0 / n_words, 6)
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda ln: ln.startswith("•") | ln.startswith("- "),
            )
        )
        * 1.0
        / n_lines,
        6,
    )
    ellipsis_frac = F.round(
        F.size(F.filter(lines, lambda ln: ln.endswith("..."))) * 1.0 / n_lines,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))) * 1.0 / n_words,
        6,
    )
    if stops is None:
        stops = GOPHER_STOPS
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stops]),
            lambda s: F.array_contains(toks, s),
        )
    ).cast("long")
    out = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ellipsis_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    passed = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    return out.withColumn("pass", passed)


def token_kl_divergence(
    df: DataFrame, group_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-group token-distribution drift: KL(P_group || P_corpus) over the
    unigram distributions — the monitoring signal a pipeline tracks per
    feed/shard/ingest batch to catch a source going off-distribution
    (spam floods, encoding breakage, template takeover) before it trains.

    KL = sum_t p_g(t) · ln(p_g(t) / p_c(t)); zero iff the group matches the
    corpus mix exactly, and always finite here because every group token is
    by construction part of the corpus distribution.

    Shape at 100 TB: ONE corpus-scale explode into a materialized
    (group, token) count table; the corpus distribution, group totals, and
    the final join all derive from that vocabulary-sized table — no second
    corpus pass. Output: (group, n_tokens, kl), kl rounded to 6dp.
    """
    from ..materialize import materialize

    toks = df.select(
        F.col(group_col),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("t"),
    ).filter(F.col("t") != "")
    # MATERIALIZED: feeds the corpus rollup, the group totals, AND the
    # final join — Spark shares no subtrees
    gcounts = materialize(
        toks.groupBy(group_col, "t").agg(F.count(F.lit(1)).alias("c_g"))
    )
    ccounts = gcounts.groupBy("t").agg(F.sum("c_g").alias("c_c"))
    gtotals = gcounts.groupBy(group_col).agg(F.sum("c_g").alias("n_g"))
    ctotal = ccounts.agg(F.sum("c_c").alias("n_c"))
    p_g = F.col("c_g") / F.col("n_g")
    p_c = F.col("c_c") / F.col("n_c")
    return (
        gcounts.join(ccounts, "t")
        .join(F.broadcast(gtotals), group_col)
        .crossJoin(F.broadcast(ctotal))
        .groupBy(group_col)
        .agg(
            F.max("n_g").cast("long").alias("n_tokens"),
            F.round(F.sum(p_g * F.log(p_g / p_c)), 6).alias("kl"),
        )
    )
