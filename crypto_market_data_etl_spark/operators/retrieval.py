"""Lexical retrieval over training corpora (extension surface).

BM25 top-k search — the lexical complement of the embedding ANN stack
(``operators.similarity``): dedup/contamination audits and "find the docs
that look like this eval prompt" checks need exact-term relevance ranking,
not just vector neighbors. Not in the reference (its `spark_src/` is market
ETL only); built Spark-first as inverted-index joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Okapi BM25 top-``k`` documents per query: (q_id, doc_id, rnk, score).

    Uses the Lucene idf variant ``ln((N - df + 0.5)/(df + 0.5) + 1)``
    (always positive) and sums over DISTINCT query terms.

    Shape at 100 TB: the corpus reduces once to postings (doc, term, tf) and
    doc lengths — one explode + two map-side-combined aggregations, exactly
    an inverted index build. Per-corpus stats (N, avgdl) stay in-plan as a
    1-row broadcast. The query side is small by contract (a query set, not
    a second corpus): its term list joins document-frequency + stats first,
    so the big postings table joins ONE broadcast (query-term, idf) dim —
    map-side, no postings shuffle before the per-(query, doc) sum. Scores
    round to 6dp BEFORE ranking so rank order is a pure function of the
    rounded value + doc id (cross-engine deterministic); the final rank
    window partitions per query over only that query's candidate docs.

    ``max_df_frac`` is the scale lever for stop-word-dominated queries: a
    query term matching more than that fraction of all documents joins
    (and scores) nearly the whole corpus while its idf contributes almost
    nothing — pruning it bounds the scored-candidate set the way Lucene's
    stop filter / max-score pruning does. ``None`` (default) scores every
    term exactly.
    """
    from ..materialize import materialize

    # NOTE (r15, measured): spread_small_input(docs) before the postings
    # build was prototyped and REVERTED — interleaved 3-rep A/B at sf0.1
    # showed 1.22x SLOWER (x37) / 1.05x (x47): the round-robin exchange of
    # the full text column costs more than the single-task explode it
    # parallelizes, because the postings groupBy right after it already
    # redistributes the exploded rows. Do not re-try.
    base = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    # drop empty-string tokens (double/leading/trailing spaces, empty docs):
    # they would otherwise become real postings — an empty document could
    # rank in top-k and every '' inflates dl/avgdl/df
    toks = base.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).filter(F.col("t") != "")
    # the inverted index is built ONCE (materialized — Spark shares no
    # subtrees, and postings feeds doc lengths, document frequencies, AND
    # the scoring join); doc length = sum of term frequencies, so no second
    # corpus pass exists anywhere in the plan
    postings = materialize(
        toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    )
    doclen = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = postings.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    qt = queries.select(
        F.col(q_id_col),
        F.explode(F.array_distinct(F.split(F.col(q_text_col), " "))).alias("t"),
    ).filter(F.col("t") != "")
    qidf = qt.join(dfreq, "t").crossJoin(F.broadcast(stats))
    if max_df_frac is not None:
        qidf = qidf.filter(
            F.col("df") <= F.lit(max_df_frac) * F.col("n_docs")
        )
    qidf = (
        qidf
        .select(
            q_id_col,
            "t",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
            ).alias("idf"),
            "avgdl",
        )
    )
    contrib = (
        F.col("idf")
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    # JOIN ORDER (r15, guide §2.3/§3): the broadcast (query-term, idf) dim
    # joins FIRST — a map-side filter that drops every posting whose term no
    # query mentions — and only the surviving candidate postings join doc
    # lengths. The old order (postings ⋈ doclen ⋈ broadcast(qidf)) shuffled
    # the ENTIRE postings table by doc_id before the broadcast filter ran
    # (plan: Exchange + SortMergeJoin ahead of the BroadcastHashJoin —
    # Catalyst does not commute inner joins without CBO), which is exactly
    # the corpus-scale shuffle the docstring promises never happens. Inner
    # joins commute; scores are bit-identical.
    scored = (
        postings.join(F.broadcast(qidf), "t")
        .join(doclen, id_col)
        .groupBy(q_id_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(q_id_col, id_col, "rnk", "score")
    )

def bm25_topk_maxscore(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    q_id_col: str = "q_id",
    q_text_col: str = "q_text",
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """:func:`bm25_topk` with EXACT max-score candidate pruning — identical
    output (same scores, same ranks, same ties), fewer scored (query, doc)
    pairs when queries mix rare and stop-word-frequent terms.

    The batch adaptation of the WAND/max-score family (Turtle & Flood's
    max-score; Lucene's per-term impact bounds), reshaped for joins instead
    of posting cursors:

    1. **Index-time term bounds.** Per term, the maximum single-posting
       contribution ``ub_t = idf_t * (k1+1) * max_tfn_t`` (``max_tfn`` from
       one extra agg over the materialized postings — what Lucene stores as
       per-term impacts).
    2. **Champion threshold.** Per query, score ONLY the postings of its
       highest-``ub`` term; the k-th best single-term contribution is a
       LOWER bound ``theta_q`` of the true k-th full score (every full
       score >= its own single-term part).
    3. **Essential terms.** Sort each query's terms by ``ub`` ascending;
       the maximal prefix with cumulative ``ub < theta_q`` is
       NON-essential: a doc matching only those terms has full score
       <= that cumulative bound < theta_q <= true k-th — provably outside
       top-k. Stop-word-frequent terms have tiny idf, hence tiny ``ub``,
       hence land non-essential: their fat postings lists never generate
       candidates.
    4. **Prune + exact rescore.** Candidates = distinct (query, doc) pairs
       from essential-term postings only; the full scoring join (ALL query
       terms, so final scores are exact) is semi-joined to candidates
       before the per-(query, doc) aggregation.

    Queries with fewer than ``k`` champion matches get ``theta = -inf``
    (every term essential — degenerates to the exact form). Scale: at most
    one extra narrow agg over postings + a bounded champion pass; the win
    is that the corpus-sized scoring join drops the (stop-word term x
    whole corpus) candidate blow-up that ``max_df_frac`` could only
    approximate by CHANGING results — this tier changes nothing.
    """
    from ..materialize import materialize

    base = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    toks = base.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).filter(F.col("t") != "")
    postings = materialize(
        toks.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("tf"))
    )
    doclen = materialize(postings.groupBy(id_col).agg(F.sum("tf").alias("dl")))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    # postings with dl attached feed term bounds, champions AND final
    # scoring — one materialized table
    pdl = materialize(postings.join(doclen, id_col))
    tfn = F.col("tf") / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    dfreq_bounds = (
        pdl.crossJoin(F.broadcast(stats))
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.max(tfn).alias("max_tfn"),
            F.first("n_docs").alias("n_docs"),
            F.first("avgdl").alias("avgdl"),
        )
    )
    qt = queries.select(
        F.col(q_id_col),
        F.explode(F.array_distinct(F.split(F.col(q_text_col), " "))).alias("t"),
    ).filter(F.col("t") != "")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    qidf = materialize(
        qt.join(dfreq_bounds, "t").select(
            q_id_col,
            "t",
            idf.alias("idf"),
            "avgdl",
            (idf * F.lit(k1 + 1.0) * F.col("max_tfn")).alias("ub"),
        )
    )

    contrib = (
        F.col("idf")
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    # 2. champion term (highest ub) per query -> theta_q = k-th best
    # single-term contribution (a lower bound of the k-th full score)
    w_ub = Window.partitionBy(q_id_col).orderBy(F.col("ub").desc(), F.col("t"))
    champ = qidf.withColumn("__r", F.row_number().over(w_ub)).filter(
        F.col("__r") == 1
    ).drop("__r")
    w_ch = Window.partitionBy(q_id_col).orderBy(
        F.col("__c").desc(), F.col(id_col)
    )
    theta = (
        pdl.join(F.broadcast(champ), "t")
        .select(q_id_col, F.col(id_col), contrib.alias("__c"))
        .withColumn("__r", F.row_number().over(w_ch))
        .filter(F.col("__r") == F.lit(k))
        .select(q_id_col, F.col("__c").alias("theta"))
    )
    # 3. essential terms: cumulative ub (ascending) within rounding slack of
    # theta. The 1e-6 slack covers the 6dp score rounding applied before
    # ranking: a pruned doc's unrounded score sits > 1e-6 below the k-th
    # champion bound, so it cannot ROUND into a tie with the true k-th and
    # steal its place via the id tie-break
    w_cum = Window.partitionBy(q_id_col).orderBy(F.col("ub"), F.col("t")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ess = (
        qidf.join(F.broadcast(theta), q_id_col, "left")
        .withColumn("__cum", F.sum("ub").over(w_cum))
        .filter(
            F.col("theta").isNull()
            | (F.col("__cum") >= F.col("theta") - F.lit(1e-6))
        )
        .select(q_id_col, "t")
    )
    # 4. candidates from essential postings only; exact rescore over ALL
    # terms. ORDER MATTERS: the postings table is first semi-joined to the
    # candidate DOC set, so the (stop-word term x whole corpus) pairs are
    # never generated — a post-join filter would still build them before
    # discarding (measured 1.5x SLOWER than exact at 200k docs in that
    # shape). The (query, doc) semi-join then scopes per-query candidates.
    # AQE picks both join strategies; forced broadcasts would blow up in
    # the degenerate all-essential case.
    cand = materialize(
        pdl.join(F.broadcast(ess), "t")
        .select(q_id_col, id_col)
        .distinct()
    )
    cand_docs = cand.select(id_col).distinct()
    scored = (
        pdl.join(cand_docs, id_col, "left_semi")
        .join(F.broadcast(qidf.select(q_id_col, "t", "idf", "avgdl")), "t")
        .join(cand, [q_id_col, id_col], "left_semi")
        .groupBy(q_id_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(q_id_col, id_col, "rnk", "score")
    )
