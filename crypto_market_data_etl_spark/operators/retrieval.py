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
    scored = (
        postings.join(doclen, id_col)
        .join(F.broadcast(qidf), "t")
        .groupBy(q_id_col, id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.col("score").desc(), F.col(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(q_id_col, id_col, "rnk", "score")
    )
