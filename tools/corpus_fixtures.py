"""Synthetic corpus fixtures shared by the scale rungs.

The driver's documents table has a tiny TOPICAL vocabulary: every doc draws
from the same few hundred words, so its "rare" terms score barely above its
stop words and stop-word-shaped behavior (max-score pruning wins, posting
list skew, stop-term-dominated shingles) is invisible on it. Real corpora
are Zipfian — universal stop words, a mid-frequency body, genuinely rare
terms — and two operator families behave differently on that shape:

- retrieval: max-score's champion-list pruning only prunes when the rare
  term's impact bound dwarfs the stop terms' (tools/scale_retrieval_run.py
  measured the win appearing exactly when the corpus turned Zipf);
- dedup/fingerprinting: shingle frequencies become heavy-tailed, so LSH
  band buckets skew (hot stop-word shingles) instead of staying uniform.

``zipf_docs`` generates that shape deterministically (xxhash64-derived, no
fixture files): 6 universal stop words in every doc, ``mid_words`` draws
from a ``mid_vocab``-word body (collision-heavy, Zipf-ish via hash reuse),
and 2 rare tokens (~``docs/rare_mod`` docs each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zipf_docs(
    spark: SparkSession,
    n_docs: int,
    mid_vocab: int = 2000,
    mid_words: int = 20,
    rare_mod: int = 20_000,
    partitions: int = 32,
) -> DataFrame:
    """Deterministic Zipf-shaped corpus: ``(doc_id, text)``; materialized
    (localCheckpoint) so rung timings exclude generation."""
    mid = F.transform(
        F.sequence(F.lit(1), F.lit(mid_words)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id") * 37 + i), F.lit(mid_vocab))
        ),
    )
    rare = F.array(
        F.concat(F.lit("r"), (F.col("doc_id") % rare_mod)),
        F.concat(F.lit("r"), F.pmod(F.col("doc_id") + 7, F.lit(rare_mod))),
    )
    docs = (
        spark.range(n_docs)
        .withColumnRenamed("id", "doc_id")
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.lit("the of and to in a"),
                F.concat_ws(" ", mid),
                F.concat_ws(" ", rare),
            ).alias("text"),
        )
        .repartition(partitions)
        .localCheckpoint()
    )
    docs.count()
    return docs
