"""Benchmark-contamination detection for training corpora.

Before training on a crawled corpus you must know which documents leak the
evaluation benchmarks (the n-gram-overlap decontamination step of public LLM
data pipelines — e.g. the 13-gram filters described in the GPT-3 and PaLM
papers). Not in the reference; built Spark-first:

- Both sides reduce to **distinct word n-grams per doc**
  (``dedup.word_shingles`` — staged token arrays, no quadratic re-tokenize).
- The benchmark side collapses to a distinct gram set. Benchmarks are small
  (thousands of docs) while the corpus is the 100 TB side, so the gram set is
  **broadcast** — the contamination scan is then a map-side semi-join that
  pipelines into the corpus scan: zero shuffle of the big side before the
  per-doc count.
- Output per corpus doc: total grams, contaminated grams, contamination
  fraction — thresholding/quarantine is the caller's policy.

If the benchmark side ever outgrows broadcast size, drop ``broadcast_bench``
to fall back to a shuffled hash join on the gram hash — same semantics, one
extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def contamination_report(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per-corpus-doc benchmark overlap: ``(id, n_grams, n_hit, frac_hit)``.

    A doc with ``frac_hit`` near 1 *is* a benchmark doc; small positive
    fractions are shared boilerplate. Docs shorter than ``gram_n`` tokens
    have no grams and report (0, 0, 0.0) — present, not dropped, so the
    report covers the whole corpus.
    """
    grams = word_shingles(corpus, id_col, text_col, gram_n)
    bench_grams = word_shingles(bench, id_col, text_col, gram_n).select("s").distinct()
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        grams.join(bench_grams, "s")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    totals = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    return (
        corpus.select(id_col)
        .join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .na.fill({"n_grams": 0, "n_hit": 0})
        .select(
            id_col,
            "n_grams",
            "n_hit",
            # raw IEEE division of the two integer counts — bit-identical
            # across engines; never rounded (a ratio with denominator 128
            # lands exactly on a .5-at-6dp boundary where engines disagree)
            F.when(F.col("n_hit") > 0, F.col("n_hit") / F.col("n_grams"))
            .otherwise(F.lit(0.0))
            .alias("frac_hit"),
        )
    )
