"""Corpus-operator scale stress: the dedup/hygiene family on a ~20x corpus.

The driver's documents table tops out at 5k docs (sf0.1); the scale claims
in operators/dedup.py are about behavior when the corpus is much larger
than a row-group. This replicates the sf0.1 documents 20x (shifted ids,
per-replica salt so near-dup structure survives within each replica but
exact text never collides across replicas), materializes the 100k-doc
corpus, and times the pipelines end-to-end:

    python tools/scale_corpus_run.py [reps] [only] [repeats] [--zipf]

``repeats`` (default 2) records best-of-N per job; ``--zipf`` swaps the
replicated driver table for the Zipf-vocabulary fixture
(tools/corpus_fixtures.py, reps*5000 docs) to exercise stop-word-shaped
term frequencies.

Recorded on local[32] at 20x (100k docs, ~5.1M shingles), full evaluation
(sum-agg over every metric column — a bare count() lets Catalyst eliminate
unique-key left joins and skip the work):
  minhash_jaccard_pairs    9.6 s   (2.1M pairs; 20x data ~ 5.5x the sf0.1 wall)
  chunk_dedup              5.4 s   (~3x sf0.1)
  repetition_metrics      13.6 s   (~8x sf0.1; three explode+agg pipelines)
Sub-linear walls vs data because fixed per-job overhead dominates sf0.1;
the point is the absence of any quadratic blow-up (the in-plan bucket cap
and the band equi-join keep pair generation linear in candidates).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_data_etl_spark.operators.dedup import (  # noqa: E402
    chunk_dedup,
    minhash_jaccard_pairs,
)
from crypto_market_data_etl_spark.operators.text import repetition_metrics  # noqa: E402
from crypto_market_data_etl_spark.schemas import load_table  # noqa: E402
from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    reps = int(argv[0]) if argv else 20
    only = set(argv[1].split(",")) if len(argv) > 1 else None
    # best-of-N per job (default 2): single-run walls on this box drift up
    # to ~80% (r6 span_dedup recorded 16.7 s at 4x vs 9.1 s at 20x — pure
    # first-run JIT/page-cache noise), which read as ladder non-monotonicity;
    # the market rungs already record best-of-2 for the same reason
    repeats = int(argv[2]) if len(argv) > 2 else 2
    zipf = "--zipf" in flags
    spark = get_spark(app_name="scale_corpus")
    if zipf:
        # Zipf-vocabulary fixture (tools/corpus_fixtures.py): stop-word-
        # shaped term frequencies the replicated topical table can't
        # produce — exercises hot LSH shingle buckets and prunable
        # retrieval on the SAME job list as the replication ladder
        from tools.corpus_fixtures import zipf_docs

        big = zipf_docs(spark, reps * 5000)
        n = big.count()
        print(f"corpus: {n} docs (zipf, {reps}x-sized)")
    else:
        docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
            "doc_id", "text"
        )
        big = None
        for i in range(reps):
            r = docs.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" rep{i}")).alias("text"),
            )
            big = r if big is None else big.unionByName(r)
        big = big.repartition(32).localCheckpoint()
        n = big.count()
        print(f"corpus: {n} docs ({reps}x sf0.1)")

    # force FULL evaluation: a bare count() lets Catalyst eliminate
    # unique-key left joins (and with them the metric computation itself)
    def run_all(df):
        agg = [
            F.sum(f.name).alias(f.name)
            for f in df.schema.fields
            if f.dataType.simpleString() in ("double", "bigint")
        ]
        return df.agg(F.count(F.lit(1)), *agg).collect()[0][0]

    # round-5 additions exercised on the same replicated corpus: BM25 against
    # a fixed query set, bigram-LM scoring, fuzzy cross-corpus decon against a
    # 1/50 "benchmark" slice, DSIR weights against a 1/5 target slice
    from crypto_market_data_etl_spark.operators.contamination import (
        cross_corpus_neardup,
    )
    from crypto_market_data_etl_spark.operators.dedup import span_dedup
    from crypto_market_data_etl_spark.operators.retrieval import bm25_topk
    from crypto_market_data_etl_spark.operators.sampling import dsir_logratios
    from crypto_market_data_etl_spark.operators.text import ngram_lm_scores

    # query/bench sides pinned to the FIRST replica (fixed size), so the
    # ladder isolates corpus-side scaling — these operators' contract is a
    # small fixed query set / eval suite against a growing corpus
    first = F.col("doc_id") < 1_000_000
    queries = big.filter(first & (F.col("doc_id") % 29 == 3)).select(
        F.col("doc_id").alias("q_id"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 6)).alias("q_text"),
    )
    bench = big.filter(first & (F.col("doc_id") % 50 == 0))

    jobs = [
        ("minhash_jaccard_pairs", lambda: run_all(minhash_jaccard_pairs(big))),
        ("chunk_dedup", lambda: run_all(chunk_dedup(big))),
        ("repetition_metrics", lambda: run_all(repetition_metrics(big))),
        ("ngram_lm_scores", lambda: run_all(ngram_lm_scores(big))),
        ("bm25_topk", lambda: run_all(bm25_topk(big, queries))),
        (
            "cross_corpus_neardup",
            lambda: run_all(cross_corpus_neardup(big, bench)),
        ),
        (
            "dsir_logratios",
            lambda: run_all(dsir_logratios(big, F.col("doc_id") % 5 == 0)),
        ),
        ("span_dedup", lambda: run_all(span_dedup(big))),
        # end-to-end curation (quality gate -> canonical dedup -> decon ->
        # mixture -> splits) with a synthesized domain column; the digest
        # over EVERY column defeats count(1) pruning — a bare count lets
        # Catalyst skip the whole final projection (split md5 CASE, rates)
        (
            "curate_corpus",
            lambda: (
                lambda out: out.select(
                    F.md5(F.concat_ws("|", *out.columns)).alias("h")
                )
                .agg(F.count("h"))
                .collect()[0][0]
            )(
                __import__(
                    "crypto_market_data_etl_spark.operators.curation",
                    fromlist=["curate_corpus"],
                ).curate_corpus(
                    big.withColumn(
                        "lang", F.concat(F.lit("l"), F.col("doc_id") % 5)
                    ),
                    bench,
                )
            ),
        ),
    ]
    for label, fn in jobs:
        if only is not None and label not in only:
            continue
        best, rows = float("inf"), None
        for _ in range(repeats):
            t0 = time.time()
            rows = fn()
            best = min(best, time.time() - t0)
        print(f"{label}: {best:.1f}s rows={rows}")
    spark.stop()


if __name__ == "__main__":
    main()
