"""Streaming corpus ingestion: the continuous-crawl arm of the curation
pipeline (extension surface — the reference streams market data only).

A production 100 TB corpus is not rebuilt from scratch per crawl; new shards
arrive continuously and must pass the same hygiene gates incrementally. This
wires the batch curation stages (`operators/curation.py`) as one Structured
Streaming query over a document stream:

1. **Quality gate** — `text.quality_expr` is a pure projection, so it runs
   unchanged on the stream (no state).
2. **Streaming exact dedup** — content-hash `dropDuplicatesWithinWatermark`:
   re-crawled/replayed documents are dropped with state BOUNDED by the
   watermark (the streaming arm of `dedup.exact_dedup`; an unbounded
   `dropDuplicates` would grow state forever on a 100 TB crawl).
3. **Contamination flag** — document n-grams explode and probe the STATIC
   benchmark gram set via a broadcast stream-static join (the same
   broadcast shape as `contamination.contamination_report` — the stream
   side never shuffles for the probe), then one watermarked per-document
   aggregation reassembles the verdict. Grouping on the event-time column
   keeps the aggregation state watermark-cleaned; append mode emits each
   document exactly once, after its event time expires.

Near-dup canonicalization stays batch (connected components need the full
pair graph); the streaming tier handles the gates that are incremental by
nature and hands survivors to the periodic batch dedup — the standard
lambda split for corpus pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import quality_expr


def stream_curate(
    stream_docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    quality_min: float = 0.5,
    gram_n: int = 3,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Quality-gate, dedup, and contamination-flag a document STREAM.

    ``stream_docs`` must carry an event-time column ``ts_col``; ``bench`` is
    a static (batch) DataFrame of benchmark documents. Returns a streaming
    DataFrame ``(id, ts, quality, n_grams, n_hit, clean)`` — run in append
    mode; each surviving document emits once its event time passes the
    watermark. ``clean`` is the strict n_hit == 0 policy of the batch
    pipeline (stage 3 of ``curate_corpus``).
    """
    from ..materialize import materialize
    from ..operators.dedup import gram_array_expr, word_shingles

    gated = (
        stream_docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
        # watermark BEFORE the quality filter: every ingested document
        # advances event time, so a burst of low-quality input still lets
        # earlier survivors finalize
        .withWatermark(ts_col, watermark)
        .withColumn("quality", quality_expr(text_col))
        .filter(F.col("quality") >= quality_min)
        .withColumn("__h", F.md5(F.col(text_col)))
        .dropDuplicatesWithinWatermark(["__h"])
    )
    # per-doc gram array via the SHARED gram rule (dedup.gram_array_expr) —
    # the streaming probe and the batch contamination_report cannot drift;
    # explode_outer keeps gram-less docs in the output with zero counts
    staged = gated.select(
        F.col(id_col),
        F.col(ts_col),
        "quality",
        F.split(F.col(text_col), " ").alias("__toks"),
    ).select(
        id_col,
        ts_col,
        "quality",
        F.explode_outer(gram_array_expr(F.col("__toks"), gram_n)).alias("s"),
    )
    # MATERIALIZED: a stream-static join re-evaluates the static side every
    # micro-batch — without this, each trigger re-runs the bench shingle
    # explode + distinct shuffle before broadcasting
    bench_grams = F.broadcast(
        materialize(
            word_shingles(bench, id_col, text_col, gram_n, spread=False)
            .select("s")
            .distinct()
            .withColumn("__hit", F.lit(1))
        )
    )
    probed = staged.join(bench_grams, "s", "left")
    return (
        probed.groupBy(ts_col, id_col, "quality")
        .agg(
            F.sum(F.when(F.col("s").isNotNull(), 1).otherwise(0)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
        .withColumn("clean", F.col("n_hit") == 0)
    )
