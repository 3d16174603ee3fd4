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
extra shuffle. :func:`bloom_contamination_report` is the third tier: the
bench gram set compressed to a fixed-size broadcast Bloom bitmap, for bench
sets whose exact gram strings are too large to broadcast at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize
from .dedup import lsh_bands, minhash_signatures_inrow, word_shingles


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

    Shape (r15 single-pass rewrite, guide §2.3/§2.4): the corpus gram set
    is computed ONCE — ``explode_outer`` keeps gram-less docs as an
    ``(id, NULL)`` row, the broadcast bench probe rides a LEFT join (still
    map-side), and one ``groupBy(id)`` computes ``count(s)`` (skips the
    NULL) and the hit count together. The previous form computed the gram
    explode twice (totals pass + hits pass — Spark does not share
    subtrees) and joined both back onto a third corpus scan: 3 corpus-side
    passes and 4 shuffles collapse to 1 pass and 2 shuffles (the gram-set
    distinct + the per-doc agg). The corpus side is also SPREAD now: the
    r15 stage profile showed the single-row-group bench input serializing
    the whole gram pipeline through one task (1.1-3.0 s single-task stages
    at sf0.1 — the heaviest stage of x22/x26); at production scale the
    input already has many splits and the spread is a no-op.
    """
    grams = word_shingles(corpus, id_col, text_col, gram_n, outer=True)
    bench_grams = (
        word_shingles(bench, id_col, text_col, gram_n, spread=False)
        .select("s").distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        grams.join(bench_grams, "s", "left")
        .groupBy(id_col)
        .agg(
            F.count("s").alias("n_grams"),
            F.count("__hit").alias("n_hit"),
        )
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


def cross_corpus_neardup(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    n_hashes: int = 15,
    rows_per_band: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """FUZZY decontamination: flag corpus docs that are MinHash near-dups of
    any benchmark doc — catches paraphrased/reformatted benchmark leaks that
    the exact n-gram filters (:func:`contamination_report`) miss (the fuzzy
    tier of the GPT-3/Llama decontamination recipes).

    Same signature/band machinery as ``dedup.minhash_jaccard_pairs``, but the
    band join is CROSS-corpus: corpus bands against bench bands, never
    corpus-self. That changes the blow-up math — a degenerate bucket costs
    O(corpus_occupancy x bench_occupancy) with the bench side small by
    contract (an eval suite), so candidates stay linear in the corpus-side
    bucket and no pair cap is needed where the self-join required one.
    Docs with fewer than ``shingle_n`` tokens have no signature and can't
    collide; they report (0, 0.0, keep=true) like the whole-corpus coverage
    contract of the exact tier.

    Output per corpus doc: ``(id, n_candidates, max_jaccard, keep)`` with
    ``keep = max_jaccard < threshold``.
    """
    # in-row signatures (r15): identical values as the explode + groupBy
    # form with ZERO pre-signature shuffles — the corpus side goes from one
    # full gram-table exchange to none (dedup.minhash_signatures_inrow).
    # Bench side stays tiny by contract — skip the small-input spread.
    # Each signature table feeds its band explode AND the estimate join;
    # deployment-aware materialization (see materialize.py)
    sig_c = materialize(
        minhash_signatures_inrow(corpus, id_col, text_col, shingle_n, n_hashes)
    )
    sig_b = materialize(
        minhash_signatures_inrow(
            bench, id_col, text_col, shingle_n, n_hashes, spread=False
        )
    )
    bands_c = lsh_bands(sig_c, id_col, n_hashes, rows_per_band).select(
        F.col(id_col).alias("c_id"), "band_idx", "band_sig"
    )
    bands_b = lsh_bands(sig_b, id_col, n_hashes, rows_per_band).select(
        F.col(id_col).alias("b_id"), "band_idx", "band_sig"
    )
    # bench side is broadcast EXPLICITLY (both its band table and its
    # signature table): the corpus side then never shuffles for either join —
    # without the hint the static planner picks a sort-merge join and only
    # AQE might rescue it at runtime
    cand = (
        bands_c.join(F.broadcast(bands_b), ["band_idx", "band_sig"])
        .select("c_id", "b_id")
        .distinct()
    )
    matches = F.aggregate(
        F.zip_with("mhs_c", "mhs_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = (
        cand.join(
            sig_c.select(F.col(id_col).alias("c_id"), F.col("mhs").alias("mhs_c")),
            "c_id",
        )
        .join(
            F.broadcast(
                sig_b.select(F.col(id_col).alias("b_id"), F.col("mhs").alias("mhs_b"))
            ),
            "b_id",
        )
        # raw IEEE division (int count / n_hashes) — bit-identical across
        # engines, same reasoning as frac_hit above; never rounded
        .select("c_id", (matches / F.lit(float(n_hashes))).alias("j"))
    )
    hits = est.groupBy("c_id").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.max("j").alias("max_jaccard"),
    )
    return (
        corpus.select(id_col)
        .join(hits.withColumnRenamed("c_id", id_col), id_col, "left")
        .na.fill({"n_candidates": 0, "max_jaccard": 0.0})
        .withColumn("keep", F.col("max_jaccard") < F.lit(threshold))
    )


def _bloom_pos(s: Column, seed: int, n_bits: int) -> Column:
    """Deterministic, engine-portable hash position: the first 15 hex chars
    of ``md5(seed|s)`` parsed as an integer, mod ``n_bits``. md5 + hex parse
    compute identically in Spark (``conv``) and DuckDB (``'0x…'::BIGINT``),
    so an oracle can rebuild the exact same bitmap."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}|"), s)), 1, 15), 16, 10)
    return h.cast("long") % n_bits


def bloom_contamination_report(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int = 3,
    n_bits: int = 1 << 20,
    n_hashes: int = 2,
) -> DataFrame:
    """Contamination scan against a Bloom BITMAP of the benchmark grams:
    ``(id, n_grams, n_maybe_hit, frac_maybe)`` — one-sided
    (``n_maybe_hit >= n_hit`` of :func:`contamination_report`, false-
    positive rate ``(1-e^{-kn/m})^k``), for bench sets too large to
    broadcast exactly.

    The bitmap is built WITH aggregation, not driver code: each bench gram
    maps to ``n_hashes`` bit positions; positions group into 63-bit words
    via ``bit_or`` (bit 63 stays clear — DuckDB range-checks ``1<<63``, so
    the sign bit is not portable). ``n_bits/63`` rows ≈ 16 MB for a 1 Gbit
    filter, broadcastable regardless of bench cardinality. Probing is a
    map-side broadcast join per hash on the word index + a bitwise AND —
    the corpus side still never shuffles before the per-doc count, and a
    gram counts only when ALL ``n_hashes`` probes hit.

    Single-pass + spread (r15): same rewrite as
    :func:`contamination_report` — ``explode_outer`` grams computed once,
    totals and maybe-hits from ONE ``groupBy(id)`` (the old totals/hits
    subtrees each re-ran the explode AND the 2x-md5 probe projection —
    the two heaviest stages of x26 at sf0.1, both single-task before the
    spread), and no corpus-spine join.
    """
    grams = word_shingles(corpus, id_col, text_col, gram_n, outer=True)
    bench_grams = (
        word_shingles(bench, id_col, text_col, gram_n, spread=False)
        .select("s").distinct()
    )
    positions = None
    for i in range(n_hashes):
        p = bench_grams.select(_bloom_pos(F.col("s"), i, n_bits).alias("pos"))
        positions = p if positions is None else positions.union(p)
    bitmap = positions.groupBy(F.expr("pos DIV 63").alias("widx")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT)))").alias(
            "wbits"
        )
    )
    probed = grams
    # NULL grams (outer rows for gram-less docs) hash to NULL positions,
    # never match the bitmap, and the isNotNull guard keeps them out of the
    # maybe-hit count while count("s") keeps them out of n_grams
    all_hit = F.col("s").isNotNull()
    for i in range(n_hashes):
        bm = F.broadcast(
            bitmap.select(F.col("widx").alias(f"widx{i}"), F.col("wbits").alias(f"wbits{i}"))
        )
        probed = (
            probed.withColumn(f"pos{i}", _bloom_pos(F.col("s"), i, n_bits))
            .withColumn(f"widx{i}", F.expr(f"pos{i} DIV 63"))
            .withColumn(
                f"bit{i}",
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos{i} % 63 AS INT))"),
            )
            .join(bm, f"widx{i}", "left")
        )
        all_hit = all_hit & (
            F.coalesce(F.col(f"wbits{i}"), F.lit(0)).bitwiseAND(
                F.coalesce(F.col(f"bit{i}"), F.lit(0))
            )
            != 0
        )
    return (
        probed.groupBy(id_col)
        .agg(
            F.count("s").alias("n_grams"),
            F.sum(F.when(all_hit, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_maybe_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_maybe_hit",
            F.when(F.col("n_maybe_hit") > 0, F.col("n_maybe_hit") / F.col("n_grams"))
            .otherwise(F.lit(0.0))
            .alias("frac_maybe"),
        )
    )
