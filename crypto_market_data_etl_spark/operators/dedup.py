"""Deduplication operators for large-scale training-data pipelines.

Not in the reference (its dedup needs are zero — SURVEY §2.6 notes no
distinct anywhere); these are the BASELINE.json extension surface, designed
Spark-first for 100 TB corpora:

- :func:`exact_dedup` — hash-groupBy; one shuffle on the content hash.
- MinHash + LSH near-dup: shingle -> per-seed min-hash -> banded signatures ->
  candidate pairs via *equi-join on (band, signature)* — never an O(n^2)
  cross join. Band/row counts tune the jaccard threshold curve
  (P(candidate) = 1 - (1 - j^r)^b).
- :func:`simhash` — 32-bit hash-profile signature; near-dups share signatures
  with small Hamming distance.
- :func:`ngram_jaccard_pairs` — *exact* jaccard, but only over LSH candidate
  pairs (bounded).

Everything is built-in expressions (md5 / transform / explode / groupBy) —
JVM-side, no Python UDFs; md5 is used as the hash family because the DuckDB
oracle computes the identical digests.

Scale notes: the shingle explode multiplies rows by ~tokens-per-doc; the seed
dimension stays as N parallel agg expressions (one pass), not an explode. The
band equi-join shuffles on (band_idx, band_sig) — uniformly distributed by
construction (hash values), so no skew. Degenerate hot buckets (e.g. empty
docs) should be length-filtered upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup via content-hash groupBy.

    Returns one row per distinct content: ``content_hash``, ``n_copies``,
    ``keep_id`` (min id — the canonical survivor).
    """
    h = F.md5(F.concat_ws("\x1f", *content_cols))
    return df.groupBy(h.alias("content_hash")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(id_col).alias("keep_id"),
    )


def word_shingles(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, s).

    The token array is materialized in its own projection before the gram
    lambda references it — column expressions are trees, so an inline
    ``split`` would re-tokenize the text once per gram (O(tokens^2) chars).
    """
    staged = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
    toks = F.col("__toks")
    n_grams = F.size(toks) - (n - 1)
    # sequence(1, 0) is DESCENDING [1, 0] in Spark, not empty — docs shorter
    # than n tokens must short-circuit to an empty gram array (explode drops
    # them) instead of reaching slice() with a 0 index
    grams = F.when(n_grams < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )
    return staged.select(F.col(id_col), F.explode(grams).alias("s")).distinct()


def minhash_signatures(
    shingles: DataFrame, id_col: str = "doc_id", n_hashes: int = 15
) -> DataFrame:
    """Per-doc MinHash signature as ``n_hashes`` columns mh0..mhN-1 plus an
    ``mhs`` array.

    One aggregation pass: each seed is an independent ``min(md5(seed|s))``
    agg expression (map-side partial agg keeps the shuffle tiny — one row per
    doc), not a seeds x shingles explode.
    """
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("s")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    sig = shingles.groupBy(id_col).agg(*aggs)
    return sig.withColumn("mhs", F.array(*[f"mh{i}" for i in range(n_hashes)]))


def lsh_bands(
    sig: DataFrame, id_col: str = "doc_id", n_hashes: int = 15, rows_per_band: int = 3
) -> DataFrame:
    """Banded signatures: (id, band_idx, band_sig)."""
    n_bands = n_hashes // rows_per_band
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|", *[f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
                )
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(id_col, F.posexplode(bands).alias("band_idx", "band_sig"))


def lsh_candidate_pairs(
    bands: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:  # max_bucket_size=None → skew.DEFAULT_MAX_BUCKET_SIZE below
    """Distinct candidate pairs sharing any band: (id_a, id_b), id_a < id_b.

    Equi-join on (band_idx, band_sig) — a plain shuffled hash join; never a
    cross join. Output is deduped across bands.

    ``max_bucket_size`` guards the degenerate-bucket blow-up (boilerplate/
    empty docs collapsing to one signature → O(n²) pairs on one shuffle
    partition): each (band_idx, band_sig) bucket is deterministically
    truncated to its smallest ids, with the dropped-membership count logged.
    Truncation alone would orphan EXACT-dup members beyond the cap (identical
    docs share a signature in every band — no other band rescues them), so
    each dropped membership also emits a chain pair to the bucket's smallest
    id (``operators.skew.cap_bucket_size_chained``): O(dropped) extra pairs,
    and every capped member stays connected for downstream clustering/dedup.
    Default (None) resolves to ``skew.DEFAULT_MAX_BUCKET_SIZE`` — inert on
    healthy corpora, a hard bound on degenerate ones. Pass
    ``max_bucket_size=0`` to disable.
    """
    from .skew import (
        DEFAULT_MAX_BUCKET_SIZE,
        capped_pair_condition,
        needs_cap,
        ranked_pair_sides,
    )

    if max_bucket_size is None:
        max_bucket_size = DEFAULT_MAX_BUCKET_SIZE
    if max_bucket_size > 0 and needs_cap(
        bands, ["band_idx", "band_sig"], max_bucket_size
    ):
        # cap + chains folded into the self-join: one window (same shuffle
        # key as the join — exchange reused), one join, no second traversal
        ra, rb = ranked_pair_sides(
            bands, ["band_idx", "band_sig"], id_col, max_bucket_size, log_dropped
        )
        a = ra.select(F.col(id_col).alias("id_a"), "band_idx", "band_sig", "__rn_a")
        b = rb.select(F.col(id_col).alias("id_b"), "band_idx", "band_sig", "__rn_b")
        return (
            a.join(b, ["band_idx", "band_sig"])
            .filter(capped_pair_condition("id_a", "id_b", max_bucket_size))
            .select("id_a", "id_b")
            .distinct()
        )
    a = bands.select(
        F.col(id_col).alias("id_a"), "band_idx", "band_sig"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), "band_idx", "band_sig"
    )
    return (
        a.join(b, ["band_idx", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    n_hashes: int = 15,
    rows_per_band: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidate pairs + estimated jaccard
    (= fraction of matching minhashes)."""
    sh = word_shingles(df, id_col, text_col, shingle_n)
    # the signature table is referenced three times (bands + both pair
    # sides); Spark does not share subtrees, so materialize it once — the
    # same move a production LSH pipeline makes by checkpointing signatures
    sig = minhash_signatures(sh, id_col, n_hashes).persist()
    cand = lsh_candidate_pairs(lsh_bands(sig, id_col, n_hashes, rows_per_band), id_col)
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("mhs").alias("mhs_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("mhs").alias("mhs_b"))
    matches = F.aggregate(
        F.zip_with("mhs_a", "mhs_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            (matches / F.lit(float(n_hashes))).alias("jaccard_est"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 2,
    n_hashes: int = 15,
    rows_per_band: int = 3,
) -> DataFrame:
    """Exact n-gram jaccard, computed only for LSH candidate pairs.

    intersection via equi-join on the shingle value; union by inclusion-
    exclusion from per-doc set sizes. O(candidates x shared shingles), never
    all-pairs.
    """
    sh = word_shingles(df, id_col, text_col, shingle_n).persist()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sig = minhash_signatures(sh, id_col, n_hashes)
    cand = lsh_candidate_pairs(lsh_bands(sig, id_col, n_hashes, rows_per_band), id_col)
    inter = (
        cand.join(sh.select(F.col(id_col).alias("id_a"), "s"), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), "s"), ["id_b", "s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        cand.join(inter, ["id_a", "id_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """32-bit SimHash over distinct tokens (hash-profile form).

    Dimension p's contribution per token is +-1 by the high bit of the p-th
    hex nibble of md5(token); the signature bit is the sign of the sum.
    Output: (id, simhash bitstring, n_tokens).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    )
    expanded = toks.select(
        id_col, "tok", F.explode(F.sequence(F.lit(1), F.lit(bits))).alias("pos")
    )
    w = F.when(
        F.expr("substring(md5(tok), pos, 1)").isin(*list("89abcdef")), F.lit(1)
    ).otherwise(F.lit(-1))
    per_pos = expanded.groupBy(id_col, "pos").agg(F.sum(w).alias("s"))
    bit = F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0"))
    return (
        per_pos.withColumn("bit", bit)
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "bit"))),
                    lambda x: x.getField("bit"),
                ),
            ).alias("simhash"),
            F.count(F.lit(1)).alias("n_bits"),
        )
        .drop("n_bits")
    )
