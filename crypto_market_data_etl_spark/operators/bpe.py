"""Distributed BPE tokenizer training (extension surface).

Byte-pair-encoding merge learning is the tokenizer-training step of every
LLM data stack. The classic distributed formulation (as in the original
Sennrich et al. 2016 implementation) never iterates over the corpus: ONE
corpus pass reduces to a (word, count) table — vocabulary-sized, orders
smaller than the corpus — and every merge round then runs on that small
table only. Not in the reference (market ETL only); built Spark-first:

- :func:`word_counts` — the single corpus-scale pass (explode + map-side-
  combined count, one shuffle on the word).
- :func:`pair_counts` — count-weighted adjacent symbol pairs over the word
  table; the argmax pair IS the next BPE merge.
- :func:`apply_merge` — greedy left-to-right non-overlapping merge of one
  pair inside each word's symbol array (a columnar fold — no Python).
- :func:`bpe_learn` — the k-round training loop. Each round is one small
  Spark job on the word table plus a 1-row driver collect (the argmax
  merge — a scalar decision, not data); lineage is cut per round so round
  k's plan stays O(1) deep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..materialize import materialize


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-scale pass: (w, wc) word-frequency table.

    Everything downstream (pair counting, merge rounds) runs on this
    vocabulary-sized output, never on the corpus again.
    """
    return (
        df.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def with_symbols(words: DataFrame) -> DataFrame:
    """Append the character-level symbol array (the BPE starting alphabet)."""
    return words.withColumn("syms", F.split(F.col("w"), ""))


def pair_counts(symbols: DataFrame, k: int | None = None) -> DataFrame:
    """Count-weighted adjacent symbol pairs: (sym_l, sym_r, cnt[, rnk]).

    The top-1 row is the next BPE merge. The symbol array is STAGED as a
    column before the pair lambda references it (CollapseProject would
    re-evaluate an inline expression per pair). With ``k`` set, returns the
    deterministic top-k (cnt desc, then sym_l/sym_r asc) via
    TakeOrderedAndProject — per-partition top-k, no global sort.
    """
    cs = F.col("syms")
    pairs = F.when(F.size(cs) < 2, F.array().cast("array<struct<l:string,r:string>>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(cs) - 1, F.lit(1))),
            lambda i: F.struct(
                F.element_at(cs, i).alias("l"),
                F.element_at(cs, (i + 1).cast("int")).alias("r"),
            ),
        )
    )
    counted = (
        symbols.select(F.col("wc"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("sym_l"), F.col("p.r").alias("sym_r"))
        .agg(F.sum("wc").alias("cnt"))
    )
    if k is None:
        return counted
    topk = counted.orderBy(
        F.col("cnt").desc(), F.col("sym_l"), F.col("sym_r")
    ).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("sym_l"), F.col("sym_r"))
    return topk.withColumn("rnk", F.row_number().over(w).cast("long"))


def apply_merge(symbols: DataFrame, left: str, right: str) -> DataFrame:
    """Merge every adjacent non-overlapping (left, right) occurrence into one
    symbol, greedily left-to-right — the exact BPE application rule ("aaa"
    under merge (a,a) becomes ["aa","a"], not ["a","aa"]).

    Columnar fold over the symbol array: if the accumulator's last symbol is
    ``left`` and the incoming one is ``right``, the pair fuses (and the fused
    symbol can itself fuse again only if it literally equals ``left`` —
    which the comparison handles for free). Word arrays are short, so the
    per-step slice stays cheap.
    """
    merged = left + right

    def step(acc, c):
        fuse = (F.size(acc) > 0) & (F.element_at(acc, -1) == left) & (c == right)
        return F.when(
            fuse,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(c)))

    return symbols.withColumn(
        "syms",
        F.aggregate(F.col("syms"), F.array().cast("array<string>"), step),
    )


def bpe_encode(
    df: DataFrame,
    trained: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize a corpus with a trained BPE table: every word broadcast-joins
    its learned symbol sequence; out-of-vocabulary words fall back to the
    character alphabet (the base-vocab fallback every real BPE has).

    This is the production insight that makes distributed BPE encoding
    cheap: applying k merges per corpus token would chain k folds over
    every word occurrence, but the (word → symbols) result is already
    materialized in the vocabulary-sized training table — so encoding is
    explode + ONE broadcast join + re-assembly, linear in the corpus with
    no per-merge work at all. Output: (id, n_words, n_tokens, tokens) with
    tokens flattened in document order; empty/NULL-text documents stay in
    the output as (0, 0, []) — the whole-corpus-coverage contract the
    sibling operators keep, so a downstream token-count join never loses
    documents.
    """
    staged = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("pos", "w"),
    ).filter(F.col("w") != "")
    vocab = F.broadcast(trained.select("w", "syms"))
    joined = staged.join(vocab, "w", "left").select(
        id_col,
        "pos",
        # OOV fallback: the character alphabet
        F.coalesce(F.col("syms"), F.split(F.col("w"), "")).alias("syms"),
    )
    encoded = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "syms"))),
                lambda s: s.getField("syms"),
            )
        ).alias("tokens"),
    )
    spine = df.select(F.col(id_col)).distinct()
    return (
        spine.join(encoded, id_col, "left")
        .na.fill({"n_words": 0})
        .select(
            id_col,
            F.col("n_words").cast("long").alias("n_words"),
            F.coalesce(
                F.size("tokens"), F.lit(0)
            ).cast("long").alias("n_tokens"),
            F.coalesce(
                F.col("tokens"), F.array().cast("array<string>")
            ).alias("tokens"),
        )
    )


def bpe_learn(
    df: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final symbol table).

    Ties break deterministically (cnt desc, pair asc — the same order
    every engine and rerun produces). Each round materializes the
    vocabulary-sized symbol table (deployment-aware: localCheckpoint
    locally, persist on a cluster) so round k never replays rounds 1..k-1,
    and collects exactly ONE row (the argmax pair) to the driver — a
    scalar control decision, the same class as the skew/stat probes.

    Superseded round tables are unpersisted one round LATE: round k's
    ``collect`` is the action that forces table k into storage, and only
    then is table k-1 (its lineage parent) safe to release — freeing it
    earlier would strand a lazily-materialized child; never freeing it
    would accumulate one persisted table per merge round (real
    vocabularies run tens of thousands of merges).
    """
    syms = materialize(with_symbols(word_counts(df, text_col)))
    prev: DataFrame | None = None
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = pair_counts(syms).orderBy(
            F.col("cnt").desc(), F.col("sym_l"), F.col("sym_r")
        ).limit(1).collect()
        # the collect above forced `syms` into storage; its superseded
        # lineage parent can now be released
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top:
            break
        left, right = top[0]["sym_l"], top[0]["sym_r"]
        merges.append((left, right))
        prev = syms
        syms = materialize(apply_merge(syms, left, right))
    return merges, syms
