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

from ..materialize import materialize, release

#: pass count of the most recent :func:`bpe_learn` call — introspection for
#: harnesses recording the merges_per_pass batching effect (passes ~
#: ceil(n_merges / m) when selection is unimpeded; conflicts add passes)
LAST_LEARN_PASSES = 0


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


def select_disjoint_merges(
    candidates: list[tuple[str, str]], m: int
) -> list[tuple[str, str]]:
    """Greedy top-``m`` SYMBOL-DISJOINT selection from rank-ordered merge
    candidates — the batching rule of distributed BPE trainers.

    A candidate is taken only when neither of its symbols has appeared in an
    earlier selection of this pass (as left, right, OR the merged output
    symbol). Why this is safe to batch: merging (a,b) can never CREATE an
    adjacency between two other pre-existing symbols (it replaces two
    symbols with one — anything adjacent to the pair is now adjacent to the
    fused symbol, a NEW symbol), so the only in-pass interactions are
    through shared symbols — exactly what the disjointness filter forbids.
    Selected merges therefore keep their pass-start counts when applied
    sequentially in rank order, and the batch is order-insensitive.

    The residual divergence from one-at-a-time BPE is SELECTION staleness
    only: a pair born mid-pass (involving a freshly fused symbol) cannot be
    picked until the next pass, even if its count would have out-ranked a
    later selection — the standard distributed-BPE trade, bounded by the
    pass width ``m``. ``m=1`` is exact Sennrich.
    """
    used: set[str] = set()
    picked: list[tuple[str, str]] = []
    for left, right in candidates:
        if len(picked) >= m:
            break
        if left in used or right in used or left + right in used:
            continue
        picked.append((left, right))
        used.update((left, right, left + right))
    return picked


def bpe_learn(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    merges_per_pass: int = 1,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns (merges, final symbol table).

    Ties break deterministically (cnt desc, pair asc — the same order
    every engine and rerun produces). Each pass materializes the
    vocabulary-sized symbol table (deployment-aware: localCheckpoint
    locally, persist on a cluster) so pass k never replays passes 1..k-1,
    and collects one SMALL candidate list (≤ ``4*merges_per_pass`` rows) to
    the driver — a scalar control decision, the same class as the
    skew/stat probes.

    ``merges_per_pass`` batches the driver loop: a real vocabulary is tens
    of thousands of merges, and one synchronous Spark job per merge makes
    scheduling overhead the bottleneck (30k sequential round-trips). Each
    pass instead collects the top ``4*m`` candidate pairs once, selects up
    to ``m`` symbol-disjoint merges driver-side
    (:func:`select_disjoint_merges` — provably count-stable within the
    pass), and applies them as ``m`` chained columnar folds in ONE job —
    pass count drops ~``m``×. ``merges_per_pass=1`` is exactly classic
    sequential BPE (equality-tested against a pure-Python reference).

    Superseded pass tables are released one pass LATE: pass k's ``collect``
    is the action that forces table k into storage, and only then is table
    k-1 (its lineage parent) safe to release — freeing it earlier would
    strand a lazily-materialized child; never freeing it (or leaving it in
    the persist registry — see ``materialize.release``) would accumulate
    one persisted table per pass.
    """
    global LAST_LEARN_PASSES
    if merges_per_pass < 1:
        raise ValueError(f"merges_per_pass must be >= 1, got {merges_per_pass}")
    syms = materialize(with_symbols(word_counts(df, text_col)))
    prev: DataFrame | None = None
    merges: list[tuple[str, str]] = []
    LAST_LEARN_PASSES = 0
    while len(merges) < n_merges:
        LAST_LEARN_PASSES += 1
        m = min(merges_per_pass, n_merges - len(merges))
        top = pair_counts(syms).orderBy(
            F.col("cnt").desc(), F.col("sym_l"), F.col("sym_r")
        ).limit(max(4 * m, 8)).collect()
        # the collect above forced `syms` into storage; its superseded
        # lineage parent can now be released
        if prev is not None:
            release(prev)
            prev = None
        picked = select_disjoint_merges(
            [(r["sym_l"], r["sym_r"]) for r in top], m
        )
        if not picked:
            break
        merges.extend(picked)
        prev = syms
        out = syms
        for left, right in picked:  # rank order == sequential application
            out = apply_merge(out, left, right)
        syms = materialize(out)
    return merges, syms
