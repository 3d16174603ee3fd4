"""End-to-end corpus curation: the composed LLM-training-data pipeline.

Every stage exists as an individually-oracle-gated operator; this wires them
in the order a production data pipeline runs them (the C4/Gopher/LLaMA
recipe shape) and is itself gated end-to-end (x35), so stage INTERACTIONS —
the dedup running on the quality-gated subset, the mixture rates computed on
the decontaminated survivor set, splits anchored on dup clusters — are
verified, not just the stages:

1. **Quality gate** — ``text.quality_scores`` composite ≥ ``quality_min``.
2. **Near-dup canonicalization** — MinHash-LSH pairs over the gated subset →
   connected components → keep the highest-quality member per cluster
   (``clustering.canonical_docs``).
3. **Benchmark decontamination** — drop survivors with ANY n-gram overlap
   against the benchmark corpus (``contamination.contamination_report``;
   ``n_hit = 0`` policy, the strict GPT-3-style filter).
4. **Temperature mixture** — ``sampling.domain_mixture_sample`` over the
   clean set (alpha-flattened domain shares, deterministic membership).
5. **Leakage-safe splits** — train/val/test hashed on the DUP-CLUSTER anchor
   from stage 2, so near-duplicates never straddle splits even when both
   survive (distinct members of a cluster can: only one is canonical per
   TEXT cluster, but the anchor keys the split for whatever survives).

Scale: the stages compose map-side/bucketed primitives — one corpus scan
per stage family, LSH band equi-joins (capped, ``operators.skew``),
components over the edge list only, broadcast bench grams, broadcast
mixture-rate dims. Nothing here collects the corpus.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize
from .clustering import canonical_docs
from .contamination import contamination_report
from .dedup import minhash_jaccard_pairs
from .sampling import domain_mixture_sample, split_expr
from .text import quality_scores


def curate_corpus(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "lang",
    quality_min: float = 0.64,
    n_hashes: int = 15,
    rows_per_band: int = 3,
    gram_n: int = 3,
    alpha: float = 0.5,
    boundaries: tuple[float, ...] = (0.8, 0.9),
    labels: Sequence[str] = ("train", "val", "test"),
    salt: str = "",
) -> DataFrame:
    """Run the five-stage curation pipeline; see the module docstring.

    Output, one row per doc that survives all gates:
    ``(id, domain, quality, anchor, n_members, rate, split)`` — the audit
    columns say WHY each survivor is here (its quality, its dup-cluster
    anchor and size, its domain's keep rate) and where it trains.
    """
    # stage outputs are each consumed by 2-3 downstream references, and
    # Spark shares no subtrees — without materialize() one run would replay
    # quality scoring, MinHash/LSH, components, and the contamination scan
    # roughly 3x (deployment-aware: localCheckpoint locally, persist on a
    # cluster; see materialize.py)

    # 1. quality gate (keeps the score as an audit column)
    scored = quality_scores(docs, id_col, text_col).select(id_col, "quality")
    good = materialize(
        docs.join(scored.filter(F.col("quality") >= quality_min), id_col)
    )

    # 2. near-dup canonicalization over the gated subset
    pairs = minhash_jaccard_pairs(
        good, id_col, text_col, n_hashes=n_hashes, rows_per_band=rows_per_band
    ).select(F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b"))
    canon = canonical_docs(
        good.select(id_col, "quality"), pairs, id_col, "quality"
    )
    surv = materialize(
        good.join(
            canon.filter(F.col("is_canonical")).select(
                id_col, "anchor", "n_members"
            ),
            id_col,
        )
    )

    # 3. strict decontamination: any bench n-gram overlap drops the doc
    contam = contamination_report(surv, bench, id_col, text_col, gram_n)
    clean = materialize(
        surv.join(contam.filter(F.col("n_hit") == 0).select(id_col), id_col)
    )

    # 4. temperature-flattened domain mixture over the clean set
    mixed = domain_mixture_sample(clean, id_col, domain_col, alpha, salt)

    # 5. split on the dup-cluster anchor (stage-2's components, not a
    # rehash) via the SHARED split rule — sampling.split_expr namespaces
    # the digest away from stage 4's membership digest (for singleton
    # clusters anchor == id; an un-namespaced split digest is then
    # byte-identical to the membership digest, and every mixture-kept
    # singleton in a downsampled domain would land in 'train')
    out = mixed.join(
        clean.select(id_col, "quality", "anchor", "n_members"), id_col
    )
    split = split_expr(F.col("anchor"), boundaries, labels, salt)
    return out.select(
        F.col(id_col),
        F.col(domain_col),
        "quality",
        "anchor",
        "n_members",
        "rate",
        split.alias("split"),
    )
