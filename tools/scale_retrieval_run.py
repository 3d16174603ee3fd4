"""Retrieval scale rung: exact BM25 vs the max-score pruned tier.

The corpus-ladder documents table has a tiny topical vocabulary, so its
"rare" terms score barely above its stop words (measured: champion
contribution ~0.52 vs stop-term bound ~0.48 — nothing is prunable and
the pruned tier's extra passes make it SLOWER; that measurement is why
this rung generates a Zipf-shaped corpus instead). Real corpora are
Zipfian: universal stop words, a mid-frequency body, and genuinely rare
terms whose idf dominates. On that shape the exact path's scoring join
grows as (queries x stop-term document frequency) while max-score's
stays index-bound — the classic WAND/max-score win, here as join
pruning.

Prints one JSON line per (n_queries, tier) run; equality of the two
tiers is pytest-gated (test_bm25_maxscore_*) and oracle-gated (x47
reuses x37's oracle), so this records WALLS only.

Usage: python tools/scale_retrieval_run.py [--docs 200000] [--queries 20,500,2000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_data_etl_spark.operators.retrieval import (  # noqa: E402
    bm25_topk,
    bm25_topk_maxscore,
)
from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--queries", default="20,500,2000")
    args = ap.parse_args()

    spark = get_spark(app_name="scale_retrieval")
    # Zipf-shaped synthetic corpus: 6 universal stop words, 20 draws from a
    # 2k-word mid-frequency vocabulary, 2 rare tokens (~10 docs each) —
    # shared fixture (tools/corpus_fixtures.py), also used by the corpus
    # ladder's --zipf rung
    from tools.corpus_fixtures import zipf_docs

    docs = zipf_docs(spark, args.docs)
    for nq in [int(x) for x in args.queries.split(",")]:
        queries = spark.createDataFrame(
            # stop-word-heavy realistic queries: 3 stop words + 1 rare term
            [(q, f"the of and r{q * 997 % 20000}") for q in range(nq)],
            "q_id long, q_text string",
        ).localCheckpoint()
        for name, fn in [("exact", bm25_topk), ("maxscore", bm25_topk_maxscore)]:
            t0 = time.time()
            n = fn(docs, queries).count()
            print(
                json.dumps(
                    {
                        "job": f"bm25_{name}",
                        "n_queries": nq,
                        "docs": args.docs,
                        "sec": round(time.time() - t0, 2),
                        "rows": n,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
