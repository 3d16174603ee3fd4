"""BPE merge-batching rung: rounds/vocab must drop ~m x with merges_per_pass.

The round-5 verdict flagged bpe_learn's one-driver-job-per-merge loop
(30k sequential round-trips for a real vocabulary). This times learning
the SAME ``--merges`` merge budget on the sf0.1 documents corpus at a
ladder of ``merges_per_pass`` values and prints one JSON line each:
wall, driver passes (``bpe.LAST_LEARN_PASSES``), merges actually learned.
Correctness of the batched selection is pytest-gated
(test_bpe_learn_batched_matches_python_reference); this records the
SCHEDULING effect the knob exists for.

Usage: python tools/scale_bpe_run.py [--merges 64] [--ladder 1,8,32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--merges", type=int, default=64)
    ap.add_argument("--ladder", default="1,8,32")
    args = ap.parse_args()

    from crypto_market_data_etl_spark.operators import bpe
    from crypto_market_data_etl_spark.schemas import load_table

    spark = get_spark(app_name="scale_bpe")
    docs = (
        load_table(spark, "/root/testdata/sf0.1", "documents")
        .select("doc_id", "text")
        .repartition(32)
        .localCheckpoint()
    )
    docs.count()
    for m in [int(x) for x in args.ladder.split(",")]:
        t0 = time.time()
        merges, _ = bpe.bpe_learn(docs, args.merges, merges_per_pass=m)
        print(
            json.dumps(
                {
                    "job": f"bpe_learn_m{m}",
                    "merges_per_pass": m,
                    "sec": round(time.time() - t0, 2),
                    "passes": bpe.LAST_LEARN_PASSES,
                    "merges": len(merges),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
