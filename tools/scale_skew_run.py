"""Skew-shaped scale rungs: prove the cap/salted/blocked paths FIRE at
scale, not just in unit tests (round-5 verdict ask #8).

Two rungs, each printing one JSON line per job:

- ``corpus``: the sf0.1 documents plus ``--hot-copies`` EXACT copies of one
  document (disjoint negative ids) — every copy collapses to one MinHash
  signature, so every band bucket holds hot_copies+1 members. The LSH
  candidate join runs with a cap far below that, so the in-plan guard must
  (a) bound pair generation to ~cap² + O(dropped) chain pairs instead of
  hot² and (b) LOG the dropped-membership count
  (``skew.ranked_pair_sides`` observation). Recorded: wall, pair count,
  the observed dropped count, and CONNECTIVITY — every hot member must
  appear in at least one pair (the chain-pair guarantee; plain truncation
  would orphan members beyond the cap).

- ``market``: a gen_market_fixture ladder rung at ``--hot-frac 0.95`` (one
  instrument carries 95% of all events — a Zipfian hot key far beyond the
  default fixture's 0.7). Runs market_stats plain vs blocked("auto") and
  preprocess tuned("auto"): the blocked forms' auto thresholds must engage
  on the hot key and beat the single-window plans.

Usage:
    python tools/scale_skew_run.py corpus [--hot-copies 5000] [--cap 200]
    python tools/scale_skew_run.py market <fixture_dir>
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_data_etl_spark.session import get_spark  # noqa: E402


def corpus_rung(hot_copies: int, cap: int) -> None:
    from crypto_market_data_etl_spark.operators.dedup import (
        lsh_bands,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )
    from crypto_market_data_etl_spark.materialize import materialize
    from crypto_market_data_etl_spark.schemas import load_table

    spark = get_spark(app_name="scale_skew_corpus")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    hot_text = docs.filter(F.col("doc_id") == 0).select("text").first()[0]
    hot = spark.range(hot_copies).select(
        (-F.col("id") - 1).alias("doc_id"), F.lit(hot_text).alias("text")
    )
    corpus = docs.unionByName(hot).repartition(32).localCheckpoint()
    n_docs = corpus.count()

    dropped_logs: list[str] = []
    n_hashes, rows_per_band = 15, 3
    t0 = time.time()
    sh = word_shingles(corpus, distinct=False)
    sig = materialize(minhash_signatures(sh, "doc_id", n_hashes))
    pairs = lsh_candidate_pairs(
        lsh_bands(sig, "doc_id", n_hashes, rows_per_band),
        max_bucket_size=cap,
        log_fn=dropped_logs.append,
    ).localCheckpoint()
    n_pairs = pairs.count()
    wall = round(time.time() - t0, 2)

    # connectivity: every hot member must appear in >= 1 pair (chain links)
    hot_ids_in_pairs = (
        pairs.select(F.col("id_a").alias("i"))
        .unionAll(pairs.select(F.col("id_b").alias("i")))
        .filter(F.col("i") < 0)
        .distinct()
        .count()
    )
    # the observation reporter polls in a daemon thread; give it a moment
    deadline = time.time() + 10
    while not dropped_logs and time.time() < deadline:
        time.sleep(0.2)
    m = re.search(r"dropped (\d+) membership", dropped_logs[0]) if dropped_logs else None
    print(
        json.dumps(
            {
                "job": "lsh_pairs_hot_bucket",
                "sec": wall,
                "docs": n_docs,
                "hot_copies": hot_copies,
                "cap": cap,
                "rows": n_pairs,
                "dropped_memberships": int(m.group(1)) if m else None,
                "hot_members_connected": hot_ids_in_pairs,
                "all_hot_connected": hot_ids_in_pairs == hot_copies,
            }
        ),
        flush=True,
    )
    spark.stop()


def market_rung(fixture_dir: str) -> None:
    from crypto_market_data_etl_spark.plans.reference_jobs import (
        market_stats_job,
        preprocess_job,
    )

    spark = get_spark(app_name="scale_skew_market")
    derive = lambda df: df.withColumn(  # noqa: E731
        "server_datetime", F.timestamp_millis(F.col("timestamp"))
    ).withColumn("time_diff", F.col("arrive_time") - F.col("timestamp") / 1000.0)
    trades = derive(spark.read.parquet(os.path.join(fixture_dir, "trades.parquet")))
    obs = derive(spark.read.parquet(os.path.join(fixture_dir, "orderbooks.parquet")))
    hot = (
        trades.groupBy("code").count().orderBy(F.col("count").desc()).first()
    )
    print(
        json.dumps(
            {
                "trades": trades.count(),
                "orderbooks": obs.count(),
                "hottest_code": hot["code"],
                "hottest_rows": hot["count"],
            }
        ),
        flush=True,
    )
    for name, thunk in [
        ("market_stats_plain", lambda: market_stats_job(obs).count()),
        (
            "market_stats_blocked",
            lambda: market_stats_job(obs, block_span="auto").count(),
        ),
        (
            "preprocess_job_tuned",
            lambda: preprocess_job(
                trades, obs, bar_size=3_000_000.0,
                block_span="auto", adaptive_asof="auto",
            ).count(),
        ),
    ]:
        # min-of-2: single samples on 8M-row window jobs swing ~2x on this
        # box (JIT warm-up + VM noise) and invert real crossovers
        walls, n = [], None
        for _ in range(2):
            t0 = time.time()
            n = thunk()
            walls.append(round(time.time() - t0, 2))
        print(
            json.dumps({"job": name, "sec": min(walls), "rows": n, "walls": walls}),
            flush=True,
        )
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("rung", choices=["corpus", "market"])
    ap.add_argument("fixture_dir", nargs="?", default="/tmp/market_fixture_skew")
    ap.add_argument("--hot-copies", type=int, default=5_000)
    ap.add_argument("--cap", type=int, default=200)
    args = ap.parse_args()
    if args.rung == "corpus":
        corpus_rung(args.hot_copies, args.cap)
    else:
        market_rung(args.fixture_dir)


if __name__ == "__main__":
    main()
