"""Scale-rung 32-vs-8-core evidence for the corpus operator families
(VERDICT r15 "Next round" #1).

At sf0.1 the bench fixture is overhead-dominated — the driver's own 8-core
run BEAT its 32-core run (PERF_r15.json scaling block), so sf0.1 wall-clock
deltas can no longer evidence parallelism wins. This tool stands up a
probe rung per corpus family — the sf0.1 documents table replicated N×
(default 20×, 100k docs, shifted ids + per-replica text salt, same recipe
as tools/scale_corpus_run.py) — and times the heavy operators noop-sink
(guide §1.4) in FRESH child sessions at 32 and at 8 cores, interleaved
(32,8,32,8) so box drift cannot masquerade as a scaling ratio.

The corpus is checkpointed at a FIXED 64 partitions in every child, so the
work and its split count are identical across core counts — only the
executor slots differ.

Usage: python tools/scale_rung_r16.py [--reps 20] [--outer 2]
         [--inner 2] [--jobs a,b,...] [--cores 32,8]
         [--out SCALERUNG_r16.json]
Writes the JSON artifact with per-job walls per core count and the
low-core/high-core ratio (>1 = more cores genuinely help).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
reps = int(sys.argv[2])
jobs_arg = sys.argv[3].split(",")
inner = int(sys.argv[4])

from pyspark.sql import functions as F
from crypto_market_data_etl_spark.schemas import load_table
from crypto_market_data_etl_spark.session import get_spark
from crypto_market_data_etl_spark.operators.dedup import (
    chunk_dedup, minhash_jaccard_pairs, span_dedup,
)
from crypto_market_data_etl_spark.operators.contamination import (
    bloom_contamination_report, contamination_report, cross_corpus_neardup,
)
from crypto_market_data_etl_spark.operators.retrieval import bm25_topk
from crypto_market_data_etl_spark.operators.sampling import dsir_logratios
from crypto_market_data_etl_spark.operators.text import ngram_lm_scores

spark = get_spark(app_name="scale_rung_r16")
docs = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
big = None
for i in range(reps):
    r = docs.select(
        (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(f" rep{i}")).alias("text"),
    )
    big = r if big is None else big.unionByName(r)
# FIXED partition count: identical splits at every core count
big = big.repartition(64).localCheckpoint()
n = big.count()
print(f"# corpus: {n} docs ({reps}x sf0.1)", file=sys.stderr)

first = F.col("doc_id") < 1_000_000
queries = big.filter(first & (F.col("doc_id") % 29 == 3)).select(
    F.col("doc_id").alias("q_id"),
    F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 6)).alias("q_text"),
)
bench = big.filter(first & (F.col("doc_id") % 50 == 0)).localCheckpoint()
bench.count()

JOBS = {
    "x02_minhash_pairs": lambda: minhash_jaccard_pairs(big),
    "x22_contamination": lambda: contamination_report(big, bench),
    "x26_bloom_contamination": lambda: bloom_contamination_report(big, bench),
    "x28_chunk_dedup": lambda: chunk_dedup(big),
    "x36_ngram_lm": lambda: ngram_lm_scores(big),
    "x37_bm25_topk": lambda: bm25_topk(big, queries),
    "x38_cross_corpus_neardup": lambda: cross_corpus_neardup(big, bench),
    "x39_dsir_weights": lambda: dsir_logratios(big, F.col("doc_id") % 5 == 0),
    "x41_span_dedup": lambda: span_dedup(big),
}
out = {}
for name in jobs_arg:
    best = float("inf")
    for _ in range(inner):
        spark.sparkContext.setJobDescription(f"scale_rung:{name}")
        t0 = time.time()
        JOBS[name]().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    out[name] = round(best, 3)
    print(f"# {name}: {out[name]}s", file=sys.stderr)
print("RUNGRESULT " + json.dumps(out), flush=True)
spark.stop()
"""

DEFAULT_JOBS = (
    "x02_minhash_pairs,x22_contamination,x26_bloom_contamination,"
    "x28_chunk_dedup,x36_ngram_lm,x37_bm25_topk,x38_cross_corpus_neardup,"
    "x39_dsir_weights,x41_span_dedup"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20, help="corpus multiplier")
    ap.add_argument("--outer", type=int, default=2, help="interleaved child runs per core count")
    ap.add_argument("--inner", type=int, default=2, help="best-of-N inside each child")
    ap.add_argument("--jobs", default=DEFAULT_JOBS)
    ap.add_argument("--cores", default="32,8")
    ap.add_argument("--out", default=os.path.join(REPO, "SCALERUNG_r16.json"))
    args = ap.parse_args()

    child = "/tmp/scale_rung_child_r16.py"
    with open(child, "w") as f:
        f.write(CHILD)
    cores = [int(c) for c in args.cores.split(",")]
    results: dict[int, list[dict]] = {c: [] for c in cores}
    for rep in range(args.outer):
        for c in cores:  # interleaved: 32,8,32,8
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(c))
            p = subprocess.run(
                [sys.executable, child, REPO, str(args.reps), args.jobs,
                 str(args.inner)],
                capture_output=True, text=True, timeout=3600, env=env, cwd=REPO,
            )
            if p.returncode != 0:
                print(p.stderr[-3000:], file=sys.stderr)
                raise RuntimeError(f"cores={c} rep {rep} failed")
            line = next(
                ln for ln in p.stdout.splitlines() if ln.startswith("RUNGRESULT ")
            )
            d = json.loads(line[len("RUNGRESULT "):])
            results[c].append(d)
            print(json.dumps({"cores": c, "rep": rep, **d}), flush=True)

    hi, lo = max(cores), min(cores)
    summary = {
        "corpus_reps": args.reps,
        "n_docs": args.reps * 5000,
        "cores_high": hi,
        "cores_low": lo,
        "protocol": (
            f"interleaved fresh-session children ({','.join(map(str, cores))} "
            f"x{args.outer}), best-of-{args.inner} noop-sink walls per child, "
            "corpus checkpointed at fixed 64 partitions"
        ),
        "per_job": {},
    }
    for q in args.jobs.split(","):
        h = min(r[q] for r in results[hi])
        l = min(r[q] for r in results[lo])
        summary["per_job"][q] = {
            f"best_{hi}c": h,
            f"best_{lo}c": l,
            f"walls_{hi}c": [r[q] for r in results[hi]],
            f"walls_{lo}c": [r[q] for r in results[lo]],
            "low_over_high": round(l / h, 3),
        }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
