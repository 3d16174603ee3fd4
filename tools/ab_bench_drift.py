"""Round-over-round bench-drift A/B (round-9, closes the round-8 watch
items): x32_semantic_dedup +27%, x21_dup_clusters +27%,
x26_bloom_contamination +19% (and ride-along x34 +18%, x36 +17%) between
BENCH_r07 and BENCH_r08 — on bench-path code that did NOT change between
the rounds. Per the established protocol (ROADMAP / the x02 template),
"environmental" may only be claimed with interleaved same-box A/B numbers.

Protocol: a git worktree of the r07 bench commit (shape A) vs the current
tree (shape B); ABAB-interleaved subprocess runs on the same box, each
subprocess a fresh Spark session that warms the tables then times each
query best-of-N exactly like bench.py (collect + session hygiene between
reps). The recorded value per shape is the overall best across the
interleaved processes; the per-process spread is the noise band.

Reading: if best(A) ~ best(B) per query (both trees time the same today),
the r07->r08 delta was box state, not code — "environmental, with
numbers". A consistent gap instead names a real regression to bisect.

Usage: python tools/ab_bench_drift.py [--ref a9632c0] [--reps 3]
       [--queries x32_semantic_dedup,x21_dup_clusters,...]
Emits one JSON line per (shape, process-rep) and a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_QUERIES = (
    "x32_semantic_dedup,x21_dup_clusters,x26_bloom_contamination,"
    "x34_domain_mixture,x36_ngram_lm"
)

#: runs inside a fresh interpreter with the TREE under test at sys.path[0]
CHILD = r"""
import json, os, sys, time
tree = sys.argv[1]
queries = sys.argv[2].split(",")
inner_reps = int(sys.argv[3])
sys.path.insert(0, tree)
from crypto_market_data_etl_spark.session import get_spark
from crypto_market_data_etl_spark import plans
from crypto_market_data_etl_spark.schemas import TESTDATA_TABLES, load_table

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab_bench_drift")
for t in TESTDATA_TABLES:
    try:
        load_table(spark, sf_dir, t).count()
    except Exception as exc:
        # pre-r2 trees (e.g. the r01 x02-baseline shape) can't read
        # events.parquet's TIMESTAMP(NANOS) ts; fine as long as the
        # queries under test don't touch the unreadable table. Print it —
        # a missing sf dir / corrupt parquet must not silently leave the
        # fixture un-warmed or the run on a broken table
        print(f"# warm-up skip {t}: {type(exc).__name__}: {exc}", file=sys.stderr)
qs = plans.all_queries()
# pre-r5 trees (e.g. the r01 bench commit, the x02 baseline shape) have
# no variant registry yet
if hasattr(plans, "variant_queries"):
    qs.update(plans.variant_queries())
out = {}
for name in queries:
    best = float("inf")
    for _ in range(inner_reps):
        t0 = time.time()
        len(qs[name](spark, sf_dir).collect())
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    out[name] = round(best, 3)
print("ABRESULT " + json.dumps(out), flush=True)
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="a9632c0", help="shape-A commit (r07 bench state)")
    ap.add_argument("--reps", type=int, default=3, help="interleaved process reps per shape")
    ap.add_argument("--inner-reps", type=int, default=3, help="best-of-N inside each process")
    ap.add_argument("--queries", default=DEFAULT_QUERIES)
    args = ap.parse_args()

    wt = "/tmp/ab_bench_shape_a"
    if os.path.exists(wt):
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO)
        shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, args.ref], cwd=REPO, check=True
    )
    child = "/tmp/ab_bench_child.py"
    with open(child, "w") as f:
        f.write(CHILD)

    shapes = [("A_" + args.ref, wt), ("B_head", REPO)]
    results: dict[str, list[dict]] = {name: [] for name, _ in shapes}
    try:
        for rep in range(args.reps):
            for name, tree in shapes:  # interleaved: ABAB...
                p = subprocess.run(
                    [sys.executable, child, tree, args.queries, str(args.inner_reps)],
                    capture_output=True, text=True, timeout=1800, cwd=tree,
                )
                if p.returncode != 0:
                    print(p.stderr[-3000:], file=sys.stderr)
                    raise RuntimeError(f"shape {name} rep {rep} failed")
                line = next(
                    ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")
                )
                d = json.loads(line[len("ABRESULT "):])
                results[name].append(d)
                print(json.dumps({"job": name, "rep": rep, **d}), flush=True)
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt], cwd=REPO)

    qnames = args.queries.split(",")
    summary = {"job": "summary", "queries": {}}
    for q in qnames:
        a = [r[q] for r in results[shapes[0][0]]]
        b = [r[q] for r in results[shapes[1][0]]]
        summary["queries"][q] = {
            "A_best": min(a), "A_walls": a,
            "B_best": min(b), "B_walls": b,
            "B_over_A": round(min(b) / min(a), 3),
        }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
