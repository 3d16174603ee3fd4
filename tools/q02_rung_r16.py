"""q02 pre-aggregate scale-rung A/B (VERDICT r15 "Next round" #2).

At every local SF the pruned orders projection broadcasts, so the r16
orderkey pre-aggregate arm (guide §2.3) never engages on the bench — by
design. This rung replicates lineitem+orders 20x (shifted orderkeys,
o_custkey preserved so the customer join still hits), which pushes the
pruned orders estimate past the 10 MB broadcast threshold: both arms then
plan a real SortMergeJoin on orderkey, and the A/B isolates exactly the
question the rewrite answers — is shuffling one pre-reduced (rev, cnt) row
per order cheaper than shuffling every lineitem row into the join?

Arms run as interleaved fresh-session children (on,off,on,off), best-of-N
noop-sink walls. Emits one JSON line per child and a summary.

Usage: python tools/q02_rung_r16.py [--reps 20] [--outer 2] [--inner 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNG_DIR = "/tmp/q02_rung_r16"

PREP = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
rung = sys.argv[2]
reps = int(sys.argv[3])
from pyspark.sql import functions as F
from crypto_market_data_etl_spark.schemas import load_table
from crypto_market_data_etl_spark.session import get_spark
spark = get_spark(app_name="q02_rung_prep")
sf = "/root/testdata/sf0.1"
for name, keys in (("lineitem", ["l_orderkey"]), ("orders", ["o_orderkey"])):
    t = load_table(spark, sf, name)
    big = None
    for i in range(reps):
        r = t
        for kcol in keys:
            r = r.withColumn(kcol, F.col(kcol) + F.lit(i * 10_000_000))
        big = r if big is None else big.unionByName(r)
    big.repartition(64).write.mode("overwrite").parquet(f"{rung}/{name}.parquet")
    print(f"# {name}: {spark.read.parquet(f'{rung}/{name}.parquet').count()} rows",
          file=sys.stderr)
for name in ("customer", "nation", "region"):
    load_table(spark, sf, name).write.mode("overwrite").parquet(
        f"{rung}/{name}.parquet")
spark.stop()
print("PREP_OK")
"""

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
rung = sys.argv[2]
inner = int(sys.argv[3])
from crypto_market_data_etl_spark.session import get_spark
from crypto_market_data_etl_spark.plans.core import q02_revenue_by_nation
spark = get_spark(app_name="q02_rung_ab")
# warm the file index/JIT on an untimed build+run
q02_revenue_by_nation(spark, rung).write.format("noop").mode("overwrite").save()
best, walls = float("inf"), []
for _ in range(inner):
    t0 = time.time()
    q02_revenue_by_nation(spark, rung).write.format("noop").mode("overwrite").save()
    w = time.time() - t0
    walls.append(round(w, 3))
    best = min(best, w)
plan = q02_revenue_by_nation(spark, rung)._jdf.queryExecution().executedPlan().toString()
print("ABRESULT " + json.dumps({
    "best": round(best, 3), "walls": walls,
    "smj": plan.count("SortMergeJoin"),
    "preagg_in_plan": "l_orderkey" in plan and "HashAggregate" in plan.split("SortMergeJoin")[0],
    "exchanges": plan.count("Exchange hashpartitioning"),
}), flush=True)
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--outer", type=int, default=2)
    ap.add_argument("--inner", type=int, default=3)
    args = ap.parse_args()

    prep = "/tmp/q02_rung_prep.py"
    child = "/tmp/q02_rung_child.py"
    with open(prep, "w") as f:
        f.write(PREP)
    with open(child, "w") as f:
        f.write(CHILD)
    if not os.path.exists(os.path.join(RUNG_DIR, "region.parquet")):
        p = subprocess.run(
            [sys.executable, prep, REPO, RUNG_DIR, str(args.reps)],
            capture_output=True, text=True, timeout=1200, cwd=REPO,
        )
        if "PREP_OK" not in p.stdout:
            print(p.stderr[-3000:], file=sys.stderr)
            raise RuntimeError("prep failed")
        print(p.stderr.strip(), file=sys.stderr)

    results: dict[str, list[dict]] = {"on": [], "off": []}
    for rep in range(args.outer):
        for arm in ("on", "off"):
            env = dict(os.environ, SPARK_GRAFT_Q02_PREAGG=arm)
            p = subprocess.run(
                [sys.executable, child, REPO, RUNG_DIR, str(args.inner)],
                capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
            )
            if p.returncode != 0:
                print(p.stderr[-3000:], file=sys.stderr)
                raise RuntimeError(f"arm {arm} rep {rep} failed")
            line = next(
                ln for ln in p.stdout.splitlines() if ln.startswith("ABRESULT ")
            )
            d = json.loads(line[len("ABRESULT "):])
            results[arm].append(d)
            print(json.dumps({"arm": arm, "rep": rep, **d}), flush=True)

    summary = {
        "job": "summary",
        "reps": args.reps,
        "on_best": min(r["best"] for r in results["on"]),
        "off_best": min(r["best"] for r in results["off"]),
        "on_walls": [w for r in results["on"] for w in r["walls"]],
        "off_walls": [w for r in results["off"] for w in r["walls"]],
    }
    summary["on_over_off"] = round(summary["on_best"] / summary["off_best"], 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
