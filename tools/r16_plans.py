"""Capture .explain('formatted') for queries into plans/r16/.

Unlike r15_plans.py, this also captures the INPUT subplan of every
materialize() call made while building each query (via
SPARK_GRAFT_PLAN_CAPTURE_DIR — see materialize._capture_plan): a
localCheckpoint truncates lineage, so the top-level explain alone shows
`Scan ExistingRDD` where the expensive subtree used to be (VERDICT r15
"what's wrong #1" — the x02/x21/x38 in-row signature stage was invisible).

Usage: python tools/r16_plans.py before|after [query ...]
"""

from __future__ import annotations

import glob
import io
import os
import shutil
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    from crypto_market_data_etl_spark.session import get_spark

    spark = get_spark(app_name=f"r16_plans_{tag}")
    from crypto_market_data_etl_spark import plans

    qs = plans.all_queries()
    qs.update(plans.variant_queries())
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", "r16")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        cap = tempfile.mkdtemp(prefix=f"r16_plan_cap_{name}_")
        os.environ["SPARK_GRAFT_PLAN_CAPTURE_DIR"] = cap
        try:
            df = qs[name](spark, sf_dir)
        finally:
            os.environ.pop("SPARK_GRAFT_PLAN_CAPTURE_DIR", None)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        parts = [buf.getvalue()]
        for i, sub in enumerate(sorted(glob.glob(os.path.join(cap, "*.txt")))):
            with open(sub) as fh:
                parts.append(
                    f"\n===== materialize() input subplan {i} "
                    f"(pre-checkpoint lineage) =====\n" + fh.read()
                )
        shutil.rmtree(cap, ignore_errors=True)
        text = "".join(parts)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(text)
        print(f"wrote {name}_{tag}.txt ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
