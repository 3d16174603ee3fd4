"""Capture .explain('formatted') for headline queries into plans/r15/.

Usage: python tools/r15_plans.py before|after [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    from crypto_market_data_etl_spark.session import get_spark

    spark = get_spark(app_name=f"r15_plans_{tag}")
    from crypto_market_data_etl_spark import plans

    qs = plans.all_queries()
    qs.update(plans.variant_queries())
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", "r15")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {name}_{tag}.txt ({len(buf.getvalue())} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
