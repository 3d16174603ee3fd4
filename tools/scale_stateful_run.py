"""Stateful-streaming scale rung: per-key vs bucket-grouped update forms.

The s02 bench runs at sf0.1 (100k events, 1.5k keys); the bucketed rewrite's
claim is about the KEY-CARDINALITY axis — ``applyInPandasWithState`` invokes
the Python update once per grouping key per micro-batch, so the per-key
form's cost is O(distinct keys x batches) interpreter calls while the
bucketed form's is O(n_buckets x batches). This rung replays a synthetic
keyed stream at a ladder of key cardinalities (same event volume) through
BOTH forms of the stateful EWMA and prints one JSON line per run.

Equality of the two forms is pytest-gated (bit-for-bit, see
tests/test_streaming.py); this records WALLS only.

Usage: python tools/scale_stateful_run.py [--events 1000000]
           [--keys 1500,10000,50000] [--buckets 64] [--batches 4]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from crypto_market_data_etl_spark.session import (  # noqa: E402
    get_spark,
    state_partitions,
)
from crypto_market_data_etl_spark.streaming.stateful import (  # noqa: E402
    stateful_ewma,
    stateful_ewma_bucketed,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--keys", default="1500,10000,50000")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="scale_stateful")
    files = args.batches * 2  # maxFilesPerTrigger=2 -> args.batches batches

    for n_keys in [int(x) for x in args.keys.split(",")]:
        ev = spark.range(args.events).select(
            F.pmod(F.xxhash64("id"), F.lit(n_keys)).alias("user_id"),
            F.col("id").alias("ts_us"),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).cast("double") / 10.0).alias(
                "value"
            ),
        )
        tmp = tempfile.mkdtemp(prefix="scale_stateful_")
        src = os.path.join(tmp, "src")
        try:
            ev.repartition(files).write.parquet(src)
            schema = spark.read.parquet(src).schema

            def run(fn, parts, **kw):
                stream = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 2)
                    .parquet(src)
                )
                name = f"snk_{int(time.time() * 1000)}"
                t0 = time.time()
                with state_partitions(spark, parts):
                    q = (
                        fn(stream, key_col="user_id", **kw)
                        .writeStream.format("noop")
                        .outputMode("append")
                        .start()
                    )
                try:
                    q.processAllAvailable()
                finally:
                    q.stop()
                return time.time() - t0

            for label, fn, parts, kw in [
                ("per_key", stateful_ewma, 8, {}),
                (
                    "bucketed",
                    stateful_ewma_bucketed,
                    8,
                    {"n_buckets": args.buckets},
                ),
            ]:
                best = min(run(fn, parts, **kw) for _ in range(args.repeats))
                print(
                    json.dumps(
                        {
                            "job": f"stateful_ewma_{label}",
                            "keys": n_keys,
                            "events": args.events,
                            "batches": args.batches,
                            "sec": round(best, 2),
                            "events_per_sec": int(args.events / best),
                        }
                    ),
                    flush=True,
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
