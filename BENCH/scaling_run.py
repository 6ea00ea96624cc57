"""One scaling measurement: run the full dedup pipeline at a given
parallelism on a pre-generated corpus; print one JSON line.

Run in a fresh process per parallelism level so each measurement gets a cold
JVM (no warm-code carryover between the local[8] and local[32] runs)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tbdedup_spark.plans.pipeline import DedupConfig, run_pipeline
from tbdedup_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--input", required=True)
    ap.add_argument("--warehouse", required=True)
    args = ap.parse_args()

    spark = get_spark(
        f"scaling_{args.cpus}", master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,  # same partition-per-core ratio both runs
    )
    images = spark.read.parquet(args.input)
    n = images.count()  # warm the file listing; not part of the measured run

    # Warm-up (excluded from the timer, identical at both levels): spawn the
    # python-worker pool, JIT the hot codegen paths, touch the shuffle
    # machinery. Real clusters run on long-lived executors; cold-JVM costs
    # are a local-mode artifact, not part of the scaling claim.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _w_fn(b):  # no type hints: `from __future__ import annotations`
        return b.apply(len)  # stringifies hints and breaks inference

    _w = pandas_udf(_w_fn, "long")
    warm = images.limit(args.cpus * 64)
    warm.select(_w(F.col("bytes")).alias("x")).groupBy((F.col("x") % 7).alias("g")).count().collect()

    t0 = time.time()
    out = run_pipeline(spark, images, args.warehouse, DedupConfig())
    n_clusters = out["clusters"].select("cluster_id").distinct().count()
    wall = time.time() - t0

    print(json.dumps({
        "cpus": args.cpus,
        "rows": n,
        "wall_s": round(wall, 2),
        "images_per_sec": round(n / wall, 1),
        "n_clusters": n_clusters,
        "run_id": out["run_id"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
