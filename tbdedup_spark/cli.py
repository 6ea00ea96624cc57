"""spark-submit entry point (north_rule: ships as a --py-files package).

Usage on a cluster:

    python make_pyfiles.py                       # builds dist/tbdedup_spark.zip
    spark-submit \
      --py-files dist/tbdedup_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.adaptive.skewJoin.enabled=true \
      dist/main.py --input <images table/path> --warehouse <dir> \
      [--config config.json]

In local mode (this sandbox): ``python -m tbdedup_spark.cli --input ... --warehouse ...``.

This replaces the reference's console-script + argparse dispatch
(tbdedup/cmd/__init__.py:37-199, setup.py:40-43): one subcommand-free CLI
because the preplan/plan/dedup phases are pipeline stages, not separate
invocations.
"""

from __future__ import annotations

import argparse
import json
import sys

from .plans.pipeline import DedupConfig, run_pipeline
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="tbdedup-spark")
    ap.add_argument("--input", required=True, help="parquet path / table of IMAGES rows")
    ap.add_argument("--warehouse", required=True, help="run-catalog directory")
    ap.add_argument("--config", help="JSON file overriding DedupConfig fields")
    ap.add_argument("--master", default=None, help="override master (default: env/local)")
    ap.add_argument("--hash-source", choices=["canonical", "disk"], default=None,
                    help="signature identity (the --msg-hash-source analog)")
    args = ap.parse_args(argv)

    overrides = {}
    if args.config:
        with open(args.config) as f:
            overrides.update(json.load(f))
    if args.hash_source:
        overrides["hash_source"] = args.hash_source
    config = DedupConfig(**overrides)

    spark = get_spark("tbdedup_spark", master=args.master)
    images = spark.read.parquet(args.input)
    out = run_pipeline(spark, images, args.warehouse, config)
    n = out["clusters"].count()
    reps = out["clusters"].filter("is_representative").count()
    print(json.dumps({"run_id": out["run_id"], "rows": n, "clusters": reps}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
