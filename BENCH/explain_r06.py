"""Capture .explain('formatted') for declared queries into plans/r06/.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python BENCH/explain_r06.py <tag> q1 q2 ...

Writes plans/r06/<query>_<tag>.txt for each query. NOTE: some queries execute
work eagerly at build time (localCheckpoints, union-find iterations), so this
costs roughly one run of each query.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry_mod
from tbdedup_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(ROOT, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("tbdedup_explain_r06", master=f"local[{cpus}]", shuffle_partitions=cpus)
    queries = entry_mod.queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"explain:{name}")
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
