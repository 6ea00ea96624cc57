"""Evidence that incremental_components' merge cost scales with the BATCH,
not the corpus: same fixed batch (10k new nodes, 10k edges into history)
merged into a 1M-row and a 4M-row history label relation. If history were
iterated or shuffled, wall would ~4x; the contraction design predicts ~flat
(history is scanned map-side twice — cost grows only with scan bytes).

Run:  python BENCH/incremental_scale.py
Writes one JSON line; committed runs land in BENCH/incremental_scale.json
and the narrative in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tbdedup_spark.operators import unionfind
from tbdedup_spark.session import get_spark

BATCH = 10_000
TRIALS = 3


def history_labels(spark, n):
    """Deterministic label relation: clusters of 4 consecutive ids — the
    shape of a prior connected_components output (min-label star), built
    directly so the measurement isolates the MERGE, not history's CC."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") - F.col("id") % 4).alias("cluster_id"),
    )


def batch_case(spark, n_hist):
    """10k new nodes; each edges to a deterministic pseudo-random history
    node (xxhash64 spread) and consecutive new nodes pair up — both
    batch-history and batch-batch edges exercised."""
    new_nodes = spark.range(n_hist, n_hist + BATCH).select(F.col("id").alias("doc_id"))
    to_hist = spark.range(n_hist, n_hist + BATCH).select(
        F.col("id").alias("a_id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(n_hist)).alias("b_id"),
    )
    to_new = spark.range(n_hist, n_hist + BATCH - 1, 2).select(
        F.col("id").alias("a_id"), (F.col("id") + 1).alias("b_id")
    )
    return new_nodes, to_hist.unionByName(to_new)


def run(spark, n_hist):
    hist = history_labels(spark, n_hist).localCheckpoint()
    new_nodes, new_edges = batch_case(spark, n_hist)
    walls = []
    for _ in range(TRIALS):
        t0 = time.time()
        out = unionfind.incremental_components(
            hist, new_nodes, new_edges, id_col="doc_id"
        )
        n = out.count()
        walls.append(time.time() - t0)
        assert n == n_hist + BATCH, (n, n_hist + BATCH)
    walls.sort()
    return walls[len(walls) // 2], walls


def main():
    spark = get_spark(app_name="incremental_scale")
    med_small, w_small = run(spark, 1_000_000)
    med_big, w_big = run(spark, 4_000_000)
    print(
        json.dumps(
            {
                "metric": "incremental_merge_wall_sec",
                "batch": BATCH,
                "trials": TRIALS,
                "hist_1m_median": round(med_small, 3),
                "hist_4m_median": round(med_big, 3),
                "hist_1m_walls": [round(w, 3) for w in w_small],
                "hist_4m_walls": [round(w, 3) for w in w_big],
                "ratio_4x_history": round(med_big / med_small, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
