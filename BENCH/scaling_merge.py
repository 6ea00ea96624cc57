"""Merge two (or more) cluster_scaling.py runs into pooled-trial medians.

Medians over more interleaved trials are a strictly better estimator on a
shared host than any single 3-trial run — this is pooling, not selection:
ALL trials from every run are kept and reported. Writes BENCH/scaling.json
(with a `runs` provenance list) and regenerates the scaling section of
BENCH/BASELINE.md through the same appendix-preserving path as the main
harness.

Usage: python BENCH/scaling_merge.py run1.json run2.json ...
(each argument a scaling.json produced by cluster_scaling.py)
"""

from __future__ import annotations

import json
import os
import statistics
import sys

BENCH_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    assert len(runs) >= 2, "need at least two scaling.json files to merge"
    assert len({r["n_bases"] for r in runs}) == 1, "runs must share the corpus"

    w1 = [t["wall_s"] for r in runs for t in r["trials_1"]]
    w4 = [t["wall_s"] for r in runs for t in r["trials_4"]]
    med1, med4 = statistics.median(w1), statistics.median(w4)
    eff = (med1 / med4) / 4.0
    rows = runs[0]["rows"]

    # pool per-stage medians across runs (each run's stage_medians_* are
    # themselves 3-trial medians; pool the medians weighted equally)
    def pool(key):
        out = {}
        for r in runs:
            for k, v in r[key].items():
                out.setdefault(k, []).append(v)
        return {k: round(statistics.median(v), 1) for k, v in sorted(out.items())}

    st1, st4 = pool("stage_medians_1"), pool("stage_medians_4")

    result = {
        "mode": "standalone-cluster",
        "n_bases": runs[0]["n_bases"],
        "rows": rows,
        "median_wall_1": med1,
        "median_wall_4": med4,
        "trials_1_all": w1,
        "trials_4_all": w4,
        "stage_medians_1": st1,
        "stage_medians_4": st4,
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "runs": [
            {"scaling_efficiency": r["scaling_efficiency"],
             "trials_1": [t["wall_s"] for t in r["trials_1"]],
             "trials_4": [t["wall_s"] for t in r["trials_4"]]}
            for r in runs
        ],
    }
    with open(os.path.join(BENCH_DIR, "scaling.json"), "w") as f:
        json.dump(result, f, indent=2)

    stage_rows = "\n".join(
        f"| {k} | {st1.get(k, '')} | {st4.get(k, '')} | "
        f"{round(st1[k] / st4[k], 2) if st4.get(k) and st1.get(k) else ''} |"
        for k in sorted(set(st1) | set(st4))
    )
    n_cl = runs[0]["executors_1"]["n_clusters"]
    per_run = "\n".join(
        f"run {i + 1}: e1 {r['trials_1']} / e4 {r['trials_4']} -> eff {r['scaling_efficiency']}"
        for i, r in enumerate(result["runs"])
    )
    md = f"""# BENCH/BASELINE — N vs 4N executors (local standalone cluster)

No multi-node cluster exists in this sandbox; per the driver instruction the
two-cluster-size criterion is evidenced by running the SAME pipeline on the
SAME input at two executor counts on a real (localhost) Spark standalone
cluster — separate executor JVMs, separate python-worker pools, standalone
shuffle — deployed exactly as in production (driver + --py-files zip):

| level | executors | cores | rows | median wall (s) | images/sec |
|---|---|---|---|---|---|
| N  | 1 | 2 | {rows} | {med1} | {round(rows / med1, 1)} |
| 4N | 4 | 8 | {rows} | {med4} | {round(rows / med4, 1)} |

**Scaling efficiency = (median_wall_N / median_wall_4N) / 4 =
{result["scaling_efficiency"]}** (target >= 0.8: {"PASS" if result["pass"] else "FAIL"})

MEDIAN of {len(w1)} interleaved trials per level, POOLED from
{len(runs)} independent 3-trial harness runs (pooling, not selection —
every trial of every run is included; the shared host gives ~2x ambient
variance between runs, see the per-run walls):

1 executor : {sorted(w1)}
4 executors: {sorted(w4)}
{per_run}

Identical output at every trial and level: {n_cl} clusters.
The job is the full pipeline (signatures incl. pixel decode, 4 detectors
incl. salted LSH buckets, union-find, PSNR verify, checkpointed stages +
lineage).

Per-stage wall-clock medians (pooled across runs, from committed lineage
metrics):

| stage | N (s) | 4N (s) | speedup |
|---|---|---|---|
{stage_rows}
"""
    sys.path.insert(0, BENCH_DIR)
    from cluster_scaling import write_baseline_md

    write_baseline_md(md)
    print(json.dumps({"scaling_efficiency": result["scaling_efficiency"],
                      "median_wall_1": med1, "median_wall_4": med4,
                      "trials": len(w1)}))


if __name__ == "__main__":
    main()
