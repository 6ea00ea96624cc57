"""Pool bench.py JSON lines from independent runs, and emit the linearity table.

Two modes:

  python BENCH/bench_pool.py run1.json run2.json [...] -o pooled.json
      Pool N independent bench.py runs (each already a per-query median of
      its own trials) into the committed reference file: per-query value =
      median of the run medians, spread = union of the runs' [min, max],
      run_totals/steal kept as provenance. Pooling, not selection — every
      supplied run is included.

  python BENCH/bench_pool.py --curve pooled_sf0.1.json pooled_sf1.json
      Print the BASELINE.md markdown table comparing the two SF points on
      medians AND per-query quiet floors (min across all pooled trials).

Rationale (BENCH/PLANS.md round-5): ambient hypervisor steal melts single
trials 3-4x on barrier-heavy queries, so no single run is trustworthy; the
committed numbers must be pooled medians with per-run provenance.
"""

from __future__ import annotations

import argparse
import json
import statistics

# BASELINE.md table layout: detector/primitive queries one row each, the
# cheap relational queries folded into one aggregate row.
RELATIONAL = [
    "group_agg",
    "topk_per_group",
    "topk_per_group_salted",
    "rolling_agg",
    "asof_join",
    "broadcast_join_agg",
    "sessionize",
]


def pool(paths: list[str]) -> dict:
    runs = [json.load(open(p)) for p in paths]
    names = list(runs[0]["queries"])
    for r in runs[1:]:
        if list(r["queries"]) != names:
            raise SystemExit("runs disagree on query list; refusing to pool")
    queries, spread = {}, {}
    for q in names:
        queries[q] = round(statistics.median(r["queries"][q] for r in runs), 3)
        lo = min(r.get("spread", {}).get(q, [r["queries"][q]])[0] for r in runs)
        hi = max(r.get("spread", {}).get(q, [r["queries"][q]])[-1] for r in runs)
        spread[q] = [lo, hi]
    n = len(runs)
    out = {
        "metric": runs[0]["metric"],
        "value": round(sum(queries.values()), 3),
        "unit": runs[0].get("unit", "sec"),
        "queries": queries,
        "trials": sum(r.get("trials", 1) for r in runs),
        "pooling": (
            f"median of {n} independent {runs[0].get('trials', 1)}-trial run"
            " medians per query; spread = union of per-run [min,max]; slow"
            " tails are hypervisor steal (see BENCH/PLANS.md)"
        ),
        "run_totals": [r["value"] for r in runs],
        "spread": spread,
        "sf": runs[0]["sf"],
        "warmup": runs[0].get("warmup", True),
    }
    steals = [r["steal_pct_max"] for r in runs if "steal_pct_max" in r]
    if steals:
        out["steal_pct_max"] = max(steals)
    return out


def curve(path_small: str, path_big: str) -> None:
    a, b = json.load(open(path_small)), json.load(open(path_big))
    # same refusal pool() gives: a KeyError mid-table is useless feedback
    qa, qb = set(a["queries"]), set(b["queries"])
    rel = set(RELATIONAL)
    if qa != qb or not (qa >= rel):
        raise SystemExit(
            "curve: runs disagree on query list — only in "
            f"{path_small}: {sorted(qa - qb)}; only in {path_big}: "
            f"{sorted(qb - qa)}; RELATIONAL missing: {sorted(rel - qa)}"
        )

    def emit(name, m01, m1, f01, f1, bold=False):
        w = "**" if bold else ""
        print(
            f"| {w}{name}{w} | {w}{m01:.2f}{w} | {w}{m1:.2f}{w} |"
            f" {w}{m1 / m01:.1f}x{w} | {w}{f01:.2f}{w} | {w}{f1:.2f}{w} |"
            f" {w}{f1 / f01:.1f}x{w} |"
        )

    print("| query | med sf0.1 | med sf1 | ratio | floor sf0.1 | floor sf1 | ratio |")
    print("|---|---|---|---|---|---|---|")
    tot = [0.0, 0.0, 0.0, 0.0]
    for q in a["queries"]:
        if q in RELATIONAL:
            continue
        vals = (a["queries"][q], b["queries"][q], a["spread"][q][0], b["spread"][q][0])
        emit(q, *vals)
        tot = [t + v for t, v in zip(tot, vals)]
    rel = (
        sum(a["queries"][q] for q in RELATIONAL),
        sum(b["queries"][q] for q in RELATIONAL),
        sum(a["spread"][q][0] for q in RELATIONAL),
        sum(b["spread"][q][0] for q in RELATIONAL),
    )
    emit(f"relational ({len(RELATIONAL)} queries)", *rel)
    tot = [t + v for t, v in zip(tot, rel)]
    emit("total", *tot, bold=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+")
    ap.add_argument("-o", "--out")
    ap.add_argument("--curve", action="store_true", help="print the BASELINE.md table")
    args = ap.parse_args()
    if args.curve:
        if len(args.paths) != 2:
            raise SystemExit("--curve needs exactly two pooled files: sf0.1 sf1")
        curve(*args.paths)
        return
    pooled = pool(args.paths)
    line = json.dumps(pooled)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
