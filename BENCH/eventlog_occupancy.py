"""Core-occupancy audit of a scaling trial from its Spark event log.

Answers the one question the wall-clock ratio cannot: when N-vs-4N
efficiency drops, is the ENGINE leaving cores idle (scheduling gaps,
stragglers, driver-serial sections — fixable), or are the cores busy and
each unit of work simply costing more core-seconds (host-level contention —
not an engine property)?

For every task in the log it accumulates launch/finish intervals, sweeps
the timeline from the first pipeline job (the warm-up jobs before the
`stage signatures` job group are excluded), and reports:

* wall seconds of the swept region,
* capacity = cores x wall (core-seconds),
* busy core-seconds (area under the #running-tasks curve, clipped at cores),
* idle core-seconds split into `no_tasks_running` (driver-serial: planning,
  AQE re-optimization, job-submission gaps) vs `task_tail` (stages running
  with fewer tasks than cores — stragglers, low-parallelism stages),
* core-second inflation vs a reference log of the same job at another level
  (run twice and compare `busy_core_s`).

Round-5 measurements that motivated this tool (host after a recycle, quiet
steal): the 4-executor trials showed >=96% occupancy (idle ~4%, of which
~2% driver gaps and ~1% one broadcast-subquery straggler tail) while busy
core-seconds INFLATED ~26% vs the 1-executor run of the same job — i.e.
the efficiency gap is the host memory wall (see membw_probe.py), not
scheduling. Usage:

  python BENCH/eventlog_occupancy.py /tmp/spark-events/eventlog_v2_app-*/events_1_* [cores]

Accepts .zstd event logs (decompressed via the system zstd binary) or plain
JSON-lines files; prints one JSON line.
"""

from __future__ import annotations

import collections
import json
import shutil
import subprocess
import sys


def read_lines(path: str):
    if path.endswith(".zstd"):
        zstd = shutil.which("zstd")
        assert zstd, "system zstd binary required for .zstd event logs"
        p = subprocess.Popen([zstd, "-dc", path], stdout=subprocess.PIPE, text=True)
        yield from p.stdout
        p.wait()
    else:
        with open(path) as f:
            yield from f


def analyze(path: str, cores: int) -> dict:
    tasks = []  # (launch_ms, finish_ms)
    jobs = {}
    first_pipeline_job_t = None
    max_concurrent_seen = 0
    for line in read_lines(path):
        try:
            e = json.loads(line)
        except ValueError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerTaskEnd":
            ti = e["Task Info"]
            tasks.append((ti["Launch Time"], ti["Finish Time"]))
        elif ev == "SparkListenerJobStart":
            props = e.get("Properties") or {}
            desc = props.get("spark.job.description") or props.get(
                "spark.jobGroup.id", ""
            )
            jobs[e["Job ID"]] = e["Submission Time"]
            # cluster_run.py wraps pipeline stages in job groups/descriptions
            # beginning with "stage "; everything before is warm-up
            if first_pipeline_job_t is None and str(desc).startswith("stage "):
                first_pipeline_job_t = e["Submission Time"]
    t_start = first_pipeline_job_t or min(jobs.values())
    evs = []
    for l, f in tasks:
        if f <= t_start:
            continue
        evs.append((max(l, t_start), 1))
        evs.append((f, -1))
    evs.sort()
    cur = 0
    last = t_start
    busy = idle_no_tasks = idle_tail = wall = 0.0
    for t, delta in evs:
        dt = (t - last) / 1000.0
        if dt > 0:
            running = min(cur, cores)
            busy += running * dt
            if cur == 0:
                idle_no_tasks += (cores - running) * dt
            else:
                idle_tail += (cores - running) * dt
            wall += dt
        last = t
        cur += delta
        max_concurrent_seen = max(max_concurrent_seen, cur)
    cap = cores * wall
    return {
        "log": path,
        "cores": cores,
        "swept_wall_s": round(wall, 1),
        "capacity_core_s": round(cap, 1),
        "busy_core_s": round(busy, 1),
        "idle_core_s": round(cap - busy, 1),
        "idle_pct": round(100.0 * (cap - busy) / cap, 2) if cap else None,
        "idle_driver_gaps_core_s": round(idle_no_tasks, 1),
        "idle_task_tail_core_s": round(idle_tail, 1),
        "max_concurrent_tasks": max_concurrent_seen,
        "n_tasks": len(tasks),
    }


def main() -> None:
    path = sys.argv[1]
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    print(json.dumps(analyze(path, cores)))


if __name__ == "__main__":
    main()
