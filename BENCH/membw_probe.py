"""Host memory-bandwidth / CPU scaling probe — context for scaling runs.

The N-vs-4N scaling harness (cluster_scaling.py) measures the ENGINE, but it
runs on one physical host, so its efficiency number is bounded above by how
the host itself scales when 4x the processes demand CPU and memory
bandwidth. The two are very different resources here:

* CPU-bound work (zlib over a cache-resident 1 MB buffer) scales ~linearly
  to 24+ procs on every host this sandbox has handed us.
* Memory-bandwidth-bound work (streaming a 64 MB uint8 -> float32 cast, far
  over L3) saturates much earlier — on the round-5 host, total throughput
  PEAKS near 8 procs and FALLS at 16 (scaling factor ~0.4 vs 2 procs).

The dedup pipeline's hot stages (pixel decode, hashing over multi-MB image
buffers in Arrow-batched python workers) sit between the two extremes: at
the 4N level (4 executors x 2 cores) there are 8 JVM task threads + 8
python workers = up to 16 memory-hungry processes, past this host's
bandwidth knee, while the N level (2+2 = 4 procs) sits inside the linear
region. Event-log analysis of the round-5 trials shows the engine itself
near-perfectly scheduled (>=96% core occupancy at 4N; idle ~4%): the
efficiency lost between N and 4N is core-seconds INFLATION — the same task
DAG costs ~25% more core-seconds at 16 hot procs than at 4 — i.e. the
single-host memory wall, not shuffle/skew/stragglers. A real multi-node
cluster gives each executor its own memory controllers, so this contention
term does not exist across machines; per the harness's published principle
(pick levels inside the host's linear region so the measurement isolates
the engine), the linear-region configuration is SCALE_EXEC_CORES=1
(N = 1 core + 1 python worker = 2 procs; 4N = 4 + 4 = 8 procs, at the knee
but before the fall).

Run:  python BENCH/membw_probe.py   (~1 min, prints one JSON line)
Committed outputs live in BENCH/BASELINE.md's scaling appendix.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time
import zlib


def _cpu_worker(dur: float, q) -> None:
    import numpy as np

    data = np.random.RandomState(7).bytes(1 << 20)  # fixed seed: same work every run
    n = 0
    t0 = time.time()
    while time.time() - t0 < dur:
        zlib.compress(data, 6)
        n += 1
    q.put(n)


def _membw_worker(dur: float, q) -> None:
    import numpy as np

    # 64 MB working set: far beyond any per-core L3 slice, so the cast below
    # streams through DRAM (read 64 MB, write 256 MB per iteration).
    a = np.random.RandomState(7).randint(0, 255, size=(64 << 20,), dtype=np.uint8)
    n = 0
    t0 = time.time()
    while time.time() - t0 < dur:
        b = a.astype(np.float32)
        float(b[:: 4096].sum())  # consume so the cast isn't elided
        n += 1
    q.put(n)


def measure(worker, procs: int, dur: float) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(dur, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    tot = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return tot / dur


def main() -> None:
    dur = 6.0
    levels = (2, 4, 8, 16)
    out: dict = {"probe": "membw_vs_cpu_scaling", "duration_s": dur}
    for name, worker in (("cpu_zlib", _cpu_worker), ("membw_cast64mb", _membw_worker)):
        rates = {p: measure(worker, p, dur) for p in levels}
        base = rates[levels[0]]
        out[name] = {
            "total_per_s": {p: round(r, 1) for p, r in rates.items()},
            # scaling factor vs the 2-proc point (1.0 = linear)
            "scaling_vs_2": {
                p: round((rates[p] / base) / (p / levels[0]), 3) for p in levels
            },
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
