"""Raw-CPU scaling calibration for this host — the hardware ceiling the
Spark scaling proxy (bench_scaling.py) is measured against.

Runs an identical pure-Python CPU-bound workload (no I/O, no IPC beyond
start/stop) under multiprocessing at N and 4N worker processes and
reports aggregate throughput at each plus the 4x scaling efficiency.
This is the number that says what the VM's cores can deliver AT ALL
between the two levels (shared caches, turbo/frequency behavior, noisy
neighbours) — Spark cannot scale better than this ceiling, so
BENCH/BASELINE.md quotes it next to the framework efficiency.

Usage: python bench_cpu_calibration.py [N] [seconds_per_level]
(defaults: N=2, ~8s per level, 3 alternating repeats, medians).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _spin(args) -> int:
    """Fixed CPU-bound work unit: integer hashing loop, ~pure ALU."""
    n_iters, seed = args
    h = seed
    for i in range(n_iters):
        h = (h * 1103515245 + 12345 + i) & 0x7FFFFFFFFFFFFFFF
    return h


def run_level(procs: int, n_tasks: int, iters: int) -> float:
    """Aggregate work-units/sec with ``procs`` workers."""
    with mp.Pool(procs) as pool:
        t0 = time.perf_counter()
        pool.map(_spin, [(iters, i) for i in range(n_tasks)], chunksize=1)
        dt = time.perf_counter() - t0
    return n_tasks / dt


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n4 = 4 * n
    iters = 2_000_000  # ~0.1-0.3s per task on typical VM cores
    # same TOTAL work per level, enough tasks that imbalance is ~2%
    n_tasks = n4 * 12
    _ = run_level(n4, n_tasks, iters)  # warm (page in, fork pool once)
    lo_runs, hi_runs = [], []
    for _ in range(3):
        lo_runs.append(run_level(n, n_tasks, iters))
        hi_runs.append(run_level(n4, n_tasks, iters))
    lo = sorted(lo_runs)[1]
    hi = sorted(hi_runs)[1]
    print(
        json.dumps(
            {
                "n_procs": n,
                "n4_procs": n4,
                "tasks_per_sec": {str(n): round(lo, 2), str(n4): round(hi, 2)},
                "runs": {str(n): lo_runs, str(n4): hi_runs},
                "cpu_scaling_efficiency": round(hi / lo / 4.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
