#!/usr/bin/env python
"""Hardware scaling-ceiling calibration for the N-vs-4N protocol.

A single box cannot demonstrate cluster scaling: going 8 → 32 local
threads multiplies CPU parallelism but NOT memory bandwidth, while a real
N → 4N executor cluster multiplies both.  This script measures, with no
Spark involved, what efficiency ANY workload can show on this box:

* cpu_burn    — pure integer arithmetic, no memory traffic: the best case.
* memcpy_burn — 8 MB buffer copies, pure memory traffic: the worst case.

Efficiency := (throughput_32 / throughput_8) / 4.  A pipeline whose
measured efficiency reaches the cpu_burn ceiling is scaling as well as
this hardware allows; its distance to the memcpy floor shows how much of
its work is memory-bound.  bench.py --scaling embeds these numbers in
BENCH/BASELINE.md so the ratio is reproducible: run

    python scripts/scaling_calibration.py

Output: one JSON line {"cpu": {...}, "memcpy": {...}}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

# Sized so one confined cal run spans ~8-12 s — comparable to the Spark
# measurement windows it is paired against.  With the earlier 30M-iter
# (~3 s) burns, a hypervisor-neighbour burst could land inside the 8-25 s
# Spark window but miss the short cal window entirely, so the paired
# estimator failed to cancel exactly the stalls it exists to cancel
# (observed: paired rounds bimodal 0.3/0.9 on stall nights).
CPU_ITERS = 90_000_000
MEMCPY_BUF_MB = 8
MEMCPY_COPIES = 400


def _cpu_task(_):
    acc = 0
    for i in range(CPU_ITERS):
        acc = (acc + i * 2654435761) & 0xFFFFFFFF
    return acc


def _memcpy_task(_):
    buf = bytearray(MEMCPY_BUF_MB * 1024 * 1024)
    view = bytes(buf)
    for _i in range(MEMCPY_COPIES):
        buf[:] = view
    return len(buf)


from contextlib import contextmanager


@contextmanager
def confined(nproc: int):
    """Pin this process (and children spawned inside) to cores 0..nproc-1 —
    the same cpuset discipline the Spark trials get from ``taskset``, so
    the ceiling and the measurement see identical core budgets."""
    import os

    old = os.sched_getaffinity(0)
    os.sched_setaffinity(0, set(range(nproc)))
    try:
        yield
    finally:
        os.sched_setaffinity(0, old)


def _run(task, nproc: int) -> float:
    """Wall seconds to complete nproc copies of task on nproc processes."""
    with mp.get_context("spawn").Pool(nproc) as pool:
        t0 = time.time()
        pool.map(task, range(nproc))
        return time.time() - t0


def run_once(task, nproc: int) -> float:
    """One confined measurement → work-units per second."""
    with confined(nproc):
        sec = _run(task, nproc)
    return nproc / sec


def efficiency(task, trials: int = 3) -> dict:
    rates = {8: [], 32: []}
    for _t in range(trials):
        for n in (8, 32):
            rates[n].append(run_once(task, n))
    import statistics

    med8 = statistics.median(rates[8])
    med32 = statistics.median(rates[32])
    return {
        "rate8": round(med8, 3),
        "rate32": round(med32, 3),
        "efficiency": round((med32 / med8) / 4, 4),
    }


def main() -> dict:
    return {
        "cpu": efficiency(_cpu_task),
        "memcpy": efficiency(_memcpy_task),
    }


if __name__ == "__main__":
    print(json.dumps(main()))
