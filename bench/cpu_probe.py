"""Host CPU-scaling ceiling probe — Spark-free calibration for the N→4N
efficiency numbers in BENCH/BASELINE.md.

Runs a FIXED amount of pure-CPU work (tight arithmetic loop, no memory
pressure, no writes) across a process pool at 1, N and 4N workers and
reports the measured speedups. Whatever efficiency this probe reaches at
N→4N is the HOST'S ceiling: no framework can scale better than bare
processes doing arithmetic. On this sandbox the probe consistently lands
well under 1.0 at 8→32 (SMT siblings / host sharing), which calibrates
every engine efficiency below it.

Usage: python bench/cpu_probe.py [repeats]   # prints one JSON line
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ProcessPoolExecutor

WORK = 6_000_000
TASKS = 96
N_SMALL, N_LARGE = 8, 32


def burn(n: int) -> float:
    s = 0.0
    for i in range(n):
        s += (i % 7) * 0.5
    return s


_MEM = None


def burn_mem(n_pass: int) -> float:
    """Memory-bandwidth-bound fixed work: repeated whole-array reductions
    over a 64 MiB per-process buffer (allocated once per worker, so the
    sandbox's first-touch fault tax is excluded from the timed passes).
    String-heavy engine phases (tokenize, Arrow transfer, shuffle) are
    bandwidth-bound, not ALU-bound — this ceiling is the one they see."""
    global _MEM
    import numpy as np

    if _MEM is None:
        _MEM = np.arange(8 * 1024 * 1024, dtype=np.float64)  # 64 MiB
        float(_MEM.sum())  # fault in
    s = 0.0
    for _ in range(n_pass):
        s += float(_MEM.sum())
    return s


MEM_PASSES = 40


def measure(workers: int, tasks: int = TASKS, fn=burn, work: int = WORK) -> float:
    t0 = time.perf_counter()
    with ProcessPoolExecutor(max_workers=workers) as p:
        list(p.map(fn, [work] * tasks))
    return time.perf_counter() - t0


def probe(repeats: int = 3, fn=burn, work: int = WORK) -> dict:
    best = {}
    for w in (1, N_SMALL, N_LARGE):
        best[w] = min(measure(w, fn=fn, work=work) for _ in range(repeats))
    eff_n = (best[1] / best[N_SMALL]) / N_SMALL
    eff_4n = (best[N_SMALL] / best[N_LARGE]) / (N_LARGE / N_SMALL)
    return {
        "t1": round(best[1], 2),
        "t8": round(best[N_SMALL], 2),
        "t32": round(best[N_LARGE], 2),
        "eff_1_to_8": round(eff_n, 3),
        "ceiling_eff_8_to_32": round(eff_4n, 3),
    }


def probe_membw(repeats: int = 3) -> dict:
    return probe(repeats, fn=burn_mem, work=MEM_PASSES)


if __name__ == "__main__":
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {"cpu": probe(repeats), "membw": probe_membw(repeats)}
    print(json.dumps(out))
