"""One-time guest-memory fault-in for snapshot-restored sandbox VMs.

Diagnosis (round 2): this sandbox is a microVM restored from a snapshot
with lazy (userfaultfd-style) memory backing. The FIRST touch of a cold
guest-physical page is serviced by a host handler at ~15-60 MB/s and the
handler is effectively serial — measured: 512 MB first-touch fill 35.9 s
(0.01 GB/s) vs 0.11 s (4.5 GB/s) refilling the same freed pages; 16-way
parallel fault-in still only ~0.06 GB/s aggregate. Every fresh allocation
(JVM heap growth, Arrow buffers, python objects, tmpfs writes) pays this
once per page, which makes cold-pool runs non-scaling (the fault handler,
not CPU, is the bottleneck) and explains multi-x run-to-run variance.

Remedy: touch a large block of anonymous memory once per VM boot and free
it — the kernel then recycles already-backed pages for every later
workload. Run before benchmarking:

    python bench/prefault.py [GB]

This is a sandbox-measurement concern only; a real cluster does not have
lazily-backed memory (and each executor has its own memory bus).
"""

from __future__ import annotations

import sys
import time


def prefault(gb: int, chunk_mb: int = 1024) -> None:
    import numpy as np

    t0 = time.perf_counter()
    touched = 0
    hold = []
    for _ in range(gb * 1024 // chunk_mb):
        a = np.empty(chunk_mb * 1024 * 1024, dtype=np.uint8)
        a[::4096] = 1  # touch every 4 KiB page
        hold.append(a)
        touched += chunk_mb
        if touched % 4096 == 0:
            rate = touched / 1024 / (time.perf_counter() - t0)
            print(f"  {touched // 1024} GiB touched ({rate:.2f} GB/s)", flush=True)
    dt = time.perf_counter() - t0
    print(f"prefaulted {touched / 1024:.0f} GiB in {dt:.0f}s "
          f"({touched / 1024 / dt:.2f} GB/s)")
    del hold


if __name__ == "__main__":
    prefault(int(sys.argv[1]) if len(sys.argv) > 1 else 48)
