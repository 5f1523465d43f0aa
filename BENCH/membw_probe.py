"""Parallel memory-BANDWIDTH probe — the second axis of host health.

BENCH/jvm_probe.py and the run_scaling_pairs bracketing probe burn a
CPU-register loop: they measure parallel CPU-cycle capacity and read
healthy (0.9+) even when memory-bound workloads cannot scale. This
probe measures the axis those miss: aggregate DRAM throughput of K
processes each sweeping a 200 MB buffer (read + write per pass).

Round-6 motivation: the curation-pipeline scaling leg
(BENCH/curation_scaling.py) reads ~0.60-0.63 at 2-vs-8 executors in
CPU-probe-clean windows, and its shuffle-free map stage (gram explode,
string-allocation heavy) alone reads 0.67. This probe explains both:
the host's parallel memory bandwidth scales at ~0.75 from 2 to 8
processes (measured 5.2 -> 15.6 GB/s), so a bandwidth-bound job's
ceiling IS ~0.75 before Spark executes a single task — the leg runs at
~0.84-0.9 of the ceiling, consistent with the CPU-bound pipeline leg's
0.9 host-relative record.

Usage: python BENCH/membw_probe.py [lo] [hi]   (defaults 2 8)
Prints one JSON line with per-level aggregate GB/s and the lo->hi
scaling efficiency.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

_BUF_BYTES = 200_000_000
_SECONDS = 6.0


def _burn_sweep(_: int) -> float:
    """In-place full-array read+write: pure DRAM bandwidth, zero
    allocation. Measured on this host: scales ~0.9 from 2 to 8 procs in
    healthy windows (19 -> 72 GB/s), with occasional 0.6 windows."""
    import numpy as np

    buf = np.ones(_BUF_BYTES, dtype=np.uint8)  # ones: physically faulted in
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < _SECONDS:
        buf += 1
        n += 1
    return n * buf.nbytes / (time.perf_counter() - t0)


def _burn_alloc(_: int) -> float:
    """Fresh 200 MB allocation per pass (buf = buf + 1): the
    allocation-rate-bound regime — every pass is malloc/mmap + write
    faults + free. Measured on this host: COLLAPSES at 8 procs in most
    windows (aggregate 0.3-0.6 GB/s vs 5-6 GB/s at 2 procs, efficiency
    0.01-0.05) — concurrent large-page allocation serializes in the
    kernel/hypervisor. Allocation-heavy Spark stages (string explode,
    GC-churning aggs) inherit a ceiling between the two regimes."""
    import numpy as np

    buf = np.ones(_BUF_BYTES, dtype=np.uint8)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < _SECONDS:
        buf = buf + 1
        n += 1
    return n * buf.nbytes / (time.perf_counter() - t0)


def aggregate_gbps(k: int, fn) -> float:
    with mp.Pool(k) as pool:
        rates = pool.map(fn, range(k))
    return sum(rates) / 1e9


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    out = {"metric": "parallel_membw"}
    for name, fn in (("sweep", _burn_sweep), ("alloc", _burn_alloc)):
        g_lo = aggregate_gbps(lo, fn)
        g_hi = aggregate_gbps(hi, fn)
        out[name] = {
            str(lo): round(g_lo, 2),
            str(hi): round(g_hi, 2),
            "efficiency": round((g_hi / g_lo) / (hi / lo), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
