"""Host-health probe: single-JVM task-thread scaling vs raw processes.

Motivation (round 2): the pages-pipeline scaling pair regressed badly at
local[16] while per-core Python throughput IMPROVED — the probe isolates
the cause. It runs (a) a pure-JVM codegen loop (no Python workers) at
several local[N] levels and (b) a raw multiprocessing control, printing
per-core throughput for each. On a healthy host both are ~flat in N; on
this round's sandbox the JVM collapses above ~8-12 task threads while 32
raw processes scale at ~0.9+ — i.e. a single-process thread-scaling
pathology of the host, not an engine property. Used to pick the N / 4N
pair for BENCH/BASELINE.md and to document the degraded pairs.

Usage: python BENCH/jvm_probe.py [levels...]   (default 2 4 8 12 16 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _burn(_: int) -> float:
    t0 = time.perf_counter()
    n = 0
    for i in range(2_000_000):
        n += i * i
    return time.perf_counter() - t0


def jvm_level(cores: int) -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from pyspark.sql import functions as F

    from web_template_forensics_spark.session import get_spark

    spark = get_spark(f"jvm-probe-{cores}", cores=cores, shuffle_partitions=cores)
    spark.range(10).count()  # warm
    n = 10_000_000 * cores
    t0 = time.perf_counter()
    (
        spark.range(0, n, 1, cores * 2)
        .select(
            F.count(
                F.when(F.xxhash64(F.sha2(F.col("id").cast("string"), 256)) % 2 == 0, 1)
            )
        )
        .collect()
    )
    wall = time.perf_counter() - t0
    spark.stop()
    return {
        "cores": cores,
        "wall_sec": round(wall, 1),
        "rows_per_core_sec_M": round(n / cores / wall / 1e6, 2),
    }


def main() -> None:
    levels = [int(x) for x in sys.argv[1:]] or [2, 4, 8, 12, 16, 32]
    out = {"jvm": [], "mp_control": None}
    for c in levels:
        r = jvm_level(c)
        out["jvm"].append(r)
        print(json.dumps(r), flush=True)
    # raw-process control: same box, 32 independent python processes
    t0 = time.perf_counter()
    with mp.Pool(32) as pool:
        per = pool.map(_burn, range(32))
    wall = time.perf_counter() - t0
    # eff = mean busy time per proc / wall (1.0 = perfect 32-wide overlap)
    out["mp_control"] = {
        "procs": 32,
        "wall_sec": round(wall, 2),
        "parallel_eff": round(sum(per) / 32 / wall, 2),
    }
    print(json.dumps(out["mp_control"]), flush=True)


if __name__ == "__main__":
    main()
