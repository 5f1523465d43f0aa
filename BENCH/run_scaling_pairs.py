"""Probe-bracketed N-vs-4N scaling pairs — the round-5 protocol.

Round-4 residue: the 500k-page leg's 8-pair median (0.736) fell below
the 0.8 bar in host windows whose CONCURRENTLY-measured raw-process
capacity was itself degraded (0.743–0.836), and the attribution, while
credible, was assembled after the fact. This runner makes the host
probe a first-class part of every pair, so the reported number is
defined independent of the host lottery BEFORE anyone looks at the
Spark results:

  probe -> level A -> level B -> probe        (A/B order alternates
                                               pair-to-pair: ABBA)

* The probe is pure ``multiprocessing`` (no Spark, no JVM): K parallel
  OS processes each burning a fixed CPU-bound loop; its lo->hi
  efficiency is the host's own parallel-process ceiling at that moment.
* A pair is annotated ``host_degraded`` when EITHER bracketing probe
  reads < 0.85 — the threshold below which the host cannot express a
  0.8 Spark efficiency even in principle (the Spark job inherits the
  same process-scheduling ceiling the probe measures).
* The summary reports BOTH medians: all pairs, and probe-conditioned
  (host-degraded pairs excluded). The conditioned median is the
  headline; the unconditioned one is kept so nothing is hidden.

Usage:
    python BENCH/run_scaling_pairs.py <n_pairs> <rows> [lo] [hi] [job]
defaults lo=2 hi=8 (one-core executor JVMs, local-cluster substrate);
job = pipeline (BENCH/scaling.py, rows = pages) or curation
(BENCH/curation_scaling.py, rows = docs; round 6). Appends one JSON
line per pair to BENCH/scaling_runs_r6[_<job>].jsonl and prints the
summary JSON last.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_DEGRADED_BELOW = 0.85

JOBS = {
    # script, throughput key, level-invariant output keys
    "pipeline": ("scaling.py", "pages_per_sec", ("geocoded", "pip_assignments", "tiles")),
    "curation": ("curation_scaling.py", "docs_per_sec", ("reasons",)),
}


def _burn(_: int) -> float:
    t0 = time.perf_counter()
    n = 0
    for i in range(12_000_000):
        n += i * i
    return time.perf_counter() - t0


def _probe_level(k: int) -> float:
    """Parallel-overlap efficiency of k raw processes (1.0 = perfect)."""
    with mp.Pool(k) as pool:
        t0 = time.perf_counter()
        per = pool.map(_burn, range(k))
        wall = time.perf_counter() - t0
    return sum(per) / k / wall


def probe_pair_efficiency(lo: int, hi: int) -> dict:
    """Host lo->hi process-scaling efficiency right now (no Spark)."""
    e_lo = _probe_level(lo)
    e_hi = _probe_level(hi)
    return {
        "eff_lo": round(e_lo, 3),
        "eff_hi": round(e_hi, 3),
        "pair_eff": round(e_hi / e_lo, 3),
    }


def run_level(cores: int, pages: int, script: str = "scaling.py") -> dict:
    """One fresh-process run of the job script at one level; parses its
    one JSON line (stdout is clean of Spark noise since round 5 —
    progress bars off, deploy loggers at ERROR, JSON printed after
    stop)."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "BENCH", script),
         str(cores), str(pages), "cluster"],
        capture_output=True, text=True, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"scaling.py {cores} failed rc={proc.returncode}: "
            f"{proc.stderr[-500:]}"
        )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON line in scaling.py output: {proc.stdout[-500:]}")


def main() -> None:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    lo = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    hi = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    job = sys.argv[5] if len(sys.argv) > 5 else "pipeline"
    script, tkey, okeys = JOBS[job]
    runs_path = os.path.join(
        REPO, "BENCH",
        "scaling_runs_r6.jsonl" if job == "pipeline"
        else f"scaling_runs_r6_{job}.jsonl",
    )

    # r5 verdict ask #6: the session's FIRST pair read 0.584 in a clean
    # probe window — cold page-cache / JIT asymmetry between the two
    # levels. One UNRECORDED warmup run at each level (small page count:
    # enough to page in parquet + warm codegen paths, cheap enough not
    # to matter) before pair 0 keeps that asymmetry out of the record.
    warm_pages = min(pages, 100_000)
    print(
        f"# pre-warm: one unrecorded run at each level ({warm_pages} pages)",
        file=sys.stderr,
    )
    for cores in (lo, hi):
        run_level(cores, warm_pages, script)

    pairs = []
    for i in range(n_pairs):
        probe_pre = probe_pair_efficiency(lo, hi)
        # ABBA: alternate level order so slow host drift cancels in the
        # pair medians instead of biasing one level
        order = [lo, hi] if i % 2 == 0 else [hi, lo]
        results = {}
        for cores in order:
            results[cores] = run_level(cores, pages, script)
        probe_post = probe_pair_efficiency(lo, hi)
        t_lo, t_hi = results[lo][tkey], results[hi][tkey]
        eff = (t_hi / t_lo) / (hi / lo)
        min_probe = min(probe_pre["pair_eff"], probe_post["pair_eff"])
        rec = {
            "pair": i,
            "pages": pages,
            "lo": lo,
            "hi": hi,
            "order": order,
            "pps_lo": t_lo,
            "pps_hi": t_hi,
            "efficiency": round(eff, 3),
            "probe_pre": probe_pre,
            "probe_post": probe_post,
            "host_degraded": min_probe < PROBE_DEGRADED_BELOW,
            "outputs": {
                k: {kk: results[k][kk] for kk in okeys} for k in results
            },
        }
        pairs.append(rec)
        with open(runs_path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    effs = [p["efficiency"] for p in pairs]
    kept = [p["efficiency"] for p in pairs if not p["host_degraded"]]
    lo_med = statistics.median(p["pps_lo"] for p in pairs)
    hi_med = statistics.median(p["pps_hi"] for p in pairs)
    summary = {
        "metric": "scaling_efficiency",
        "job": job,
        "pages": pages,
        "levels": [lo, hi],
        "n_pairs": n_pairs,
        "n_host_degraded": sum(p["host_degraded"] for p in pairs),
        "median_pair_eff_all": round(statistics.median(effs), 3),
        "median_pair_eff_probe_conditioned":
            round(statistics.median(kept), 3) if kept else None,
        "median_of_levels_eff": round((hi_med / lo_med) / (hi / lo), 3),
        "probe_threshold": PROBE_DEGRADED_BELOW,
    }
    with open(runs_path, "a") as fh:
        fh.write(json.dumps(summary) + "\n")
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
