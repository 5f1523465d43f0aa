"""spark-submit entry point for the pages pipeline.

Cluster usage (the north-rule ship shape):
    zip -r engine.zip web_template_forensics_spark
    spark-submit --py-files engine.zip jobs/run_pipeline.py \
        --pages 1000000 --out /path/to/sink --cores 32

In this sandbox, ``--cores N`` selects local[N]; on a real cluster drop
it and let --master/--num-executors come from spark-submit. A killed run
re-invoked with the same --out resumes from the per-bucket lineage
markers without recomputing committed buckets.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# allow running without --py-files when launched from the repo checkout
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_repo_root, "web_template_forensics_spark")):
    sys.path.insert(0, _repo_root)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--verify-text", action="store_true")
    args = ap.parse_args()

    from web_template_forensics_spark.session import get_spark
    from web_template_forensics_spark.plans.pipeline import run_pages_pipeline

    spark = get_spark("pages-pipeline", cores=args.cores)
    t0 = time.perf_counter()
    stats = run_pages_pipeline(
        spark,
        n_pages=args.pages,
        seed=args.seed,
        out_dir=args.out,
        verify_text=args.verify_text,
    )
    wall = time.perf_counter() - t0
    stats["wall_sec"] = round(wall, 2)
    stats["pages_per_sec"] = round(args.pages / wall, 1)
    print(json.dumps(stats))


if __name__ == "__main__":
    sys.exit(main())
