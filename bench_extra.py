"""Round-7 optimization harness (bench.py is FROZEN for measurement; this
file holds the extra instrumentation the optimization guide §1 asks for).

Isolates named declared queries with the noop sink (times the computation,
not the sink), on the SAME local-cluster substrate bench.py uses, labels
jobs, and optionally dumps .explain("formatted") to a file.

Usage:
  python bench_extra.py [--sf DIR] [--cpus N] [--repeats N] \
         [--explain-dir plans/r07] [--suffix _before] query [query ...]

Prints one JSON line: {"queries": {name: [wall_s per pass, ...]}, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--explain-after", action="store_true",
                    help="dump the plan AFTER one execution (AQE final plan incl. ReusedExchange)")
    ap.add_argument("--mode", default="cluster", choices=["cluster", "threads"])
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from web_template_forensics_spark.session import cluster_conf, get_spark

    if args.mode == "cluster":
        master, extra = cluster_conf(args.cpus)
        spark = get_spark(
            "bench_extra", cores=args.cpus, shuffle_partitions=max(args.cpus, 8),
            master=master, extra_conf=extra,
        )
    else:
        spark = get_spark("bench_extra", cores=args.cpus,
                          shuffle_partitions=max(args.cpus, 8))

    from web_template_forensics_spark.plans.cascade_queries import CASCADE_QUERIES
    from web_template_forensics_spark.plans.queries import QUERIES

    all_q = {**QUERIES, **CASCADE_QUERIES}

    # same warmup as bench.py: python-worker imports + codegen/parquet init
    from web_template_forensics_spark.functions.text_udfs import token_count_udf

    spark.range(0, args.cpus * 10, 1, args.cpus).selectExpr("cast(id as string) s").select(
        token_count_udf("s")
    ).count()
    spark.read.parquet(f"{args.sf}/region.parquet").groupBy().count().first()

    out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = all_q[name]
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, args.sf)
            if args.explain_after:
                df.write.format("noop").mode("overwrite").save()
            with open(os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        walls = []
        for rep in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name}[{rep}]")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            print(f"# {name}[{rep}]: {walls[-1]}s", file=sys.stderr)
        out[name] = walls
    spark.stop()
    print(json.dumps({"sf": args.sf, "cpus": args.cpus, "mode": args.mode,
                      "queries": out}), flush=True)


if __name__ == "__main__":
    main()
