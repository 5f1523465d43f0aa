"""Iceberg-style table layout on plain parquet (no Iceberg jar offline).

Layout of a checkpointed table at ``path``:
    data/bucket=<N>/*.parquet        bucketed data files
    _lineage/bucket-<N>.json         per-partition done marker + metrics
    _snapshots/snap-<k>.json         snapshot: committed buckets + totals

The north rule's resumability contract: a killed job re-run with the same
inputs skips every bucket whose lineage marker exists and only recomputes
the missing ones; the final table is identical either way. On a real
cluster the same shape maps 1:1 onto Iceberg partitioned writes +
snapshot metadata — this module is the offline stand-in, kept behind a
small API so `writeTo(...)`-style code can swap in.

Buckets are ``pmod(xxhash64(key), n_buckets)`` — deterministic, so the
same row always lands in the same bucket across runs and cluster sizes.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class BucketStatus:
    bucket: int
    rows: int
    bytes: int
    wall_sec: float


def _lineage_dir(path: str) -> str:
    return os.path.join(path, "_lineage")


def _data_dir(path: str) -> str:
    return os.path.join(path, "data")


def done_buckets(path: str) -> set[int]:
    d = _lineage_dir(path)
    if not os.path.isdir(d):
        return set()
    out = set()
    for f in os.listdir(d):
        if f.startswith("bucket-") and f.endswith(".json"):
            out.add(int(f[len("bucket-"):-len(".json")]))
    return out


def write_bucket_marker(path: str, status: BucketStatus) -> None:
    os.makedirs(_lineage_dir(path), exist_ok=True)
    marker = os.path.join(_lineage_dir(path), f"bucket-{status.bucket}.json")
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "bucket": status.bucket,
                "rows": status.rows,
                "bytes": status.bytes,
                "wall_sec": status.wall_sec,
                "committed_at": "deterministic",  # no wall clock in metadata
            },
            fh,
        )
    os.replace(tmp, marker)


def write_snapshot(path: str, n_buckets: int) -> dict:
    """Aggregate lineage into a snapshot manifest (metrics table rows)."""
    lineage = []
    for b in sorted(done_buckets(path)):
        with open(os.path.join(_lineage_dir(path), f"bucket-{b}.json")) as fh:
            lineage.append(json.load(fh))
    snap = {
        "n_buckets": n_buckets,
        "committed_buckets": len(lineage),
        "total_rows": sum(x["rows"] for x in lineage),
        "total_bytes": sum(x["bytes"] for x in lineage),
        "lineage": lineage,
    }
    sdir = os.path.join(path, "_snapshots")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, f"snap-{len(lineage)}.json"), "w") as fh:
        json.dump(snap, fh)
    return snap


def checkpointed_write(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int = 32,
    fail_after: int | None = None,
) -> dict:
    """Resumable bucketed write with per-partition lineage + metrics.

    Computes only the buckets without done markers. At 100 TB each bucket
    is an Iceberg partition: the normal path writes ALL pending buckets in
    ONE Spark job (``partitionBy`` + dynamic partition overwrite — only the
    pending buckets' directories are touched, committed ones are never in
    the frame), then commits one lineage marker per bucket. ``fail_after``
    switches to a sequential per-bucket loop and kills the job after N
    buckets — the kill/resume test path.
    """
    bucket_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    done = done_buckets(path)
    todo = [b for b in range(n_buckets) if b not in done]
    if not todo:
        return write_snapshot(path, n_buckets)
    bdf = df.withColumn("bucket", bucket_expr)
    if len(todo) < n_buckets:
        bdf = bdf.filter(F.col("bucket").isin(todo))
    if fail_after is None:
        t0 = time.perf_counter()
        (
            # co-locate each bucket into one task -> one file per bucket
            # (instead of n_tasks x n_buckets small files)
            bdf.repartition(len(todo), F.col("bucket"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(_data_dir(path))
        )
        wall = time.perf_counter() - t0
        per = round(wall / max(1, len(todo)), 4)
        # row/byte metrics from the written parquet footers (driver-side
        # metadata read) — one Spark job total instead of a separate
        # groupBy-sizes job + a persist of the whole frame
        for b in todo:
            rows, nbytes = _bucket_stats(os.path.join(_data_dir(path), f"bucket={b}"))
            write_bucket_marker(path, BucketStatus(b, rows, nbytes, per))
    else:
        bdf = bdf.persist()  # per-bucket loop re-reads the frame
        written = 0
        for b in todo:
            t0 = time.perf_counter()
            part = bdf.filter(F.col("bucket") == b).drop("bucket")
            out = os.path.join(_data_dir(path), f"bucket={b}")
            part.write.mode("overwrite").parquet(out)
            rows, nbytes = _bucket_stats(out)
            write_bucket_marker(
                path,
                BucketStatus(b, rows, nbytes, round(time.perf_counter() - t0, 3)),
            )
            written += 1
            if written >= fail_after:
                bdf.unpersist()
                raise RuntimeError(f"injected failure after {written} buckets")
        bdf.unpersist()
    return write_snapshot(path, n_buckets)


def _bucket_stats(bucket_dir: str) -> tuple[int, int]:
    """(rows, bytes) of one written bucket from parquet footers + file
    sizes — pure driver-side metadata, no Spark job."""
    import pyarrow.parquet as pq

    rows = 0
    nbytes = 0
    if not os.path.isdir(bucket_dir):
        return 0, 0
    for f in os.listdir(bucket_dir):
        if not f.endswith(".parquet"):
            continue
        fp = os.path.join(bucket_dir, f)
        rows += pq.ParquetFile(fp).metadata.num_rows
        nbytes += os.path.getsize(fp)
    return rows, nbytes


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(_data_dir(path)))
