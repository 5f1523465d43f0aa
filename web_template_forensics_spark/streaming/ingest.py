"""Structured Streaming ingestion surface.

The reference has no streaming path (SURVEY.md §2.9) and the north rule's
resumability is batch lineage (sources/catalog.py), so streaming here is
the ENGINE's ingestion extension: a crawl feed lands as micro-batches and
the same operators run over it. Two canonical shapes:

  * windowed_event_counts — watermarked tumbling-window aggregation
    (late data handled by the watermark, state bounded);
  * latest_state_stream — streaming as-of dedup: latest row per key via
    ``foreachBatch`` merge into the checkpointed catalog (exactly-once per
    batch since the merge is idempotent on (key, ts)).

Tested with the parquet source + ``processAllAvailable`` (synchronous
drain) — the pattern is identical on kafka/file sources on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts + value sums."""
    # watermarks require TIMESTAMP (LTZ); parquet NTZ columns are cast in
    # the session timezone (pinned UTC by the session factory)
    events_stream = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def merge_upsert_latest(
    batch_df: DataFrame,
    table_path: str,
    key_col: str,
    ts_col: str,
    n_buckets: int = 16,
) -> None:
    """MERGE a micro-batch into the bucketed state table at ``table_path``
    keeping the latest row per key (the Iceberg ``MERGE INTO`` shape on
    the offline catalog layout of sources/catalog.py).

    Only the buckets TOUCHED by the batch are read back and rewritten
    (dynamic partition overwrite) — merge cost is O(batch ∪ touched
    state), never O(full table). Idempotent under foreachBatch epoch
    replay: keep-latest of (old state ∪ batch) after (key, ts) dedup is a
    fixed point, so re-running a delivered batch leaves the table
    unchanged (exactly-once effect per epoch).
    """
    import os

    from pyspark.sql.window import Window

    spark = batch_df.sparkSession
    bucket = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets))
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).desc())
    latest = (
        batch_df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .withColumn("bucket", bucket)
    )
    data_dir = os.path.join(table_path, "data")
    if os.path.isdir(data_dir):
        touched = [r["bucket"] for r in latest.select("bucket").distinct().collect()]
        if not touched:
            return
        existing = (
            spark.read.option("basePath", data_dir)
            .parquet(*[
                os.path.join(data_dir, f"bucket={b}")
                for b in touched
                if os.path.isdir(os.path.join(data_dir, f"bucket={b}"))
            ])
            if any(os.path.isdir(os.path.join(data_dir, f"bucket={b}")) for b in touched)
            else None
        )
        merged = latest if existing is None else existing.unionByName(latest)
    else:
        merged = latest
    merged = (
        merged.dropDuplicates([key_col, ts_col])
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    (
        merged.repartition(F.col("bucket"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(data_dir)
    )


def latest_state_stream(
    events_stream: DataFrame,
    table_path: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 16,
):
    """Streaming as-of dedup with a REAL sink: every micro-batch is
    MERGEd into the bucketed state table (merge_upsert_latest) instead of
    a driver-side dict. Returns (query_starter, read_state):
    ``read_state(spark)`` reads the current latest-per-key table."""

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        merge_upsert_latest(batch_df, table_path, key_col, ts_col, n_buckets)

    def start(checkpoint_dir: str):
        return (
            events_stream.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(upsert)
            .start()
        )

    def read_state(spark):
        import os

        return spark.read.parquet(os.path.join(table_path, "data")).drop("bucket")

    return start, read_state
