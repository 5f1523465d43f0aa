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


def latest_state_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
):
    """foreachBatch updater keeping the latest event per key in a driver-
    side dict (demo sink; on a cluster this is a MERGE INTO an Iceberg
    table keyed on ``key_col``). Returns (query_starter, state_dict)."""
    state: dict = {}

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql.window import Window

        w = Window.partitionBy(key_col).orderBy(F.col(ts_col).desc())
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .collect()
        )
        for row in latest:
            cur = state.get(row[key_col])
            if cur is None or row[ts_col] >= cur[ts_col]:
                state[row[key_col]] = row

    def start(checkpoint_dir: str):
        return (
            events_stream.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(upsert)
            .start()
        )

    return start, state
