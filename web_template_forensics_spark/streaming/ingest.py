"""Structured Streaming ingestion surface.

The reference has no streaming path (SURVEY.md §2.9) and the north rule's
resumability is batch lineage (sources/catalog.py), so streaming here is
the ENGINE's ingestion extension: a crawl feed lands as micro-batches and
the same operators run over it. Three canonical shapes:

  * windowed_event_counts — watermarked tumbling-window aggregation
    (late data handled by the watermark, state bounded);
  * latest_state_stream — streaming as-of dedup: latest row per key via
    ``foreachBatch`` merge into the checkpointed catalog (exactly-once per
    batch since the merge is idempotent on (key, ts));
  * sessionize_events — the custom STATEFUL operator
    (``applyInPandasWithState`` + event-time timeout): gap-based crawl
    sessionization, stream==batch parity pytest-pinned against the
    oracled ``event_sessions`` query.

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


def sessionize_events(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "1 minutes",
) -> DataFrame:
    """Gap-based crawl sessionization — the custom STATEFUL streaming
    operator (``applyInPandasWithState``): semantics no windowed agg can
    express, since a session's extent is data-dependent (it ends only
    when the per-user event gap exceeds ``gap``).

    Per user key, state carries the one open session (start_us, last_us,
    n_events). Each micro-batch merges its (sorted) event times into the
    open session, emitting every session it closes; the open session is
    re-armed with an EVENT-TIME timeout at ``last + gap``, so once the
    watermark passes that point Spark calls back with ``hasTimedOut`` and
    the final session flushes — late data beyond the watermark can no
    longer reopen it. State is O(1) per active user (three int64s), the
    shuffle is the groupBy(user) hash partition only, and sessions for
    different users never communicate — linear scale-out in users.

    Output (append mode): user_id, session_start_us, session_end_us,
    n_events (epoch-microsecond longs).

    Two enforced preconditions (each a ValueError, not a silent drift):

    * ``watermark <= gap`` — this is what makes stream==batch parity
      exact: Spark's late filter admits only events with t >= wm, and an
      open session implies wm >= session_start - watermark_delay (the
      start event itself bounded the global max when it arrived), so
      every admitted late event lies within ``gap`` of the open session
      and the batch twin merges it identically. With watermark > gap an
      admitted event could precede session_start by more than the gap —
      merged here, split by the batch twin.
    * session timezone must be UTC (the engine session factory's
      default, session.py) — the NTZ->TIMESTAMP cast that feeds the
      watermark machinery reinterprets naive parquet timestamps in the
      session zone, so a non-UTC session would shift the emitted epoch
      micros relative to the batch twin's NTZ-safe arithmetic.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    if pd.Timedelta(watermark) > pd.Timedelta(gap):
        raise ValueError(
            f"watermark ({watermark}) must not exceed gap ({gap}): late "
            f"events admitted beyond the gap would merge into sessions "
            f"the batch semantics split (see docstring)"
        )
    tz = events_stream.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT"):
        raise ValueError(
            f"sessionize_events requires a UTC session timezone (got "
            f"{tz!r}): the NTZ cast feeding the watermark would shift "
            f"epoch output by the zone offset"
        )
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
        ]
    )

    def _row(user, start_us, last_us, n):
        return pd.DataFrame(
            {
                "user_id": pd.array([user], dtype="int64"),
                "session_start_us": pd.array([start_us], dtype="int64"),
                "session_end_us": pd.array([last_us], dtype="int64"),
                "n_events": pd.array([n], dtype="int64"),
            }
        )

    def fn(key, pdfs, state):
        user = int(key[0])
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield _row(user, start_us, last_us, n)
            return
        chunks = [pdf["_ts_us"] for pdf in pdfs]
        ts = (
            pd.concat(chunks).dropna().sort_values().astype("int64").to_numpy()
            if chunks
            else []
        )
        start_us = last_us = None
        n = 0
        if state.exists:
            start_us, last_us, n = state.get
        closed = []
        for t in ts:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us <= gap_us:
                # late (out-of-order) events still inside the watermark
                # merge into the open session, extending it backwards if
                # they precede its start — the standard streaming
                # sessionization semantic (a stream cannot retroactively
                # split a session it never observed in order)
                start_us = min(start_us, t)
                last_us = max(last_us, t)
                n += 1
            else:
                closed.append((user, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
        if start_us is not None:
            state.update((int(start_us), int(last_us), int(n)))
            # event-time timeout: fire once the watermark passes the gap
            # after the last event (clamped above the current watermark —
            # Spark rejects timeouts at/behind it).
            timeout_ms = max(
                last_us // 1000 + gap_us // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": pd.array([c[0] for c in closed], dtype="int64"),
                    "session_start_us": pd.array([c[1] for c in closed], dtype="int64"),
                    "session_end_us": pd.array([c[2] for c in closed], dtype="int64"),
                    "n_events": pd.array([c[3] for c in closed], dtype="int64"),
                }
            )

    ev = events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    ev = ev.withWatermark(ts_col, watermark).withColumn(
        "_ts_us", F.unix_micros(F.col(ts_col))
    )
    return ev.groupBy(F.col(user_col)).applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
