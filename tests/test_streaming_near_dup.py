"""Streaming SimHash near-dup (streaming/near_dup.py): stream == batch
parity across micro-batch splits, kill/resume through the state store,
and replay idempotence at the distinct face."""

from __future__ import annotations

import glob
import os
import shutil

import pytest

from web_template_forensics_spark.operators.dedup import simhash_near_dup_pairs
from web_template_forensics_spark.streaming.near_dup import simhash_pairs_stream

SRC = "/root/testdata/sf0.001/documents.parquet"


def _batch_pairs(spark):
    docs = spark.read.parquet(SRC)
    return {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }


def _write_splits(spark, work: str, n_splits: int) -> list[str]:
    docs = spark.read.parquet(SRC)
    files = []
    for k in range(n_splits):
        sub = os.path.join(work, f"h{k}")
        docs.filter(f"doc_id % {n_splits} = {k}").coalesce(1).write.parquet(sub)
        files.append(glob.glob(os.path.join(sub, "*.parquet"))[0])
    return files


def _start(spark, indir: str, ck: str, name: str):
    docs = spark.read.parquet(SRC)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    return (
        simhash_pairs_stream(stream, "doc_id", "text", max_hamming=3)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )


def _drained(spark, name: str):
    return {
        (r.id_a, r.id_b, r.hamming)
        for r in spark.sql(f"SELECT DISTINCT * FROM {name}").collect()
    }


def test_three_split_parity_vs_batch(spark, tmp_path):
    """Pairs must cross state boundaries: a 3-way split means ~2/3 of
    every near-dup pair's members arrive in different micro-batches."""
    work = str(tmp_path)
    files = _write_splits(spark, work, 3)
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    q = _start(spark, indir, os.path.join(work, "ck"), "snd3")
    try:
        for i, f in enumerate(files):
            shutil.copy(f, os.path.join(indir, f"b{i}.parquet"))
            q.processAllAvailable()
    finally:
        q.stop()
    assert _drained(spark, "snd3") == _batch_pairs(spark)


def test_kill_resume_through_state_store(spark, tmp_path):
    """Stop the query after batch 1, restart from the SAME checkpoint,
    feed batch 2: cross-batch pairs must still appear — the band-bucket
    membership survives in the state store, not in process memory. The
    memory sink refuses checkpoint recovery, so this leg drives the
    parquet sink (the durable-sink shape a real pipeline uses)."""
    work = str(tmp_path)
    files = _write_splits(spark, work, 2)
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    ck = os.path.join(work, "ck")
    outdir = os.path.join(work, "out")
    docs = spark.read.parquet(SRC)

    def start_pq():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        return (
            simhash_pairs_stream(stream, "doc_id", "text", max_hamming=3)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", outdir)
            .option("checkpointLocation", ck)
            .start()
        )

    shutil.copy(files[0], os.path.join(indir, "b0.parquet"))
    q = start_pq()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # the "kill"
    first = {
        (r.id_a, r.id_b, r.hamming)
        for r in spark.read.parquet(outdir).distinct().collect()
    }
    shutil.copy(files[1], os.path.join(indir, "b1.parquet"))
    q = start_pq()  # resume from the same checkpoint + sink
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in spark.read.parquet(outdir).distinct().collect()
    }
    assert got == _batch_pairs(spark)
    # the resumed leg genuinely added cross-batch pairs (pairs whose
    # members have different parity — impossible within one batch)
    assert any((a % 2) != (b % 2) for a, b, _ in got - first)


def test_replay_idempotent_at_distinct_face(spark, tmp_path):
    """Re-delivering batch 1's rows (source-level duplicate delivery)
    re-emits only IDENTICAL pair rows: the distinct face is unchanged."""
    work = str(tmp_path)
    files = _write_splits(spark, work, 2)
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    q = _start(spark, indir, os.path.join(work, "ck"), "snd_rp")
    try:
        for i, f in enumerate(files):
            shutil.copy(f, os.path.join(indir, f"b{i}.parquet"))
            q.processAllAvailable()
        want = _drained(spark, "snd_rp")
        shutil.copy(files[0], os.path.join(indir, "b0_replay.parquet"))
        q.processAllAvailable()
    finally:
        q.stop()
    assert _drained(spark, "snd_rp") == want == _batch_pairs(spark)


def test_band_recall_precondition_enforced():
    import pyspark.sql.functions as F  # noqa: F401

    from web_template_forensics_spark.operators.dedup import band_struct_cols

    with pytest.raises(ValueError, match="cannot guarantee recall"):
        band_struct_cols(max_hamming=3, n_bands=2)


def test_near_dup_consensus_composition(spark):
    """Ensemble semantics: every consensus pair appears in >= 2 of the
    three per-method pair sets; the methods column is the sorted
    comma-joined subset; no pair outside the union sneaks in."""
    from web_template_forensics_spark.plans.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    cons = {
        (r.id_a, r.id_b): (r.n_methods, r.methods)
        for r in QUERIES["near_dup_consensus"](spark, sf).collect()
    }
    per_method = {}
    for name in ("minhash_pairs", "simhash_pairs", "ngram_jaccard_pairs"):
        per_method[name.split("_")[0]] = {
            (r.id_a, r.id_b) for r in QUERIES[name](spark, sf).collect()
        }
    for pair, (n, methods) in cons.items():
        hit = sorted(m for m, pairs in per_method.items() if pair in pairs)
        assert n == len(hit) >= 2
        assert methods == ",".join(hit)
    want = {
        p
        for p in set().union(*per_method.values())
        if sum(p in v for v in per_method.values()) >= 2
    }
    assert set(cons) == want


def _ts_docs(spark):
    """documents with the gate's deterministic event time: epoch +
    (doc_id % 7) hours — spans 6 hours of disorder across parity splits."""
    import pyspark.sql.functions as F

    return spark.read.parquet(SRC).withColumn(
        "ts",
        F.expr(
            "timestamp'2026-01-01 00:00:00' + "
            "make_interval(0,0,0,0,cast(doc_id % 7 as int),0,0)"
        ),
    )


def _start_ttl(spark, indir: str, ck: str, name: str, **kw):
    from web_template_forensics_spark.streaming.near_dup import (
        simhash_pairs_stream_ttl,
    )

    docs = _ts_docs(spark)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    return (
        simhash_pairs_stream_ttl(
            stream, "doc_id", "text", "ts", ttl_seconds=2 * 3600,
            max_hamming=3, **kw
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ck)
        .start()
    )


def _write_ts_splits(spark, work: str, n_splits: int) -> list[str]:
    docs = _ts_docs(spark)
    files = []
    for k in range(n_splits):
        sub = os.path.join(work, f"h{k}")
        docs.filter(f"doc_id % {n_splits} = {k}").coalesce(1).write.parquet(sub)
        files.append(glob.glob(os.path.join(sub, "*.parquet"))[0])
    return files


def test_ttl_stream_equals_bounded_window_batch_twin(spark, tmp_path):
    """TTL semantics: the stream's pair set over a 3-way split equals
    the batch operator's output filtered to |ts_a - ts_b| <= ttl, and
    with dedup_cross_band=True every row is already distinct (the
    chained dropDuplicatesWithinWatermark, not a post-drain DISTINCT)."""
    cc = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    prev = spark.conf.get(cc, "true")
    spark.conf.set(cc, "false")
    try:
        work = str(tmp_path)
        indir = os.path.join(work, "in")
        os.makedirs(indir)
        files = _write_ts_splits(spark, work, 3)
        shutil.copy(files[0], os.path.join(indir, "b0.parquet"))
        q = _start_ttl(
            spark, indir, os.path.join(work, "ck"), "snd_ttl",
            dedup_cross_band=True,
        )
        try:
            q.processAllAvailable()
            for i, f in enumerate(files[1:], 1):
                shutil.copy(f, os.path.join(indir, f"b{i}.parquet"))
                q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("select id_a, id_b, hamming from snd_ttl").collect()
        got = [(r.id_a, r.id_b, r.hamming) for r in rows]
        assert len(got) == len(set(got))  # in-stream cross-band dedup
        want = {
            (a, b, h)
            for a, b, h in _batch_pairs(spark)
            if abs((a % 7) - (b % 7)) <= 2
        }
        assert set(got) == want
    finally:
        spark.conf.set(cc, prev)


def test_ttl_state_is_bounded_by_eviction(spark, tmp_path):
    """The bounded-state claim, pinned via the state-store metrics: an
    old cohort (ts = epoch) followed by a far-future cohort (ts = +10 d,
    beyond ttl + delay) must EVICT the old members — numRowsTotal after
    the future batch stays at ~one cohort, instead of accumulating — and
    no pair crosses the ttl window."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet(SRC).limit(200)
    old = docs.withColumn("ts", F.expr("timestamp'2026-01-01 00:00:00'"))
    new = docs.withColumn(
        "ts", F.expr("timestamp'2026-01-11 00:00:00'")
    ).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    work = str(tmp_path)
    indir = os.path.join(work, "in")
    os.makedirs(indir)
    for name, df in (("h0", old), ("h1", new)):
        df.coalesce(1).write.parquet(os.path.join(work, name))
    shutil.copy(
        glob.glob(os.path.join(work, "h0", "*.parquet"))[0],
        os.path.join(indir, "b0.parquet"),
    )
    from web_template_forensics_spark.streaming.near_dup import (
        simhash_pairs_stream_ttl,
    )

    stream = (
        spark.readStream.schema(old.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    q = (
        simhash_pairs_stream_ttl(
            stream, "doc_id", "text", "ts",
            ttl_seconds=3600, watermark_delay="1 hour", max_hamming=3,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("snd_evict")
        .option("checkpointLocation", os.path.join(work, "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        rows_after_b0 = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        shutil.copy(
            glob.glob(os.path.join(work, "h1", "*.parquet"))[0],
            os.path.join(indir, "b1.parquet"),
        )
        q.processAllAvailable()
        # one more (empty-ish) trigger so timed-out old keys are reaped
        shutil.copy(
            glob.glob(os.path.join(work, "h1", "*.parquet"))[0],
            os.path.join(indir, "b2.parquet"),
        )
        q.processAllAvailable()
        rows_after_b2 = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()
    # old cohort evicted: state after the future batches is not the sum
    # of both cohorts (each doc explodes into 4 band rows; without
    # eviction state would be ~2x the single-cohort level)
    assert rows_after_b2 <= rows_after_b0 * 1.25
    pairs = spark.sql("select * from snd_evict").collect()
    assert all(
        (r.id_a < 1_000_000) == (r.id_b < 1_000_000) for r in pairs
    )  # nothing pairs across the 10-day gap
