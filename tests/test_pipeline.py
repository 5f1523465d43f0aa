"""End-to-end pipeline tests: text invariant on-cluster, geocode goldens,
kill/resume via the lineage catalog."""

import os

import pytest
from pyspark.sql import functions as F


def test_pipeline_invariant_and_geocode(spark):
    from web_template_forensics_spark.plans.pipeline import pages_to_geo
    from web_template_forensics_spark.sources.pages import build_pages_df, gen_pages_pdf

    n = 400
    pages = build_pages_df(spark, n, seed=42)
    geo = pages_to_geo(spark, pages, verify_text=True)  # raises on any byte mismatch
    got = geo.select("url", "lat", "lon").toPandas().set_index("url")

    gold = gen_pages_pdf(0, n, 42, with_gold=True)
    # duplicate urls: keep any row (same url -> same html -> same geocode)
    gold = gold.drop_duplicates("url").set_index("url")
    assert len(got) == n
    joined = got.join(gold[["gold_lat", "gold_lon"]])
    assert (joined.lat == joined.gold_lat).all()
    assert (joined.lon == joined.gold_lon).all()


def test_checkpointed_write_resume(spark, tmp_path):
    from web_template_forensics_spark.sources.catalog import (
        checkpointed_write,
        done_buckets,
        read_table,
    )

    df = spark.range(0, 1000).withColumn("payload", F.concat(F.lit("v"), F.col("id")))
    path = str(tmp_path / "tbl")

    # kill after 5 of 16 buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        checkpointed_write(spark, df, path, key_col="id", n_buckets=16, fail_after=5, fingerprint=True)
    assert len(done_buckets(path)) == 5

    # record mtimes of committed bucket data — resume must not rewrite them
    committed = sorted(done_buckets(path))
    def bucket_mtime(b):
        d = os.path.join(path, "data", f"bucket={b}")
        return max(os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d))
    mtimes_before = {b: bucket_mtime(b) for b in committed}

    snap = checkpointed_write(spark, df, path, key_col="id", n_buckets=16, fingerprint=True)
    assert snap["committed_buckets"] == 16
    assert snap["total_rows"] == 1000
    for b in committed:
        assert bucket_mtime(b) == mtimes_before[b], f"bucket {b} was recomputed"

    # final table identical to the input
    back = read_table(spark, path)
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 499500

    # lineage fingerprints (round 4): markers from BOTH legs (pre-kill
    # sequential + post-resume batch) must match a fresh recompute from
    # the written data — the resume path cannot commit a different
    # fingerprint shape than the normal path
    from web_template_forensics_spark.sources.catalog import (
        bucket_fingerprints,
        lineage_rows,
    )

    marks = {m["bucket"]: m for m in lineage_rows(path)}
    assert len(marks) == 16 and all("fingerprint" in m for m in marks.values())
    fresh = bucket_fingerprints(spark, path, "id", list(range(16)))
    for b, m in marks.items():
        assert m["fingerprint"] == fresh[b], f"bucket {b} fingerprint drift"


def test_full_pipeline_stats(spark, tmp_path):
    from web_template_forensics_spark.plans.pipeline import run_pages_pipeline

    stats = run_pages_pipeline(
        spark, n_pages=500, seed=42, out_dir=str(tmp_path / "out")
    )
    assert stats["pages"] == 500
    assert stats["geocoded"] == 500  # every synthetic page geocodes
    assert stats["tiles"] > 50
    assert stats["pip_assignments"] > 100
    assert stats["tiles_snapshot"] == 16


def test_lineage_gate_empty_residue_class(spark, tmp_path):
    """ADVICE r4: a corpus where some doc_id % 16 residue class is empty
    must still gate green — the empty bucket's marker is (0 rows,
    0 bytes, consistent) on the Spark face and the oracle generates the
    full 0..15 bucket domain with 0-row defaults."""
    import duckdb
    import pandas as pd

    from web_template_forensics_spark.plans.queries import (
        _Q_PIPELINE_LINEAGE_SQL,
        LINEAGE_N_BUCKETS,
        lineage_gate_df,
    )

    src = tmp_path / "docs.parquet"
    docs_pd = pd.DataFrame({"doc_id": [i for i in range(160) if i % 16 not in (5, 11)]})
    docs_pd.to_parquet(src)

    got = (
        lineage_gate_df(spark, spark.createDataFrame(docs_pd), str(tmp_path / "gate"))
        .toPandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert len(got) == LINEAGE_N_BUCKETS
    empty = got[got.bucket.isin([5, 11])]
    assert (empty.n_rows == 0).all()
    assert empty.bytes_consistent.all(), "empty residue class must be consistent"

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{src}'")
    want = (
        con.execute(_Q_PIPELINE_LINEAGE_SQL)
        .df()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert len(want) == LINEAGE_N_BUCKETS
    for col in ("bucket", "n_rows", "fingerprint", "status"):
        assert got[col].astype(want[col].dtype).equals(want[col]), col
    assert got.bytes_consistent.all() and want.bytes_consistent.all()
