"""Driver-contract tests: entry() smoke + a fast oracle-compare subset at
sf0.001 (the full sweep runs via tools/compare_oracle.py at sf0.01)."""

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"

FAST_SUBSET = [
    "pricing_summary",
    "doc_cells",
    "tile_rollup_z6",
    "pip_rectangles",
    "extract_text",
    "latest_crawl_dedup",
    "text_stats",
    "label_stats",
    "pipeline_lineage",  # r4: lineage bookkeeping under the oracle
    "ann_ivf_topk",      # r4: the last formerly-rows-only query
    "event_sessions_stream",  # r5: the stateful STREAM face itself
    "multimodal_features",    # r5: real PNG/JPEG codecs under the oracle
    "phash_near_dup",         # r5: perceptual image dedup (multimodal x dedup)
    "audio_fp_near_dup",      # r5: perceptual audio dedup (audio x dedup)
    "video_fp_near_dup",      # r5: perceptual video dedup — triad complete
    "simhash_pairs_stream",   # r5: STREAMING near-dup == batch oracle
]


def test_entry_smoke(spark):
    import __spark_entry__ as em

    df = em.entry(spark)
    assert df.count() > 0
    assert "page_count" in df.columns


def test_queries_have_oracles_or_are_flagged(spark):
    import __spark_entry__ as em

    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    # Round 4 closed the last rows-only query: ann_ivf_topk's seeded
    # k-means centroids are materialized by a Spark-free deterministic
    # twin and injected into the DuckDB oracle as a VALUES table
    # (configuration constants, like the LSH hyperplane signs); list
    # assignment, probe expansion, candidate join and top-k are all
    # recomputed in SQL. Every query now has a full oracle.
    assert rows_only == set()


def test_fast_oracle_subset(spark):
    import __spark_entry__ as em
    from tools.compare_oracle import compare, duck_con

    con = duck_con(SF)
    qs = em.queries()
    oracles = em.oracle_sql()
    failures = {}
    for name in FAST_SUBSET:
        sdf = qs[name](spark, SF).toPandas()
        ddf = con.sql(oracles[name]).df()
        problems = compare(name, sdf, ddf)
        if problems:
            failures[name] = problems
    assert not failures, failures
