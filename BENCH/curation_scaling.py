"""Curation-pipeline scaling leg (round 6): the text-curation surface's
own N-vs-4N evidence, same protocol as BENCH/scaling.py (one process =
one level, cluster mode = N one-core executor JVMs, one JSON line).

    python BENCH/curation_scaling.py <cores> <n_docs> [mode]

Measured window: the full corpus_curation composition over a
deterministically synthesized document corpus — Gopher quality rules
(scalar projection) + repetition stats (gram-explode doc-keyed aggs) +
MinHash-LSH near-dup pairs (64-perm Arrow UDF + banded equi-join) +
large-star/small-star connected components + the decision join — ending
in a drop-reason count checksum that must be IDENTICAL at every level.

Corpus: fully distributed synthesis (zero driver data): per-doc word
soup from xxhash64(word-slot) over a 2,000-word vocab, 20-119 words per
doc, 10% of docs exact-copying their 20-block leader so the dedup path
has real work. Cached to .bench_data parquet (shared across levels, like
the pages input).
"""

from __future__ import annotations

import json
import os
import sys
import time


def build_docs_df(spark, n_docs: int, vocab: int = 2000):
    from pyspark.sql import functions as F

    base = F.when(
        F.pmod(F.col("id"), F.lit(20)) < 2,
        F.col("id") - F.pmod(F.col("id"), F.lit(20)),
    ).otherwise(F.col("id"))
    n_words = (F.pmod(F.xxhash64(base, F.lit("len")), F.lit(100)) + F.lit(20)).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.format_string(
            "w%04d", F.pmod(F.xxhash64(base, i.cast("long")), F.lit(vocab))
        ),
    )
    langs = F.array(*[F.lit(x) for x in ("en", "de", "es", "fr", "zh")])
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.element_at(langs, (F.pmod(F.xxhash64("id", F.lit("lang")), F.lit(5)) + 1).cast("int")).alias("lang"),
        F.concat_ws(" ", words).alias("text"),
    )


def main() -> None:
    cores = int(sys.argv[1])
    n_docs = int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "cluster"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from web_template_forensics_spark.session import get_spark
    from web_template_forensics_spark.functions.text_udfs import token_count_udf

    # AQE partition coalescing stays ON for this job (unlike the pages
    # pipeline leg): shuffle width is sized for the gram-explode aggs'
    # heap footprint, and every OTHER shuffle (cluster assign, decision
    # joins) moves tiny rows — coalescing collapses those to real sizes
    # at runtime, identically at both levels.
    extra_conf = {
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    }
    master = None
    if mode == "cluster":
        from web_template_forensics_spark.session import cluster_conf

        master, cc = cluster_conf(cores)
        extra_conf.update(cc)

    # Shuffle partitions sized to the CORPUS, identical at every level
    # (fairness preserved): the gram-explode aggs put ~140 gram-rows per
    # doc through the reducers, and a 3 GB executor heap OOMs above
    # ~2M gram-rows per partition (measured: 500k docs at 32 partitions
    # died in the explode agg; 250k passed) — exactly the
    # "size shuffle partitions so partitions fit executor memory" knob,
    # exercised for real.
    spark = get_spark(
        "curation-scaling",
        cores=cores,
        shuffle_partitions=max(32, n_docs // 8000),
        master=master,
        extra_conf=extra_conf,
    )

    from pyspark.sql import functions as F

    n_files = max(32, n_docs // 10_000)
    docs_path = os.path.join(repo, ".bench_data", f"docs_{n_docs}_f{n_files}_v1")
    if not os.path.isdir(docs_path):
        build_docs_df(spark, n_docs).repartition(n_files).write.mode(
            "overwrite"
        ).parquet(docs_path)

    # excluded-window warmup: python workers, parquet footers, page cache
    spark.range(0, cores * 10, 1, cores).selectExpr("cast(id as string) s").select(
        token_count_udf("s")
    ).count()
    docs = spark.read.parquet(docs_path)
    docs.select(F.sum(F.length("text"))).first()

    from web_template_forensics_spark.operators.components import dedup_clusters
    from web_template_forensics_spark.operators.dedup import minhash_lsh_pairs
    from web_template_forensics_spark.operators.text_pipeline import (
        gopher_quality,
        repetition_stats,
    )

    t0 = time.perf_counter()
    quality = gopher_quality(docs).select("doc_id", "n_words")
    rep = repetition_stats(docs, top_ns=(2,), dup_ns=()).select(
        "doc_id", "top2gram_frac"
    )
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).select(
        "id_a", "id_b"
    )
    clusters = dedup_clusters(docs.select("doc_id"), pairs).select(
        "doc_id", "is_canonical"
    )
    bad_q = F.col("n_words") < 50
    bad_r = F.col("top2gram_frac") > 0.1
    dup = F.col("is_canonical") == 0
    decided = (
        quality.join(rep, "doc_id")
        .join(clusters, "doc_id")
        .select(
            F.when(bad_q, F.lit("quality"))
            .when(bad_r, F.lit("repetition"))
            .when(dup, F.lit("duplicate"))
            .otherwise(F.lit("none"))
            .alias("drop_reason")
        )
    )
    reasons = {
        r["drop_reason"]: r["n"]
        for r in decided.groupBy("drop_reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "cores": cores,
                "mode": mode,
                "docs": n_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
                "reasons": dict(sorted(reasons.items())),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
