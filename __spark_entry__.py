"""Driver contract for the spark-graft builder (PySpark target).

The engine lives in ``web_template_forensics_spark/`` — this module is a
thin adapter. ``queries()`` covers the operator inventory of SURVEY.md §2
(relational core, WGQ cells/tiles, PIP + kNN spatial joins, the oracle
text-extraction invariant, crawl dedup, class extraction, text analysis,
exact/LSH dedup, embedding similarity search); ``oracle_sql()`` holds the
DuckDB-recomputable counterpart for every SQL-expressible query —
including minhash_pairs (since round 4 an EXACT banded replica: md5
token hashes, SplitMix64 finalizer, all 64 permutations — with the
numpy face's uint64 wraps replicated since round 5, pytest-pinned
bitwise-identical — and the band collision recomputed in SQL, plus an
in-SQL banded==exact check),
ann_lsh_topk (hash-derived Rademacher hyperplanes recomputed in SQL),
pages_pipeline_tiles (the generator+geocode spec re-derived via a
splitmix64 CTE chain) and simhash_pairs (md5 token hash recomputed in
SQL; radius-3 banding is pigeonhole-exact, so output equals the
brute-force definition). Since round 4 EVERY query is fully oracled:
ann_ivf_topk's seeded k-means centroids are materialized by a Spark-free
deterministic twin and injected as a VALUES table (configuration
constants, like the LSH hyperplane signs); list assignment, multi-probe
expansion, the candidate equi-join and cosine top-k are recomputed in
SQL, with 1e-9 similarity quantization fencing cross-engine float drift
on both faces.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from web_template_forensics_spark.plans.cascade_queries import (
    CASCADE_QUERIES,
    cascade_oracle_sql,
)
from web_template_forensics_spark.plans.queries import (
    QUERIES,
    flagship,
    oracle_sql_all,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship geo pipeline on /root/testdata/sf0.001: documents-derived
    points -> WGQ cells -> broadcast PIP join -> salted tile rollup."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**QUERIES, **CASCADE_QUERIES}


def oracle_sql() -> dict[str, str]:
    # oracle_sql_all builds the one expensive entry (ann_ivf_topk's
    # injected trained centroids) lazily on first call
    return {**oracle_sql_all(), **cascade_oracle_sql()}
