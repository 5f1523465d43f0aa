"""Deterministic hash-based sampling — the rebalancing step of a
training-data pipeline (per-language/source quotas, corpus downscaling)
that must be REPRODUCIBLE: the same row set on every run, every
executor count, every engine, with no RNG state anywhere.

Mechanism: u = first 8 bytes of md5(key || ':' || salt) read big-endian
as an unsigned 64-bit integer; keep iff u < floor(fraction * 2^64).
The threshold is computed ONCE in Python as an exact integer and
injected as a literal into both faces, so there is no float division
or rounding anywhere near the keep decision — the comparison is
integer-vs-integer in Spark (decimal(20,0)) and DuckDB (UBIGINT) alike
(md5 rather than xxhash64 because DuckDB recomputes it bit-identically:
``('0x' || substr(md5(k), 1, 16))::UBIGINT`` — the same recipe
functions/text_udfs.py uses for token hashing).

100 TB shape: a pure scalar predicate on the scan — no shuffle, no
driver state, pushes down next to the parquet reader; per-stratum
fractions resolve through a literal CASE/map, never a join.

Reference parity: no sampling surface exists in the reference
(SURVEY.md §2 — LLM-pipeline graft component).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U64 = 1 << 64


def _threshold(fraction: float) -> int:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} outside [0, 1]")
    return min(int(fraction * _U64), _U64 - 1)


def _hash_u64_col(key: Column, salt: str) -> Column:
    """First-8-md5-bytes unsigned value as decimal(20,0)."""
    hx = F.substring(F.md5(F.concat(key.cast("string"), F.lit(":" + salt))), 1, 16)
    return F.conv(hx, 16, 10).cast("decimal(20,0)")


def _hash_u64_sql(key_expr: str, salt: str) -> str:
    return (
        f"('0x' || substr(md5(cast({key_expr} as varchar) || ':{salt}'), 1, 16))::UBIGINT"
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "sample_v1",
) -> DataFrame:
    """Keep each row iff hash(key, salt) clears its stratum's exact
    integer threshold. Strata absent from ``fractions`` are DROPPED
    (fraction 0) — quotas are an allowlist. Returns the input columns
    unchanged; chain ``.select`` for projection."""
    expr: Column = F.lit(None).cast("decimal(20,0)")
    thr = F.lit(0).cast("decimal(20,0)")
    mapping = [
        (stratum, F.lit(str(_threshold(frac))).cast("decimal(20,0)"))
        for stratum, frac in sorted(fractions.items())
    ]
    for stratum, t in mapping:
        thr = F.when(F.col(stratum_col) == stratum, t).otherwise(thr)
    return df.filter(_hash_u64_col(F.col(key_col), salt) < thr)


def stratified_sample_sql(
    table: str,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "sample_v1",
    select: str = "*",
) -> str:
    cases = " ".join(
        f"WHEN '{stratum}' THEN {_threshold(frac)}::UBIGINT"
        for stratum, frac in sorted(fractions.items())
    )
    return (
        f"SELECT {select} FROM {table} WHERE {_hash_u64_sql(key_col, salt)}"
        f" < (CASE {stratum_col} {cases} ELSE 0::UBIGINT END)"
    )
