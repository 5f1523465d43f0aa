"""Deterministic stratified sampling vs a hashlib twin."""

from __future__ import annotations

import hashlib

from web_template_forensics_spark.operators.sampling import (
    _threshold,
    stratified_sample,
)

_U64 = 1 << 64


def _py_keep(key: int, salt: str, fraction: float) -> bool:
    h = hashlib.md5(f"{key}:{salt}".encode()).digest()[:8]
    return int.from_bytes(h, "big") < _threshold(fraction)


def test_matches_hashlib_twin_exactly(spark):
    fr = {"en": 0.9, "de": 0.5, "es": 0.5, "fr": 0.25, "zh": 0.125}
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "lang").collect()
    want = {
        r["doc_id"]
        for r in rows
        if r["lang"] in fr and _py_keep(r["doc_id"], "sample_v1", fr[r["lang"]])
    }
    got = {
        r["doc_id"]
        for r in stratified_sample(docs, fr).select("doc_id").collect()
    }
    assert got == want
    assert 0 < len(got) < len(rows)


def test_unknown_stratum_dropped(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, "xx")], "doc_id long, lang string"
    )
    kept = stratified_sample(df, {"en": 1.0}).collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_fraction_edges(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(100)], "doc_id long, lang string"
    )
    assert stratified_sample(df, {"en": 0.0}).count() == 0
    # 1.0 maps to threshold 2^64 - 1: a specific md5 could reach the
    # max value, but not in a 100-row corpus
    assert stratified_sample(df, {"en": 1.0}).count() == 100


def test_salt_changes_sample_membership(spark):
    df = spark.createDataFrame(
        [(i, "en") for i in range(200)], "doc_id long, lang string"
    )
    a = {r["doc_id"] for r in stratified_sample(df, {"en": 0.5}, salt="s1").collect()}
    b = {r["doc_id"] for r in stratified_sample(df, {"en": 0.5}, salt="s2").collect()}
    assert a != b
    assert 60 <= len(a) <= 140 and 60 <= len(b) <= 140


def test_nested_fractions_are_subsets(spark):
    # hash-threshold sampling is monotone: the 25% sample is contained
    # in the 50% sample — the property that makes quota changes replayable
    df = spark.createDataFrame(
        [(i, "en") for i in range(400)], "doc_id long, lang string"
    )
    s25 = {r["doc_id"] for r in stratified_sample(df, {"en": 0.25}).collect()}
    s50 = {r["doc_id"] for r in stratified_sample(df, {"en": 0.5}).collect()}
    assert s25 < s50


def test_weighted_sample_matches_hashlib_twin(spark):
    import math

    from web_template_forensics_spark.operators.sampling import (
        weighted_sample_per_stratum,
    )

    rows = [(i, "en" if i % 2 == 0 else "de", (i % 7) + 1) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, wt long")
    got = {
        (r["doc_id"], r["lang"])
        for r in weighted_sample_per_stratum(
            df, n=5, weight_col="wt", salt="t1"
        ).collect()
    }

    def key(i, w):
        h = hashlib.md5(f"{i}:t1".encode()).digest()[:8]
        u = (int.from_bytes(h, "big") + 1) / _U64
        return round(math.log(u) / w, 9)

    want = set()
    for lang in ("en", "de"):
        member = [(i, l, w) for i, l, w in rows if l == lang]
        member.sort(key=lambda t: (-key(t[0], t[2]), t[0]))
        want |= {(i, l) for i, l, _ in member[:5]}
    assert got == want
    assert len(got) == 10


def test_weighted_sample_zero_weight_never_wins(spark):
    from web_template_forensics_spark.operators.sampling import (
        weighted_sample_per_stratum,
    )

    df = spark.createDataFrame(
        [(1, "en", 0), (2, "en", 5), (3, "en", -2)],
        "doc_id long, lang string, wt long",
    )
    rows = weighted_sample_per_stratum(df, n=3, weight_col="wt").collect()
    assert [r["doc_id"] for r in rows] == [2]
