"""Bitwise cross-face identity for the MinHash signature (round 5).

ADVICE r4 (medium): the numpy face computes each permutation in uint64 —
``a*h`` and ``+b`` wrap mod 2^64 BEFORE the final ``% M61`` — while the
r4 SQL oracle computed textbook ``(a*h + b) mod M61`` exactly in
HUGEINT, so every signature slot differed across faces and the "exact
banded replica" claim was false (equality still held, but only through
both bandings independently catching every over-threshold pair). The
fix replicates the wrap in SQL:
``((h % M61) * a) % 2^64 + b) % 2^64 % M61`` (plans/queries.py sigs
CTE). These tests pin the identity so a drift on either face — a numpy
dtype change, a DuckDB integer-semantics change, a new permutation
constant — fails loudly instead of silently reverting to the
probabilistic-equality regime.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from web_template_forensics_spark.functions.text_udfs import (
    _MERSENNE61,
    _MH_A,
    _MH_B,
    N_MINHASH,
    minhash_signature,
    shingle_hashes,
)

_T64 = 1 << 64

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs and some extra tokens",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "repeated repeated repeated repeated repeated tokens tokens tokens",
    "Unicode süß naïve 日本語 mixed with ascii tokens for the shingle hash",
]


def _sql_signature(hv: np.ndarray) -> np.ndarray:
    """The oracle's sigs-CTE permutation arithmetic, verbatim."""
    con = duckdb.connect()
    con.execute("CREATE TABLE sh(hv HUGEINT)")
    con.executemany("INSERT INTO sh VALUES (?)", [(int(v),) for v in hv])
    perm_rows = ", ".join(
        f"({i}, {int(_MH_A[i])}, {int(_MH_B[i])})" for i in range(N_MINHASH)
    )
    rows = con.execute(
        f"""
        WITH perms(i, a, b) AS (VALUES {perm_rows})
        SELECT p.i,
               min(((((hv % {_MERSENNE61}) * p.a) % {_T64} + p.b) % {_T64})
                   % {_MERSENNE61}) AS s
        FROM sh, perms p GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    return np.array([r[1] for r in rows], dtype=np.uint64)


@pytest.mark.parametrize("idx", range(len(DOCS)))
def test_minhash_sql_face_bitwise_identical(idx):
    hv = shingle_hashes(DOCS[idx])
    assert hv.size > 0
    np_sig = minhash_signature(DOCS[idx])
    sql_sig = _sql_signature(hv)
    assert (np_sig == sql_sig).all(), (
        f"{int((np_sig != sql_sig).sum())}/{N_MINHASH} slots differ — "
        "the two faces no longer band identically"
    )


def test_wrap_actually_occurs():
    """The pin is only meaningful if some slot genuinely wraps mod 2^64
    (otherwise textbook mod-M61 would coincidentally agree)."""
    hv = shingle_hashes(DOCS[0])
    hm = (hv % np.uint64(_MERSENNE61)).astype(object)
    prods = hm[:, None] * _MH_A.astype(object)[None, :]
    assert (prods >= _T64).any(), "no 2^64 wrap on this corpus — weak test"


def test_numpy_face_is_uint64_wrap_semantics():
    """Re-derive one doc's signature with exact Python ints + explicit
    mod-2^64 wraps; must equal the numpy face (guards a future numpy
    dtype/promotion change, e.g. NEP 50 variations)."""
    doc = DOCS[1]
    hv = [int(v) for v in shingle_hashes(doc)]
    sig = minhash_signature(doc)
    for i in range(N_MINHASH):
        a, b = int(_MH_A[i]), int(_MH_B[i])
        expect = min(
            ((((h % _MERSENNE61) * a) % _T64 + b) % _T64) % _MERSENNE61
            for h in hv
        )
        assert int(sig[i]) == expect


# ---------------------------------------------------------------------------
# round 7: the pandas UDFs moved to batch-vectorized twins (md5 once per
# batch-distinct token via factorize, Mersenne shift-add replacing the
# uint64 division). Pin the batch faces bitwise against the scalar faces
# on every edge shape: empty, whitespace-only, < k tokens, unicode,
# duplicate tokens, and the Zipf-like common case.
# ---------------------------------------------------------------------------

EDGE_DOCS = DOCS + [
    "",
    "   \t\n  ",
    "one",
    "one two",
    "same same same",
    "\x0b vertical \x0b tab \x0b",
]


def test_batch_shingle_hashes_match_scalar():
    from web_template_forensics_spark.functions.text_udfs import _shingle_hash_batch

    batch = _shingle_hash_batch(EDGE_DOCS)
    for doc, got in zip(EDGE_DOCS, batch):
        ref = shingle_hashes(doc)
        assert got.dtype == np.uint64
        assert np.array_equal(got, ref), doc[:40]


def test_batch_minhash_matches_scalar():
    from web_template_forensics_spark.functions.text_udfs import (
        _minhash_from_shingles,
        _shingle_hash_batch,
    )

    batch = _shingle_hash_batch(EDGE_DOCS)
    for doc, hv in zip(EDGE_DOCS, batch):
        got = _minhash_from_shingles(hv)
        ref = minhash_signature(doc)
        assert np.array_equal(got, ref), doc[:40]


def test_mod_m61_is_exact_on_uint64_edges():
    from web_template_forensics_spark.functions.text_udfs import _mod_m61

    m61 = np.uint64(_MERSENNE61)
    edges = np.array(
        [0, 1, _MERSENNE61 - 1, _MERSENNE61, _MERSENNE61 + 1,
         (1 << 62), (1 << 63), _T64 - 1, 7 * _MERSENNE61, 8 * _MERSENNE61 - 9],
        dtype=np.uint64,
    )
    rng = np.random.RandomState(7)
    rand = rng.randint(0, 1 << 62, size=4096, dtype=np.int64).astype(np.uint64) * np.uint64(5)
    for arr in (edges, rand):
        got = _mod_m61(arr)
        ref = arr % m61
        assert np.array_equal(got, ref)


def test_batch_simhash_matches_scalar(spark):
    import pandas as pd

    from web_template_forensics_spark.functions.text_udfs import simhash64, simhash64_udf

    df = spark.createDataFrame(
        pd.DataFrame({"text": [d for d in EDGE_DOCS]})
    ).select(simhash64_udf("text").alias("h"))
    got = [r.h for r in df.collect()]
    assert got == [simhash64(d) for d in EDGE_DOCS]
