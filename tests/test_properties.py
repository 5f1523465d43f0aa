"""Property-based tests (hypothesis) for the pure cores — the SURVEY §5.4
strategy item beyond example fixtures: invariants that must hold for ANY
input, not just the goldens."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from web_template_forensics_spark.geo import cells
from web_template_forensics_spark.oracle.html_oracle import extract_text, parse_html_tree
from web_template_forensics_spark.oracle.similarity import (
    compare_structures,
    multiset_jaccard,
    set_jaccard,
    tree_similarity,
)

lat_s = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lon_s = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)
level_s = st.integers(min_value=0, max_value=cells.MAX_LEVEL)


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lon=lon_s, level=level_s)
def test_cell_encode_decode_roundtrip(lat, lon, level):
    cell = int(cells.cell_encode(lat, lon, level)[()])
    lv, ix, iy = cells.cell_decode(cell)
    assert int(lv) == level
    n = 1 << level
    assert 0 <= int(ix) < n and 0 <= int(iy) < n
    # encode(decode-center) is a fixed point: centers are interior, so
    # this holds exactly (raw boundary points may land one cell over
    # within an ulp of a grid line — floor-grid fp semantics)
    clat, clon = cells.cell_center(cell)
    assert int(cells.cell_encode(float(clat), float(clon), level)[()]) == cell


@settings(max_examples=100, deadline=None)
@given(lat=lat_s, lon=lon_s, level=st.integers(min_value=1, max_value=20),
       k=st.integers(min_value=0, max_value=3))
def test_k_ring_membership_and_size(lat, lon, level, k):
    cell = int(cells.cell_encode(lat, lon, level)[()])
    ring = cells.k_ring(cell, k)
    assert cell in set(ring.tolist())
    n = 1 << level
    _, ix0, iy0 = cells.cell_decode(cell)
    for c in ring.tolist():
        lv, ix, iy = cells.cell_decode(c)
        assert int(lv) == level
        dx = abs(int(ix) - int(ix0))
        dx = min(dx, n - dx)  # lon wrap
        assert dx <= k and abs(int(iy) - int(iy0)) <= k
    assert len(ring) <= (2 * k + 1) ** 2


@settings(max_examples=100, deadline=None)
@given(lat=lat_s, lon=lon_s, level=st.integers(min_value=1, max_value=24))
def test_cell_parent_contains_child(lat, lon, level):
    child = int(cells.cell_encode(lat, lon, level)[()])
    parent = int(cells.cell_parent(child, level - 1)[()])
    kids = cells.cell_children(parent)
    assert child in set(np.asarray(kids).ravel().tolist())


_tag = st.sampled_from(["div", "p", "span", "li", "em"])
_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F),
    min_size=0, max_size=12,
)


@st.composite
def small_html(draw, depth=0):
    tag = draw(_tag)
    inner = draw(_text)
    if depth < 2 and draw(st.booleans()):
        inner += draw(small_html(depth=depth + 1))
    return f"<{tag}>{inner}</{tag}>"


@settings(max_examples=80, deadline=None)
@given(markup=small_html())
def test_structure_compare_reflexive_and_bounded(markup):
    t = parse_html_tree(f"<html><body>{markup}</body></html>")
    r = compare_structures(t, t)
    assert r.similarity_score == 1.0
    assert r.missing == 0 and r.extra == 0
    assert tree_similarity(t, t) == 1.0


@settings(max_examples=80, deadline=None)
@given(a=small_html(), b=small_html())
def test_structure_compare_in_unit_interval(a, b):
    ta = parse_html_tree(f"<html><body>{a}</body></html>")
    tb = parse_html_tree(f"<html><body>{b}</body></html>")
    r = compare_structures(ta, tb)
    assert 0.0 <= r.similarity_score <= 1.0
    assert 0.0 <= tree_similarity(ta, tb) <= 1.0


@settings(max_examples=80, deadline=None)
@given(markup=small_html())
def test_extract_text_idempotent_on_own_output(markup):
    """Extracted text contains no markup: re-wrapping and re-extracting
    the (escaped-free) output is a fixed point for this alphabet."""
    txt = extract_text(f"<html><body>{markup}</body></html>")
    again = extract_text(f"<html><body><p>{txt}</p></body></html>")
    # stripping/newline-joining is stable
    assert extract_text(f"<html><body><p>{again}</p></body></html>") == again


@settings(max_examples=150, deadline=None)
@given(a=st.sets(st.integers(0, 20)), b=st.sets(st.integers(0, 20)))
def test_set_jaccard_properties(a, b):
    j = set_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == set_jaccard(b, a)
    assert set_jaccard(a, a) == 1.0


@settings(max_examples=150, deadline=None)
@given(a=st.dictionaries(st.integers(0, 10), st.integers(1, 5)),
       b=st.dictionaries(st.integers(0, 10), st.integers(1, 5)))
def test_multiset_jaccard_properties(a, b):
    from collections import Counter

    ca, cb = Counter(a), Counter(b)
    j = multiset_jaccard(ca, cb)
    assert 0.0 <= j <= 1.0
    assert j == multiset_jaccard(cb, ca)
    assert multiset_jaccard(ca, ca) == 1.0
    # multiset Jaccard lower-bounds nothing vs set Jaccard in general,
    # but equals 1 iff identical multisets
    assert (j == 1.0) == (ca == cb)


# -- BPE-ish tokenizer: cross-engine parity as a PROPERTY -------------------

_ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x09, max_codepoint=0x7E),
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(text=_ascii_text)
def test_bpe_token_count_python_duckdb_parity(text):
    """Python re and DuckDB RE2 must count BPE_TOKEN_PATTERN matches
    identically for ANY printable-ASCII string (the Spark/Java face is
    pinned separately in test_operators — JVM-per-example is too slow
    for hypothesis)."""
    import re

    import duckdb

    from web_template_forensics_spark.functions.text_udfs import (
        BPE_TOKEN_PATTERN,
        bpe_token_count_sql,
    )

    n_py = len(re.findall(BPE_TOKEN_PATTERN, text))
    con = _bpe_duck()
    n_sql = con.execute(f"select {bpe_token_count_sql('?')}", [text]).fetchone()[0]
    assert n_py == n_sql, (text, n_py, n_sql)


_BPE_CON = []


def _bpe_duck():
    if not _BPE_CON:
        import duckdb

        _BPE_CON.append(duckdb.connect())
    return _BPE_CON[0]


# -- sessionizer coalesce: batch-split invariance as a PROPERTY ------------

_ts_lists = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=0, max_size=60
)


@settings(max_examples=300, deadline=None)
@given(ts=_ts_lists, split=st.integers(min_value=0, max_value=60),
       gap=st.integers(min_value=1, max_value=2_000))
def test_sessionize_coalesce_batch_split_invariant(ts, split, gap):
    """Folding events through coalesce_sessions in two arbitrary batches
    (any order, any split point) equals one pass over the complete set,
    AND equals the batch twin's lag/cumsum derivation — the pure-core
    statement of the stream==batch parity claim."""
    from web_template_forensics_spark.streaming.ingest import coalesce_sessions

    split = min(split, len(ts))
    b1, b2 = ts[:split], ts[split:]
    two_step = coalesce_sessions(
        coalesce_sessions([(t, t, 1) for t in b1], gap)
        + [(t, t, 1) for t in b2],
        gap,
    )
    one_step = coalesce_sessions([(t, t, 1) for t in ts], gap)
    assert two_step == one_step

    # lag/cumsum reference (q_event_sessions semantics)
    ref = []
    for t in sorted(ts):
        if ref and t - ref[-1][1] <= gap:
            s0, l0, n0 = ref[-1]
            ref[-1] = (s0, max(l0, t), n0 + 1)
        else:
            ref.append((t, t, 1))
    assert one_step == ref
