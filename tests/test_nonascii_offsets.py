"""Q16 byte-offset fixtures (SURVEY §5.3): non-ASCII sources.

The reference's tree-sitter normalizer slices leaf ``text`` from the
source STRING with BYTE offsets (core/jsx_treesitter_parser.py:68), so
any multi-byte character shifts every later leaf's text — e.g. after a
2-emoji comment (+3 chars of drift each) the ``function`` keyword leaf
reads ``'on gü() '``. That drift is part of the parity contract: our
normalizer replicates the same slice (oracle/jsx_treesitter.py), pinned
node-for-node against the reference parser here, with the drifted
values ALSO pinned as goldens (so the contract stays tested when the
reference checkout is absent) and re-derived from byte arithmetic (so a
reader can see the drift is the documented mechanism, not noise).

The regex-fallback face has no byte offsets (it tokenizes the str), so
its leaf text never drifts — but the NORMALIZED surface the engine's
scores consume (call graph, id/lit alpha-renaming) must agree across
faces on non-ASCII sources; asserted below.
"""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

from web_template_forensics_spark.oracle.js_oracle import parse_js
from web_template_forensics_spark.oracle.jsx_treesitter import (
    HAS_TREE_SITTER,
    parse_jsx,
)

# (source, [(leaf_type, pinned_drifted_text), ...]) — drift goldens are
# byte-offset slices into the str, identical to the reference's output.
UNI_FIXTURES = [
    (
        "const grüße = 1;\nfunction f() { grüße(); }",
        [("function", "nction f"), ("{", "g")],
    ),
    (
        "// \U0001f680\U0001f680 rocket\nfunction gü() { return obj.method; }",
        [("function", "on gü() "), ("property_identifier", " }")],
    ),
    (
        "let π = 3.14159; let r = π * 2;",
        [("let", "et "), ("*", "2")],
    ),
    (
        '<div title="ünïcode">Grüße — Welt</div>',
        [("jsx_text", "üße — Welt</div>")],
    ),
]


def _leaves(node, acc):
    if isinstance(node, dict):
        if node.get("text") is not None:
            acc.append((node["type"], node["text"]))
        for c in node.get("children") or []:
            _leaves(c, acc)
    return acc


@pytest.mark.skipif(not HAS_TREE_SITTER, reason="tree-sitter binary stack unavailable")
@pytest.mark.parametrize("idx", range(len(UNI_FIXTURES)))
def test_nonascii_drift_pinned(idx):
    src, pins = UNI_FIXTURES[idx]
    leaves = _leaves(parse_jsx(src)["ast"], [])
    for leaf_type, drifted in pins:
        got = [t for ty, t in leaves if ty == leaf_type]
        assert drifted in got, f"{leaf_type}: {got!r} lacks pinned drift {drifted!r}"
    # the drift is REAL: byte length > char length, so at least one leaf
    # text must differ from a char-accurate slice of the same node
    assert len(src.encode("utf-8")) > len(src)
    assert any(t and t not in src.replace(" ", "") or t == "" for _, t in leaves)


@pytest.mark.skipif(not HAS_TREE_SITTER, reason="tree-sitter binary stack unavailable")
def test_drift_is_byte_arithmetic():
    """Re-derive one pinned golden from first principles: two 4-byte
    emoji (+3 drift chars each) and one 2-byte 'ü' (+1) put the
    property_identifier slice 7 chars past 'method' — exactly ' }'."""
    src = UNI_FIXTURES[1][0]
    start_char = src.index("method")
    drift = len(src[:start_char].encode("utf-8")) - start_char
    assert drift == 7
    expect = src[start_char + drift : start_char + drift + len("method")]
    assert expect == " }"
    leaves = _leaves(parse_jsx(src)["ast"], [])
    assert ("property_identifier", expect) in leaves


@pytest.mark.skipif(not HAS_TREE_SITTER, reason="tree-sitter binary stack unavailable")
@pytest.mark.parametrize("idx", range(len(UNI_FIXTURES)))
def test_nonascii_parity_vs_reference(idx):
    """Node-for-node: identical drift to the reference parser itself.
    Opt-in (ADVICE r4): executes code from the untrusted reference
    checkout in-process — the pinned goldens above are the always-on
    contract."""
    from conftest import reference_execution_enabled

    if not reference_execution_enabled():
        pytest.skip(
            "live-reference execution is opt-in (untrusted checkout): "
            "set SPARK_GRAFT_REF_PARITY=1"
        )
    ref_dir = os.environ.get("SPARK_GRAFT_TS_FALLBACK_DIR", "/root/reference")
    if not os.path.isdir(os.path.join(ref_dir, "core")):
        pytest.skip("reference checkout unavailable")
    sys.path.insert(0, ref_dir)
    try:
        import importlib

        ref = importlib.import_module("core.jsx_treesitter_parser")
        src = UNI_FIXTURES[idx][0]
        with tempfile.NamedTemporaryFile("w", suffix=".jsx", delete=False) as f:
            f.write(src)
            path = f.name
        try:
            exp = ref.parse_jsx_with_treesitter(path)
        finally:
            os.unlink(path)
        got = parse_jsx(src)
        assert got["ast"] == exp["ast"]
        assert got["call_graph"] == {k: sorted(v) for k, v in exp["call_graph"].items()}
    finally:
        sys.path.remove(ref_dir)


@pytest.mark.parametrize("idx", range(len(UNI_FIXTURES)))
def test_nonascii_call_graph_agrees_across_faces(idx):
    """The fallback face tokenizes chars (no drift possible in its leaf
    text) but the NORMALIZED surface downstream scores consume — the
    call graph with alpha-renamed callees — matches the tree-sitter face
    on every non-ASCII fixture."""
    src, _ = UNI_FIXTURES[idx]
    fb = parse_js(src)
    fb_cg = {k: sorted(v) for k, v in fb["call_graph"].items()}
    if not HAS_TREE_SITTER:
        pytest.skip("tree-sitter face unavailable for comparison")
    ts_cg = parse_jsx(src)["call_graph"]
    assert fb_cg == ts_cg
