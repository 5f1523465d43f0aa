"""C11-C16 parity against the ACTUAL reference JSLogicAnalyzer.

The reference's tree-sitter stack runs in this sandbox (bundled wheel +
prebuilt grammar), so beyond our own pinned fixtures we can compare
``js_oracle.compare_js`` output — similarity and every details field —
against ``core.js_logic_analyzer.JSLogicAnalyzer.compare_files`` on the
same sources. The Q1-Q3 quirks (constant body/import/flow scores) make
the score surface largely structural, and the from-scratch regex parser
reproduces it exactly on this corpus."""

import os
import sys
import tempfile

import pytest

from web_template_forensics_spark.oracle.js_oracle import compare_js
from web_template_forensics_spark.oracle.jsx_treesitter import HAS_TREE_SITTER

pytestmark = pytest.mark.skipif(
    not HAS_TREE_SITTER, reason="reference tree-sitter stack unavailable"
)

CASES = [
    ("function add(a,b){ return a+b; }\nfunction mul(x,y){ return x*y; }",
     "function add(a,b){ return a+b; }\nfunction mul(x,y){ return x*y; }"),
    ("function add(a,b){ return a+b; }\nfunction mul(x,y){ return x*y; }",
     "function add(a,b){ return a-b; }\nfunction div(x,y){ return x/y; }"),
    ("import {x} from 'mod';\nfunction f(){ if (x > 1) { g(); } }\nfunction g(){ return 1; }",
     "import {y} from 'mod2';\nfunction f(){ if (y > 2) { h(); } }\nfunction h(){ return 2; }"),
    ("class A { foo(a) { return a; } bar() { this.foo(1); } }",
     "class A { foo(a) { return a; } baz() { this.foo(2); } }"),
    ("let v = 1;", "let w = 2;"),
    ("const f = (a) => a * 2;\nconst g = (b) => f(b) + 1;",
     "const f = (a) => a * 3;\nconst h = (b) => f(b) - 1;"),
    ("function outer(){ function inner(){ return 1; } return inner(); }",
     "function outer(){ function inner(){ return 2; } return inner(); }"),
    ("for (let i=0;i<10;i++){ console.log(i); }",
     "while (x < 10) { console.log(x); x++; }"),
    ("export default function App(){ return 1; }",
     "export default function App(){ return 2; }"),
    ("async function fetchIt(u){ const r = await fetch(u); return r.json(); }",
     "async function fetchIt(u){ const r = await fetch(u); return r.text(); }"),
    ("class B extends A { constructor(x){ super(x); this.v = x; } m(){ return this.v; } }",
     "class B extends A { constructor(x){ super(x); this.w = x; } m(){ return this.w; } }"),
    ("let obj = { a: 1, b: function(){ return 2; } };",
     "let obj = { a: 1, c: function(){ return 3; } };"),
    ("try { risky(); } catch (e) { handle(e); } finally { done(); }",
     "try { risky(); } catch (err) { log(err); }"),
    ("switch (k) { case 1: f(); break; default: g(); }",
     "switch (k) { case 2: h(); break; }"),
    ("const t = `a ${x} b ${y}`;", "const t = `a ${y} b ${x}`;"),
    ("function f(...args){ return args.map(a => a + 1); }",
     "function f(...xs){ return xs.map(v => v + 1); }"),
    ("", "function z(){}"),
    ("// only a comment", "/* block */"),
    ("x?.y?.z();", "x.y.z();"),
    ("const {a, b} = obj; const [c, d] = arr;",
     "const {a, e} = obj; const [c, f] = arr;"),
]


@pytest.fixture(scope="module")
def reference_analyzer():
    from conftest import reference_execution_enabled

    if not reference_execution_enabled():
        pytest.skip(
            "live-reference execution is opt-in (untrusted checkout): "
            "set SPARK_GRAFT_REF_PARITY=1"
        )
    sys.path.insert(0, "/root/reference")
    try:
        from core.js_logic_analyzer import JSLogicAnalyzer

        yield JSLogicAnalyzer()
    finally:
        sys.path.remove("/root/reference")


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_compare_js_matches_reference(reference_analyzer, idx):
    a, b = CASES[idx]
    with tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f1, \
         tempfile.NamedTemporaryFile("w", suffix=".js", delete=False) as f2:
        f1.write(a)
        f2.write(b)
        p1, p2 = f1.name, f2.name
    try:
        ref = reference_analyzer.compare_files(p1, p2)
    finally:
        os.unlink(p1)
        os.unlink(p2)
    got = compare_js(a, b)
    assert got["similarity"] == ref["similarity"]
    assert got["details"] == ref["details"]
