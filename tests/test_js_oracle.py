"""JS oracle tests: the FIXTURES.md §4 pinned compare_files result + parser
semantics (alpha-renaming, call graph, quirks Q1-Q3)."""

from web_template_forensics_spark.oracle.js_oracle import (
    compare_call_graphs,
    compare_js,
    parse_js,
)

FILE1 = "function foo(a,b){if(a>b){return bar(a);}return a+b;} function bar(z){return z*2;}"
# renamed-identifier variant: bar's DEFINITION renamed to baz (call site kept)
FILE2 = "function foo(a,b){if(a>b){return bar(a);}return a+b;} function baz(z){return z*2;}"


def test_fixture_compare_files():  # FIXTURES.md §4, verified vs reference
    r = compare_js(FILE1, FILE2)
    d = r["details"]
    assert r["similarity"] == 0.95
    assert d["function_similarity"] == 0.85
    assert d["import_similarity"] == 1.0
    assert d["class_similarity"] == 1.0
    assert d["control_flow_similarity"] == 1.0
    assert d["call_graph_similarity"] == 1.0
    assert d["total_functions"] == 2
    assert d["matching_functions"] == 1
    assert d["different_functions"] == 1
    assert d["missing_functions"] == 0
    assert d["extra_functions"] == 1


def test_identical_files_score_1():
    r = compare_js(FILE1, FILE1)
    assert r["similarity"] == 1.0
    assert r["details"]["matching_functions"] == 2


def test_call_graph_extraction():
    p = parse_js(FILE1)
    assert p["call_graph"] == {"foo": ["bar"], "bar": []}
    # member-chain callee = property name
    p2 = parse_js("function f(){ console.log(1); obj.a.deep(2); }")
    assert sorted(p2["call_graph"]["f"]) == ["deep", "log"]


def test_alpha_renaming_first_seen_order():
    ast = parse_js("function f(x, y) { return x + y; }")["ast"]
    # f -> id0, x -> id1, y -> id2 (first-seen order)
    fn = ast["children"][0]
    assert fn["type"] == "function_declaration" and fn["name"] == "f"
    ids = []

    def walk(n):
        if n.get("type") == "identifier":
            ids.append(n["name"])
        for c in n.get("children", []):
            walk(c)

    walk(fn)
    assert ids[:3] == ["id0", "id1", "id2"]


def test_quirks_q1_q2_q3():
    # Q2: imports never extracted -> import similarity 1.0 even when they differ
    a = "import {x} from 'mod1'; function f(){}"
    b = "import {y} from 'mod2'; function f(){}"
    r = compare_js(a, b)
    assert r["details"]["import_similarity"] == 1.0
    # Q3: different if-bodies still score control_flow 1.0
    a = "function f(){ if (1 > 0) { doA(); } }"
    b = "function f(){ if (2 < 5) { doB(); doC(); } }"
    assert compare_js(a, b)["details"]["control_flow_similarity"] == 1.0
    # Q1: renamed-body functions with same name+arity match at 1.0
    a = "function f(){ return 1; }"
    b = "function f(){ return 99999; }"
    assert compare_js(a, b)["details"]["function_similarity"] == 1.0


def test_arrow_and_variable_declarator_names():
    p = parse_js("const add = (a, b) => a + b; const run = () => { add(1, 2); };")
    assert "add" in p["call_graph"]
    # quirk (reference js_logic_analyzer.py:136-144): the callee is looked
    # up through the CURRENT id_map, so a name already alpha-renamed (the
    # `const add` declarator identifier) records the RENAMED edge target,
    # while a forward-referenced function (FILE1's `bar`) records raw text.
    assert p["call_graph"]["run"] == ["id0"]


def test_class_methods_in_call_graph():
    p = parse_js("class C { m1() { helper(); } m2() {} } function helper(){}")
    assert p["call_graph"]["m1"] == ["helper"]
    assert "m2" in p["call_graph"]
    # class node has no 'name' key (default-branch quirk)
    cls = [n for n in p["ast"]["children"] if n["type"] == "class_declaration"][0]
    assert "name" not in cls


def test_call_graph_jaccard():
    assert compare_call_graphs({}, {}) == 1.0
    assert compare_call_graphs({"a": {"b"}}, {}) == 0.0
    assert compare_call_graphs({"a": {"b", "c"}}, {"a": {"b"}}) == 0.5
