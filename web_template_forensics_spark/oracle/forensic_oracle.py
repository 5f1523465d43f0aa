"""E2: the single-pair template analysis (core/forensic_analyzer.py:60-143).

Pure-Python replay of ``ForensicAnalyzer.analyze_templates``:

  * html: P1 parse + C1 structure compare -> similarity;
  * jsx: P2 tree-sitter parse (oracle/jsx_treesitter.py) + C1 on the
    normalized ASTs + call-graph Jaccard + greedy function-body match,
    combined 0.6/0.2/0.2 (A8, forensic_analyzer.py:116);
  * js: C11 compare (js_oracle.compare_js);
  * overall: A7 — 0.3/0.3/0.4 over NONZERO scores, renormalized
    (forensic_analyzer.py:32-51).

Body-similarity quirk (Q1 family): the greedy body loop compares
``func.get('body', {})`` but normalized function nodes never carry a
``body`` key (forensic_analyzer.py:99-113), so every candidate pair
scores tree_similarity({}, {}) == 1.0 and the body term collapses to
min(n_funcs1, n_funcs2) / max(...) (1.0 when both sides have none).
"""

from __future__ import annotations

from typing import Any

from .html_oracle import parse_html_tree
from .js_oracle import compare_js
from .jsx_treesitter import parse_jsx_or_fallback
from .similarity import compare_structures


def callgraph_jaccard(cg1: dict, cg2: dict) -> float:
    # forensic_analyzer.py:359-369 (edge-set Jaccard; both empty -> 1.0)
    e1 = {(a, b) for a, bs in cg1.items() for b in bs}
    e2 = {(a, b) for a, bs in cg2.items() for b in bs}
    if not e1 and not e2:
        return 1.0
    if not e1 or not e2:
        return 0.0
    return len(e1 & e2) / len(e1 | e2)


def _extract_functions(ast: dict) -> list[dict]:
    # forensic_analyzer.py:85-95
    out: list[dict] = []

    def walk(node: dict) -> None:
        if node.get("type") in (
            "function_declaration", "function_expression", "arrow_function", "method_definition"
        ):
            out.append(node)
        for child in node.get("children", []) or []:
            walk(child)

    walk(ast)
    return out


def body_similarity(ast1: dict, ast2: dict) -> float:
    """forensic_analyzer.py:97-114 with the missing-'body' quirk: every
    greedy candidate scores 1.0, so the result is min/max of the counts."""
    n1, n2 = len(_extract_functions(ast1)), len(_extract_functions(ast2))
    total = max(n1, n2)
    return min(n1, n2) / total if total else 1.0


def analyze_pair(
    html1: str | None, html2: str | None,
    jsx1: str | None, jsx2: str | None,
    js1: str | None, js2: str | None,
) -> dict[str, Any]:
    if html1 is not None and html2 is not None:
        html_sim = compare_structures(parse_html_tree(html1), parse_html_tree(html2)).similarity_score
    else:
        html_sim = 0.0

    jsx_struct = jsx_cg = 0.0
    jsx_body = 1.0
    jsx_sim = 0.0
    if jsx1 is not None and jsx2 is not None:
        p1, p2 = parse_jsx_or_fallback(jsx1), parse_jsx_or_fallback(jsx2)
        jsx_struct = compare_structures(p1["ast"], p2["ast"]).similarity_score
        jsx_cg = callgraph_jaccard(p1["call_graph"], p2["call_graph"])
        jsx_body = body_similarity(p1["ast"], p2["ast"])
        jsx_sim = jsx_struct * 0.6 + jsx_cg * 0.2 + jsx_body * 0.2  # A8

    js_sim = compare_js(js1, js2)["similarity"] if js1 is not None and js2 is not None else 0.0

    # A7: renormalized nonzero weights
    scores, weights = [], []
    for s, w in ((html_sim, 0.3), (jsx_sim, 0.3), (js_sim, 0.4)):
        if s > 0:
            scores.append(s)
            weights.append(w)
    overall = 0.0
    if scores:
        tw = sum(weights)
        overall = sum(s * (w / tw) for s, w in zip(scores, weights))
    return {
        "html_similarity": html_sim,
        "jsx_structure_similarity": jsx_struct,
        "jsx_callgraph_similarity": jsx_cg,
        "jsx_body_similarity": jsx_body,
        "jsx_similarity": jsx_sim,
        "js_similarity": js_sim,
        "overall_similarity": overall,
    }
