"""CSS/JS comparison UDFs — the reference's C7-C16 operators as Arrow
batches over the from-scratch oracles (css_oracle / js_oracle)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle.css_oracle import compare_css, css_rule_rows
from ..oracle.js_oracle import compare_js

_CSS_SCHEMA = T.StructType(
    [
        T.StructField("css_similarity", T.DoubleType()),
        T.StructField("matching_selectors", T.IntegerType()),
        T.StructField("different_selectors", T.IntegerType()),
        T.StructField("missing_selectors", T.IntegerType()),
        T.StructField("extra_selectors", T.IntegerType()),
    ]
)


@F.pandas_udf(_CSS_SCHEMA)
def compare_css_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    rows = []
    for x, y in zip(a, b):
        r = compare_css(x or "", y or "")
        rows.append(
            (
                r["css_similarity"],
                r["matching_selectors"],
                r["different_selectors"],
                r["missing_selectors"],
                r["extra_selectors"],
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "css_similarity",
            "matching_selectors",
            "different_selectors",
            "missing_selectors",
            "extra_selectors",
        ],
    )


_RULE_ROW = T.ArrayType(
    T.StructType(
        [
            T.StructField("scope", T.StringType()),
            T.StructField("selector", T.StringType()),
            T.StructField("prop", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("important", T.BooleanType()),
        ]
    )
)


@F.pandas_udf(_RULE_ROW)
def css_rules_udf(css: pd.Series) -> pd.Series:
    """stylesheet -> exploded-ready rule rows (P4 relational shape)."""
    return css.map(lambda s: css_rule_rows(s or ""))


_JS_SCHEMA = T.StructType(
    [
        T.StructField("similarity", T.DoubleType()),
        T.StructField("function_similarity", T.DoubleType()),
        T.StructField("import_similarity", T.DoubleType()),
        T.StructField("class_similarity", T.DoubleType()),
        T.StructField("control_flow_similarity", T.DoubleType()),
        T.StructField("call_graph_similarity", T.DoubleType()),
        T.StructField("total_functions", T.IntegerType()),
        T.StructField("matching_functions", T.IntegerType()),
        T.StructField("different_functions", T.IntegerType()),
        T.StructField("missing_functions", T.IntegerType()),
        T.StructField("extra_functions", T.IntegerType()),
    ]
)


@F.pandas_udf(_JS_SCHEMA)
def compare_js_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    rows = []
    for x, y in zip(a, b):
        r = compare_js(x or "", y or "")
        d = r["details"]
        rows.append(
            (
                r["similarity"],
                d["function_similarity"],
                d["import_similarity"],
                d["class_similarity"],
                d["control_flow_similarity"],
                d["call_graph_similarity"],
                d["total_functions"],
                d["matching_functions"],
                d["different_functions"],
                d["missing_functions"],
                d["extra_functions"],
            )
        )
    return pd.DataFrame(
        rows,
        columns=[f.name for f in _JS_SCHEMA.fields],
    )


_PARSE_JSX_SCHEMA = T.StructType(
    [
        T.StructField("ast_json", T.StringType()),
        T.StructField(
            "edges",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("caller", T.StringType()),
                        T.StructField("callee", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("n_functions", T.IntegerType()),
    ]
)


@F.pandas_udf(_PARSE_JSX_SCHEMA)
def parse_jsx_udf(code: pd.Series) -> pd.DataFrame:
    """P2: tree-sitter JSX/TSX -> normalized-AST JSON + call-graph edge
    rows, Arrow-batched (falls back to the regex parser without the
    binary stack — oracle/jsx_treesitter.py)."""
    import json as _json

    from ..oracle.forensic_oracle import _extract_functions
    from ..oracle.jsx_treesitter import parse_jsx_or_fallback

    rows = []
    for c in code:
        p = parse_jsx_or_fallback(c or "")
        edges = [
            {"caller": a, "callee": b}
            for a, bs in sorted(p["call_graph"].items())
            for b in bs
        ]
        rows.append(
            (
                _json.dumps(p["ast"], sort_keys=True, separators=(",", ":")),
                edges,
                len(_extract_functions(p["ast"])),
            )
        )
    return pd.DataFrame(rows, columns=["ast_json", "edges", "n_functions"])


_ANALYZE_SCHEMA = T.StructType(
    [
        T.StructField("html_similarity", T.DoubleType()),
        T.StructField("jsx_structure_similarity", T.DoubleType()),
        T.StructField("jsx_callgraph_similarity", T.DoubleType()),
        T.StructField("jsx_body_similarity", T.DoubleType()),
        T.StructField("jsx_similarity", T.DoubleType()),
        T.StructField("js_similarity", T.DoubleType()),
        T.StructField("overall_similarity", T.DoubleType()),
    ]
)


@F.pandas_udf(_ANALYZE_SCHEMA)
def analyze_templates_udf(
    html1: pd.Series, html2: pd.Series,
    jsx1: pd.Series, jsx2: pd.Series,
    js1: pd.Series, js2: pd.Series,
) -> pd.DataFrame:
    """E2 single-pair analysis (forensic_analyzer.py:60-143) incl. the
    A7 renormalized overall and A8 jsx combine; None columns = side
    absent (scored 0.0 and dropped from the A7 weights)."""
    from ..oracle.forensic_oracle import analyze_pair

    rows = []
    for h1, h2, x1, x2, s1, s2 in zip(html1, html2, jsx1, jsx2, js1, js2):
        r = analyze_pair(h1, h2, x1, x2, s1, s2)
        rows.append(tuple(r[f.name] for f in _ANALYZE_SCHEMA.fields))
    return pd.DataFrame(rows, columns=[f.name for f in _ANALYZE_SCHEMA.fields])
