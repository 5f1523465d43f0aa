"""JSX -> HTML node normalization (structure_comparator.py:115-226).

Replicates the reference's attribute/style mapping tables and
``normalize_jsx_node`` semantics so C1 can compare a Babel-style JSX
element tree against an HTML parse tree:

  * attribute renames className->class, htmlFor->for, onClick->onclick,
    … (structure_comparator.py:115-125); unknown names lowercased;
  * style objects -> CSS strings with camelCase->kebab-case property
    names, explicit mappings first (backgroundColor->background-color,
    …, structure_comparator.py:128-140) then the generic regex
    (structure_comparator.py:188-200), '; '-joined in sorted key order;
  * string-literal values pass through; jsx_expression values become
    '[dynamic]' unless they are style object expressions
    (structure_comparator.py:204-215);
  * jsx_text -> {'type':'text','content': stripped value}; attrs with
    empty name or value are dropped.

Fidelity note: in the reference these tables are DEAD CODE —
``normalize_jsx_node`` is reachable only from itself (verified: its only
call site is its own recursion at structure_comparator.py:159) and it
expects a Babel-style AST shape ('openingElement') that the live
tree-sitter parser never produces. This engine exposes the semantics as
a usable operator (normalize a Babel-style JSX element dict, or map a
single attribute dict) and pins the tables with tests.
"""

from __future__ import annotations

import re
from typing import Any

JSX_TO_HTML_ATTRS = {
    "className": "class",
    "htmlFor": "for",
    "onClick": "onclick",
    "onChange": "onchange",
    "onSubmit": "onsubmit",
    "onKeyDown": "onkeydown",
    "onKeyUp": "onkeyup",
    "onFocus": "onfocus",
    "onBlur": "onblur",
}

STYLE_PROPERTY_MAPPINGS = {
    "backgroundColor": "background-color",
    "fontSize": "font-size",
    "fontWeight": "font-weight",
    "marginLeft": "margin-left",
    "marginRight": "margin-right",
    "marginTop": "margin-top",
    "marginBottom": "margin-bottom",
    "paddingLeft": "padding-left",
    "paddingRight": "padding-right",
    "paddingTop": "padding-top",
    "paddingBottom": "padding-bottom",
}


def camel_to_kebab(key: str) -> str:
    """structure_comparator.py:195-199: explicit mapping first, else the
    generic [A-Z] -> '-x' regex."""
    return STYLE_PROPERTY_MAPPINGS.get(key) or re.sub(
        r"[A-Z]", lambda m: f"-{m.group(0).lower()}", key
    )


def normalize_style_object(style_obj: dict) -> str:
    # structure_comparator.py:188-200: '; '-joined sorted kebab pairs
    normalized = {camel_to_kebab(k): v for k, v in style_obj.items()}
    return "; ".join(f"{k}: {v}" for k, v in sorted(normalized.items()))


def _attr_value(value: dict) -> Any:
    # structure_comparator.py:204-215
    if value.get("type") == "string_literal":
        return value.get("value", "")
    if value.get("type") == "jsx_expression":
        expr = value.get("expression", {})
        if expr.get("type") == "object_expression":
            out = {}
            for prop in expr.get("properties", []):
                if prop.get("type") == "object_property":
                    k = prop.get("key", {}).get("name", "")
                    v = prop.get("value", {}).get("value", "")
                    if k and v:
                        out[k] = v
            return out
        return "[dynamic]"
    return ""


def normalize_jsx_attrs(attrs: list[dict]) -> dict:
    # structure_comparator.py:172-186
    result: dict[str, Any] = {}
    for attr in attrs:
        if attr.get("type") != "jsx_attribute":
            continue
        name = attr.get("name", {}).get("name", "")
        value = _attr_value(attr.get("value", {}))
        if name and value:
            html_name = JSX_TO_HTML_ATTRS.get(name, name.lower())
            result[html_name] = value
            if name == "style" and isinstance(value, dict):
                result[html_name] = normalize_style_object(value)
    return result


def _is_valid(node: dict) -> bool:
    return node.get("type") in ("jsx_element", "jsx_text")


def normalize_jsx_node(node: dict) -> dict:
    """Babel-style JSX element dict -> C1-comparable HTML-shaped node
    (structure_comparator.py:152-170)."""
    if node.get("type") == "jsx_element":
        return {
            "tag": node.get("openingElement", {}).get("name", {}).get("name", ""),
            "attrs": normalize_jsx_attrs(node.get("openingElement", {}).get("attributes", [])),
            "children": [
                normalize_jsx_node(c) for c in node.get("children", []) if _is_valid(c)
            ],
        }
    if node.get("type") == "jsx_text":
        return {"type": "text", "content": node.get("value", "").strip()}
    return {}
