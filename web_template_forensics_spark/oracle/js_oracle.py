"""JS/TS structural parse + compare oracle (reference C11-C16 semantics).

The reference parses JS with tree-sitter grammars (core/js_logic_analyzer.py:
40-75); tree-sitter grammar binaries can't ship with this repo, so the
parser here is a from-scratch lightweight STRUCTURAL parser that produces
the same normalized-AST node shape the reference's comparators consume:

    {'type': 'identifier', 'name': 'idN'}              (alpha-renamed)
    {'type': 'string'|'number'|..., 'value': 'litN'}   (alpha-renamed)
    {'type': 'function_declaration'|'function_expression'|'arrow_function'
             |'method_definition', 'name': raw_name, 'children': [...]}
    {'type': 'call_expression', 'callee': mapped_name, 'children': [...]}
    {'type': <other>, 'children': [...], 'text': leaf_source_or_None}

plus a call graph {caller_function_name: {callee_name}} built exactly like
core/js_logic_analyzer.py:76-134 (callee looked up through the CURRENT
id_map state — js_logic_analyzer.py:136-144).

The comparison layer replicates compare_files (js_logic_analyzer.py:158-224)
bit-for-bit, INCLUDING the verified quirks (SURVEY.md §5.3):
  Q1  function 'body' key is never emitted -> body similarity constant 1.0
      -> pair score = 0.3*signature + 0.7;
  Q2  the import extractor matches 'import_declaration'/'export_declaration'
      but parsers emit 'import_statement'/'export_statement' -> imports
      always [] -> import similarity 1.0;
  Q3  control-flow nodes carry no 'condition'/'body' keys -> every
      same-type pair scores 1.0;
  and class_declaration nodes go through the DEFAULT normalization branch
  (no 'name' key), so _compare_classes' name gate is None == None.

Deviation note (documented): node-type coverage of this parser is the
structural subset the comparators read; exotic syntax falls into generic
leaf/children nodes. The scoring formulas are exact.
"""

from __future__ import annotations

import difflib
import re
from typing import Any

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<string>'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*"|`(?:\\.|[^`\\])*`)
  | (?P<number>\d[\w.]*)
  | (?P<id>[A-Za-z_$][\w$]*)
  | (?P<arrow>=>)
  | (?P<punct>[{}()\[\];,.:?!<>=+\-*/%&|^~@#])
    """,
    re.VERBOSE | re.DOTALL,
)

_KEYWORDS = frozenset(
    "function class if for while switch try catch finally return const let var "
    "import export from new else do break continue throw typeof instanceof "
    "async await extends super this default case delete in of void yield "
    "true false null undefined interface type enum".split()
)

_FLOW_KEYWORDS = {
    "if": "if_statement",
    "for": "for_statement",
    "while": "while_statement",
    "switch": "switch_statement",
    "try": "try_statement",
}


def tokenize(code: str) -> list[tuple[str, str]]:
    toks = []
    for m in _TOKEN_RE.finditer(code):
        kind = m.lastgroup
        if kind == "comment":
            continue
        text = m.group()
        if kind == "id" and text in ("true", "false"):
            kind = "bool"
        toks.append((kind, text))
    return toks


class _Normalizer:
    """Single-pass structural parse with reference-identical renaming."""

    def __init__(self) -> None:
        self.id_map: dict[str, str] = {}
        self.lit_map: dict[str, str] = {}
        self.call_graph: dict[str, set] = {}
        self.function_stack: list[str] = []
        self.anon_counter = 0
        self.toks: list[tuple[str, str]] = []
        self.i = 0

    # -- token helpers -----------------------------------------------------
    def peek(self, off: int = 0):
        j = self.i + off
        return self.toks[j] if j < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def _ident_node(self, name: str) -> dict:
        if name not in self.id_map:
            self.id_map[name] = f"id{len(self.id_map)}"
        return {"type": "identifier", "name": self.id_map[name]}

    def _lit_node(self, kind: str, text: str) -> dict:
        type_name = {"string": "string", "number": "number", "bool": text}[kind]
        if text not in self.lit_map:
            self.lit_map[text] = f"lit{len(self.lit_map)}"
        return {"type": type_name, "value": self.lit_map[text]}

    # -- structural parse ----------------------------------------------------
    def parse_block(self, stop: str | None = "}") -> list[dict]:
        """Parse statements/expressions until ``stop`` punct (consumed) or EOF."""
        children: list[dict] = []
        pending_name: str | None = None  # variable-declarator name attribution
        while True:
            kind, text = self.peek()
            if kind is None:
                return children
            if kind == "punct" and text == stop:
                self.next()
                return children
            if kind == "punct" and text == "{":
                self.next()
                children.append({"type": "statement_block", "children": self.parse_block("}"), "text": None})
                continue
            if kind == "id" and text in ("import", "export"):
                children.append(self._parse_import_export())
                pending_name = None
                continue
            if kind == "id" and text == "function":
                children.append(self._parse_function(pending_name))
                pending_name = None
                continue
            if kind == "id" and text == "class":
                children.append(self._parse_class())
                pending_name = None
                continue
            if kind == "id" and text in _FLOW_KEYWORDS:
                children.append(self._parse_flow(_FLOW_KEYWORDS[text]))
                pending_name = None
                continue
            if kind == "id" and text in ("const", "let", "var"):
                self.next()
                nk, nt = self.peek()
                if nk == "id" and nt not in _KEYWORDS:
                    pending_name = nt
                continue
            if kind == "id" and text not in _KEYWORDS:
                node, consumed_name = self._parse_ident_lead(pending_name)
                children.append(node)
                if consumed_name:
                    pending_name = None
                continue
            if kind == "punct" and text == "(":
                # possible parenthesized arrow function: ( params ) => ...
                arrow = self._try_arrow(pending_name)
                if arrow is not None:
                    children.append(arrow)
                    pending_name = None
                    continue
                self.next()
                children.append({"type": "parenthesized_expression", "children": self.parse_block(")"), "text": None})
                continue
            if kind in ("string", "number", "bool"):
                self.next()
                children.append(self._lit_node(kind, text))
                continue
            # generic punct / keyword leaf
            self.next()
            if kind == "punct" and text in (";", ","):
                pending_name = None
                continue
            children.append({"type": text, "children": [], "text": text})
        return children

    def _parse_import_export(self) -> dict:
        _, kw = self.next()  # import/export
        leaf_children: list[dict] = []
        while True:
            kind, text = self.peek()
            if kind is None or (kind == "punct" and text == ";"):
                if kind is not None:
                    self.next()
                break
            if kind == "id" and text == "function":  # export function f() {...}
                fn = self._parse_function(None)
                return {"type": f"{kw}_statement", "children": [fn], "text": None}
            self.next()
            leaf_children.append({"type": text, "children": [], "text": text})
        return {"type": f"{kw}_statement", "children": leaf_children, "text": None}

    def _parse_params(self) -> list[dict]:
        out: list[dict] = []
        kind, text = self.peek()
        if not (kind == "punct" and text == "("):
            return out
        self.next()
        depth = 1
        while depth:
            kind, text = self.next()
            if kind is None:
                break
            if kind == "punct" and text == "(":
                depth += 1
            elif kind == "punct" and text == ")":
                depth -= 1
            elif kind == "id" and text not in _KEYWORDS and depth == 1:
                out.append(self._ident_node(text))
            elif kind in ("string", "number", "bool"):
                out.append(self._lit_node(kind, text))
        return out

    def _enter_function(self, type_name: str, name: str | None, params_then_body) -> dict:
        func_name = name or f"anon_func_{self.anon_counter}"
        if name is None:
            self.anon_counter += 1
        self.function_stack.append(func_name)
        self.call_graph.setdefault(func_name, set())
        children = params_then_body()
        self.function_stack.pop()
        return {"type": type_name, "name": func_name, "children": children}

    def _parse_function(self, assigned_name: str | None) -> dict:
        self.next()  # 'function'
        kind, text = self.peek()
        name = None
        if kind == "id" and text not in _KEYWORDS:
            name = text
            self.next()
        type_name = "function_declaration" if assigned_name is None and name else "function_expression"
        eff_name = name or assigned_name

        def body():
            children: list[dict] = []
            if name:
                children.append(self._ident_node(name))
            children.extend(self._parse_params())
            k, t = self.peek()
            if k == "punct" and t == "{":
                self.next()
                children.append({"type": "statement_block", "children": self.parse_block("}"), "text": None})
            return children

        return self._enter_function(type_name, eff_name, body)

    def _try_arrow(self, assigned_name: str | None) -> dict | None:
        """At '(' — look ahead for ') =>'. Returns arrow node or None."""
        depth = 0
        j = self.i
        while j < len(self.toks):
            kind, text = self.toks[j]
            if kind == "punct" and text == "(":
                depth += 1
            elif kind == "punct" and text == ")":
                depth -= 1
                if depth == 0:
                    nk, nt = self.toks[j + 1] if j + 1 < len(self.toks) else (None, None)
                    if nk == "arrow":
                        break
                    return None
            j += 1
        else:
            return None

        def body():
            children = self._parse_params()
            self.next()  # '=>'
            k, t = self.peek()
            if k == "punct" and t == "{":
                self.next()
                children.append({"type": "statement_block", "children": self.parse_block("}"), "text": None})
            else:
                children.extend(self._parse_expression_until((";", ",", ")")))
            return children

        return self._enter_function("arrow_function", assigned_name, body)

    def _parse_class(self) -> dict:
        self.next()  # 'class'
        children: list[dict] = []
        kind, text = self.peek()
        if kind == "id" and text not in _KEYWORDS:
            self.next()
            children.append(self._ident_node(text))
        # optional extends X
        kind, text = self.peek()
        if kind == "id" and text == "extends":
            self.next()
            k2, t2 = self.peek()
            if k2 == "id":
                self.next()
                children.append(self._ident_node(t2))
        kind, text = self.peek()
        if kind == "punct" and text == "{":
            self.next()
            children.extend(self._parse_class_body())
        # class_declaration goes through the DEFAULT branch in the reference
        # normalizer -> no 'name' key (quirk: name gate compares None == None)
        return {"type": "class_declaration", "children": children, "text": None}

    def _parse_class_body(self) -> list[dict]:
        methods: list[dict] = []
        while True:
            kind, text = self.peek()
            if kind is None:
                return methods
            if kind == "punct" and text == "}":
                self.next()
                return methods
            if kind == "id" and text not in _KEYWORDS:
                nk, nt = self.peek(1)
                if nk == "punct" and nt == "(":
                    mname = text
                    self.next()

                    def body(mname=mname):
                        children = [self._ident_node(mname)]
                        children.extend(self._parse_params())
                        k, t = self.peek()
                        if k == "punct" and t == "{":
                            self.next()
                            children.append(
                                {"type": "statement_block", "children": self.parse_block("}"), "text": None}
                            )
                        return children

                    methods.append(self._enter_function("method_definition", mname, body))
                    continue
            self.next()  # skip modifiers/semicolons/etc.

    def _parse_flow(self, type_name: str) -> dict:
        self.next()  # keyword
        children: list[dict] = []
        kind, text = self.peek()
        if kind == "punct" and text == "(":
            self.next()
            children.append({"type": "parenthesized_expression", "children": self.parse_block(")"), "text": None})
        kind, text = self.peek()
        if kind == "punct" and text == "{":
            self.next()
            children.append({"type": "statement_block", "children": self.parse_block("}"), "text": None})
        # quirk Q3: no 'condition'/'body' keys — children only
        return {"type": type_name, "children": children, "text": None}

    def _parse_ident_lead(self, assigned_name: str | None) -> tuple[dict, bool]:
        """identifier ... — member chain, call, assignment-with-arrow, etc."""
        _, first = self.next()
        chain = [first]
        while True:
            kind, text = self.peek()
            if kind == "punct" and text == "." and self.peek(1)[0] == "id":
                self.next()
                chain.append(self.next()[1])
                continue
            break
        kind, text = self.peek()
        if kind == "arrow":  # x => ...
            def body():
                children = [self._ident_node(first)]
                self.next()  # '=>'
                k, t = self.peek()
                if k == "punct" and t == "{":
                    self.next()
                    children.append({"type": "statement_block", "children": self.parse_block("}"), "text": None})
                else:
                    children.extend(self._parse_expression_until((";", ",", ")")))
                return children

            return self._enter_function("arrow_function", assigned_name, body), True
        if kind == "punct" and text == "(":
            # call expression — callee mapped through the CURRENT id_map
            # (reference _get_callee_name: member -> property name)
            callee_raw = chain[-1]
            callee = self.id_map.get(callee_raw, callee_raw)
            if self.function_stack and callee:
                self.call_graph[self.function_stack[-1]].add(callee)
            self.next()
            children = [self._ident_node(c) for c in chain]
            children.append({"type": "arguments", "children": self.parse_block(")"), "text": None})
            return {"type": "call_expression", "callee": callee, "children": children}, False
        node = {"type": "member_expression", "children": [self._ident_node(c) for c in chain], "text": None}
        if len(chain) == 1:
            node = self._ident_node(first)
        return node, False

    def _parse_expression_until(self, stops: tuple) -> list[dict]:
        out: list[dict] = []
        while True:
            kind, text = self.peek()
            if kind is None or (kind == "punct" and text in stops):
                break
            if kind == "id" and text == "function":
                out.append(self._parse_function(None))
                continue
            if kind == "id" and text not in _KEYWORDS:
                node, _ = self._parse_ident_lead(None)
                out.append(node)
                continue
            if kind in ("string", "number", "bool"):
                self.next()
                out.append(self._lit_node(kind, text))
                continue
            self.next()
            out.append({"type": text, "children": [], "text": text})
        return out


def parse_js(code: str) -> dict[str, Any]:
    """code -> {'ast': normalized tree, 'call_graph': {fn: [callees]}}."""
    n = _Normalizer()
    n.toks = tokenize(code)
    ast = {"type": "program", "children": n.parse_block(stop=None), "text": None}
    return {"ast": ast, "call_graph": {k: sorted(v) for k, v in n.call_graph.items()}}


# ---------------------------------------------------------------------------
# comparators (C11-C16, reference formulas with quirks)
# ---------------------------------------------------------------------------


def _traverse_collect(tree: dict, types: tuple) -> list[dict]:
    out = []

    def walk(node):
        if node.get("type") in types:
            out.append(node)
        for c in node.get("children", []):
            walk(c)

    walk(tree)
    return out


def compare_call_graphs(cg1: dict, cg2: dict) -> float:
    # js_logic_analyzer.py:146-156 (C13)
    edges1 = {(a, b) for a, bs in cg1.items() for b in bs}
    edges2 = {(a, b) for a, bs in cg2.items() for b in bs}
    if not edges1 and not edges2:
        return 1.0
    if not edges1 or not edges2:
        return 0.0
    union = len(edges1 | edges2)
    return len(edges1 & edges2) / union if union else 0.0


def _sig_similarity(f1: dict, f2: dict) -> float:
    # js_logic_analyzer.py:265-276 (C12); params never emitted -> [] == []
    if f1.get("name") != f2.get("name"):
        return 0.0
    if len(f1.get("parameters", [])) != len(f2.get("parameters", [])):
        return 0.5
    return 1.0


def _tree_similarity(n1, n2) -> float:
    from .similarity import tree_similarity

    return tree_similarity(n1, n2)


def _body_similarity(f1: dict, f2: dict) -> float:
    # Q1: 'body' key never emitted -> {} vs {} -> 1.0
    return _tree_similarity(f1.get("body", {}), f2.get("body", {}))


def _compare_functions(tree1: dict, tree2: dict) -> float:
    fns1 = _traverse_collect(tree1, ("function_declaration", "method_definition"))
    fns2 = _traverse_collect(tree2, ("function_declaration", "method_definition"))
    if not fns1 and not fns2:
        return 1.0
    if not fns1 or not fns2:
        return 0.0
    matches = 0.0
    total = max(len(fns1), len(fns2))
    for f1 in fns1:
        best = 0.0
        for f2 in fns2:
            sim = 0.3 * _sig_similarity(f1, f2) + 0.7 * _body_similarity(f1, f2)
            best = max(best, sim)
        matches += best
    return matches / total


def _compare_imports(tree1: dict, tree2: dict) -> float:
    # Q2: extractor matches *_declaration, parsers emit *_statement -> []
    imps1 = _traverse_collect(tree1, ("import_declaration", "export_declaration"))
    imps2 = _traverse_collect(tree2, ("import_declaration", "export_declaration"))
    if not imps1 and not imps2:
        return 1.0
    if not imps1 or not imps2:
        return 0.0
    matches = 0.0
    total = max(len(imps1), len(imps2))
    for i1 in imps1:
        best = 0.0
        for i2 in imps2:
            if i1.get("source") == i2.get("source"):
                s1 = {s.get("name") for s in i1.get("specifiers", [])}
                s2 = {s.get("name") for s in i2.get("specifiers", [])}
                if not s1 and not s2:
                    best = max(best, 1.0)
                elif s1 and s2:
                    u = len(s1 | s2)
                    best = max(best, len(s1 & s2) / u if u else 0.0)
        matches += best
    return matches / total


def _compare_classes(tree1: dict, tree2: dict) -> float:
    cls1 = _traverse_collect(tree1, ("class_declaration", "class_expression"))
    cls2 = _traverse_collect(tree2, ("class_declaration", "class_expression"))
    if not cls1 and not cls2:
        return 1.0
    if not cls1 or not cls2:
        return 0.0
    matches = 0.0
    total = max(len(cls1), len(cls2))
    for c1 in cls1:
        best = 0.0
        for c2 in cls2:
            if c1.get("name") == c2.get("name"):  # None == None (quirk)
                m1 = c1.get("methods", [])
                m2 = c2.get("methods", [])
                if not m1 and not m2:
                    best = max(best, 1.0)
                elif m1 and m2:
                    mm = 0.0
                    for x in m1:
                        bb = 0.0
                        for y in m2:
                            if x.get("name") == y.get("name"):
                                bb = max(bb, _body_similarity(x, y))
                        mm += bb
                    best = max(best, mm / max(len(m1), len(m2)))
        matches += best
    return matches / total


def _compare_control_flow(tree1: dict, tree2: dict) -> float:
    fl1 = _traverse_collect(tree1, ("for_statement", "while_statement", "if_statement"))
    fl2 = _traverse_collect(tree2, ("for_statement", "while_statement", "if_statement"))
    if not fl1 and not fl2:
        return 1.0
    if not fl1 or not fl2:
        return 0.0
    matches = 0.0
    total = max(len(fl1), len(fl2))
    for n1 in fl1:
        best = 0.0
        for n2 in fl2:
            if n1.get("type") == n2.get("type"):
                # Q3: no 'condition'/'body' keys -> ratio('{}','{}') and {}=={}
                cond = difflib.SequenceMatcher(
                    None, str(n1.get("condition", {})), str(n2.get("condition", {}))
                ).ratio()
                body = _tree_similarity(n1.get("body", {}), n2.get("body", {}))
                best = max(best, 0.3 * cond + 0.7 * body)
        matches += best
    return matches / total


def compare_js(code1: str, code2: str) -> dict:
    """Reference compare_files (js_logic_analyzer.py:158-224), same output
    shape and rounding."""
    p1 = parse_js(code1)
    p2 = parse_js(code2)
    tree1, tree2 = p1["ast"], p2["ast"]
    cg1 = {k: set(v) for k, v in p1["call_graph"].items()}
    cg2 = {k: set(v) for k, v in p2["call_graph"].items()}

    function_similarity = _compare_functions(tree1, tree2)
    import_similarity = _compare_imports(tree1, tree2)
    class_similarity = _compare_classes(tree1, tree2)
    control_flow_similarity = _compare_control_flow(tree1, tree2)
    call_graph_similarity = compare_call_graphs(cg1, cg2)

    fns1 = _traverse_collect(tree1, ("function_declaration", "method_definition"))
    fns2 = _traverse_collect(tree2, ("function_declaration", "method_definition"))
    total_functions = max(len(fns1), len(fns2))
    matching = different = missing = 0
    matched2: set[int] = set()
    for f1 in fns1:
        best_score = 0.0
        best_idx = -1
        for idx2, f2 in enumerate(fns2):
            sim = 0.3 * _sig_similarity(f1, f2) + 0.7 * _body_similarity(f1, f2)
            if sim > best_score:
                best_score = sim
                best_idx = idx2
        if best_score > 0.8:
            matching += 1
            if best_idx >= 0:
                matched2.add(best_idx)
        elif best_score > 0.5:
            different += 1
            if best_idx >= 0:
                matched2.add(best_idx)
        else:
            missing += 1
    extra = len(fns2) - len(matched2)

    overall = (
        function_similarity * 0.35
        + import_similarity * 0.15
        + class_similarity * 0.15
        + control_flow_similarity * 0.15
        + call_graph_similarity * 0.2
    )
    return {
        "similarity": round(overall, 2),
        "details": {
            "function_similarity": round(function_similarity, 2),
            "import_similarity": round(import_similarity, 2),
            "class_similarity": round(class_similarity, 2),
            "control_flow_similarity": round(control_flow_similarity, 2),
            "call_graph_similarity": round(call_graph_similarity, 2),
            "total_functions": total_functions,
            "matching_functions": matching,
            "different_functions": different,
            "missing_functions": missing,
            "extra_functions": extra,
        },
    }
