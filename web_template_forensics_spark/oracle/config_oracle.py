"""Config-file comparators (C20-C22) — reference semantics, driver-side.

package.json / tsconfig.json / tailwind.config comparisons operate on tiny
side data (one pair per project snapshot), so they run driver-side —
broadcast into matching jobs when needed, never a per-row UDF. Formulas
replicate core/json_similarity_checker.py and core/tailwind_analyzer.py
exactly (boilerplate exclusions, version-bump scoring, weight
reallocation, theme-extension subkey Jaccard). The reference evaluates
tailwind.config.js through a Node subprocess (tailwind_analyzer.py:111-124)
— the anti-pattern SURVEY.md §2.1 S6 flags; this engine takes the config
as an already-parsed dict (JSON or upstream-extracted), keeping the
compare semantics identical without per-row side processes.
"""

from __future__ import annotations

import re
from typing import Any

from .similarity import seq_ratio


def normalize_version(version: Any) -> str:
    # json_similarity_checker.py:6-10
    if not isinstance(version, str):
        return str(version)
    return re.sub(r"^[\^~><= ]+", "", version.strip())


def jaccard(a, b) -> float:
    a, b = set(a), set(b)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def _fuzzy(a, b) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return seq_ratio(a, b)


def _version_score(v1, v2) -> float:
    # json_similarity_checker.py:40-53 (equal -> 1.0, last-part +-1 -> 0.3)
    n1, n2 = normalize_version(v1), normalize_version(v2)
    if n1 == n2:
        return 1.0
    try:
        p1 = [int(x) for x in n1.split(".") if x.isdigit()]
        p2 = [int(x) for x in n2.split(".") if x.isdigit()]
        if len(p1) == len(p2) and len(p1) >= 2:
            if p1[:-1] == p2[:-1] and abs(p1[-1] - p2[-1]) == 1:
                return 0.3
    except Exception:  # noqa: BLE001
        pass
    return 0.0


def compare_dependencies(dep1: dict, dep2: dict) -> float:
    # json_similarity_checker.py:27-58 (boilerplate excluded from keys only)
    boilerplate = {"react", "react-dom", "next"}
    names1, names2 = set(dep1), set(dep2)
    key_sim = jaccard(names1 - boilerplate, names2 - boilerplate)
    shared = names1 & names2
    if not shared:
        return key_sim
    value_sim = sum(_version_score(dep1[n], dep2[n]) for n in shared) / len(shared)
    return 0.3 * key_sim + 0.7 * value_sim


def compare_scripts(s1: dict, s2: dict) -> float:
    # json_similarity_checker.py:60-74
    boiler = {"dev", "build", "start", "lint"}
    f1 = {k: v for k, v in s1.items() if k not in boiler}
    f2 = {k: v for k, v in s2.items() if k not in boiler}
    key_sim = jaccard(f1.keys(), f2.keys())
    shared = set(f1) & set(f2)
    if not shared:
        return key_sim
    cmd_sim = sum(_fuzzy(f1[k], f2[k]) for k in shared) / len(shared)
    return 0.6 * key_sim + 0.4 * cmd_sim


def compare_metadata(m1: dict, m2: dict) -> float:
    # json_similarity_checker.py:76-92
    norm = lambda s: str(s or "").strip().lower()  # noqa: E731
    scores = []
    for k in ["name", "version", "description", "keywords", "author"]:
        v1, v2 = m1.get(k), m2.get(k)
        if isinstance(v1, list) and isinstance(v2, list):
            scores.append(jaccard([norm(x) for x in v1], [norm(x) for x in v2]))
        else:
            n1, n2 = norm(v1), norm(v2)
            scores.append(1.0 if n1 == n2 and n1 != "" else 0.0)
    return sum(scores) / len(scores) if scores else 1.0


def _compare_config_blocks(j1: dict, j2: dict) -> float:
    # json_similarity_checker.py:94-107
    keys = [
        k for k in set(j1) & set(j2) if k.endswith("Config") or k in ("browserslist", "jest")
    ]
    if not keys:
        return 1.0
    scores = []
    for k in keys:
        v1, v2 = j1[k], j2[k]
        if isinstance(v1, dict) and isinstance(v2, dict):
            scores.append(jaccard(v1.keys(), v2.keys()))
        elif isinstance(v1, list) and isinstance(v2, list):
            scores.append(jaccard(v1, v2))
        else:
            scores.append(_fuzzy(str(v1), str(v2)))
    return sum(scores) / len(scores)


def package_json_similarity(pkg1: dict, pkg2: dict) -> tuple[float | None, dict]:
    """C21 (json_similarity_checker.py:109-151): weights [.5,.2,.05,.05,.05,
    .05]; missing-section weight reallocated to dependencies."""
    missing = lambda k: k not in pkg1 and k not in pkg2  # noqa: E731
    dep = None if missing("dependencies") else compare_dependencies(
        pkg1.get("dependencies", {}), pkg2.get("dependencies", {})
    )
    dev = None if missing("devDependencies") else compare_dependencies(
        pkg1.get("devDependencies", {}), pkg2.get("devDependencies", {})
    )
    peer = None if missing("peerDependencies") else compare_dependencies(
        pkg1.get("peerDependencies", {}), pkg2.get("peerDependencies", {})
    )
    scripts = None if missing("scripts") else compare_scripts(
        pkg1.get("scripts", {}), pkg2.get("scripts", {})
    )
    meta_keys = ["name", "version", "description", "keywords", "author"]
    meta = (
        None
        if all(k not in pkg1 and k not in pkg2 for k in meta_keys)
        else compare_metadata(pkg1, pkg2)
    )
    cfg = None
    has_cfg = [
        k for d in (pkg1, pkg2) for k in d if k.endswith("Config") or k in ("browserslist", "jest")
    ]
    if has_cfg:
        cfg = _compare_config_blocks(pkg1, pkg2)

    weights = [0.5, 0.2, 0.05, 0.05, 0.05, 0.05]
    sims = [dep, dev, peer, scripts, meta, cfg]
    names = ["dependencies", "devDependencies", "peerDependencies", "scripts", "meta", "config"]
    dep_weight = weights[0]
    for i, (s, w, n) in enumerate(zip(sims, weights, names)):
        if s is None and n != "dependencies":
            dep_weight += w
            weights[i] = 0.0
    weights[0] = dep_weight
    present = [(s, w) for s, w in zip(sims, weights) if s is not None and w > 0]
    overall = None
    if present:
        tw = sum(w for _, w in present)
        overall = sum(s * w for s, w in present) / tw if tw > 0 else None
    return overall, {
        "dependencies_similarity": dep,
        "devDependencies_similarity": dev,
        "peerDependencies_similarity": peer,
        "scripts_similarity": scripts,
        "meta_similarity": meta,
        "config_similarity": cfg,
        "dependencies_weight": dep_weight,
    }


def flatten_dict(d: dict, parent_key: str = "", sep: str = ".") -> dict:
    # json_similarity_checker.py:183-191
    items: list = []
    for k, v in d.items():
        new_key = f"{parent_key}{sep}{k}" if parent_key else k
        if isinstance(v, dict):
            items.extend(flatten_dict(v, new_key, sep=sep).items())
        else:
            items.append((new_key, v))
    return dict(items)


def tsconfig_json_similarity(ts1: dict, ts2: dict) -> tuple[float, dict]:
    """C22 (json_similarity_checker.py:193-216): flattened compilerOptions
    exact case-insensitive match ratio."""
    flat1 = flatten_dict(ts1.get("compilerOptions", {}))
    flat2 = flatten_dict(ts2.get("compilerOptions", {}))
    all_keys = set(flat1) | set(flat2)
    if not all_keys:
        return 1.0, {}
    matched = 0
    details = {}
    for k in all_keys:
        v1, v2 = flat1.get(k), flat2.get(k)
        if v1 is not None and v2 is not None and str(v1).strip().lower() == str(v2).strip().lower():
            details[k] = 1.0
            matched += 1
        else:
            details[k] = 0.0
    return matched / len(all_keys), details


_THEME_KEYS = ["colors", "spacing", "fontSize", "borderRadius", "boxShadow", "fontFamily", "screens"]


def extract_theme_extensions(config: dict) -> dict:
    # tailwind_analyzer.py:126-143 (extend overrides top-level; dicts merge)
    theme = config.get("theme", {}) if isinstance(config, dict) else {}
    extend = theme.get("extend", {}) if isinstance(theme, dict) else {}
    out: dict = {}
    for key in _THEME_KEYS:
        if key in theme:
            out[key] = theme[key]
        if key in extend:
            if key in out and isinstance(out[key], dict) and isinstance(extend[key], dict):
                out[key] = {**out[key], **extend[key]}
            else:
                out[key] = extend[key]
    return out


def tailwind_config_similarity(cfg1: dict, cfg2: dict) -> dict:
    """C20 (tailwind_analyzer.py:144-199): theme-extension key Jaccard +
    per-shared-key subkey Jaccard; improved = mean([key_sim] + subkey_sims)."""
    e1 = extract_theme_extensions(cfg1)
    e2 = extract_theme_extensions(cfg2)
    k1, k2 = set(e1), set(e2)
    inter, union = k1 & k2, k1 | k2
    key_sim = len(inter) / len(union) if union else 1.0
    per_ext = {}
    sub_sims = []
    for key in inter:
        v1, v2 = e1[key], e2[key]
        if isinstance(v1, dict) and isinstance(v2, dict):
            s1, s2 = set(v1), set(v2)
            su = s1 | s2
            sim = len(s1 & s2) / len(su) if su else 1.0
        else:
            sim = 1.0 if v1 == v2 else 0.0
        per_ext[key] = sim
        sub_sims.append(sim)
    all_sims = [key_sim] + sub_sims if sub_sims else [key_sim]
    return {
        "key_jaccard_similarity": key_sim,
        "per_extension_similarity": per_ext,
        "only_in_original_config": sorted(k1 - k2),
        "only_in_user_config": sorted(k2 - k1),
        "improved_config_similarity": sum(all_sims) / len(all_sims),
    }


# --------------------------------------------------------------------------
# tailwind.config.js FILE -> dict (round-3 source closing the S6 gap)
# --------------------------------------------------------------------------
#
# The reference turns the config file into a dict by evaluating it in a
# Node subprocess (core/tailwind_analyzer.py:111-124: `require(path)` +
# JSON.stringify). That is the per-row-side-process anti-pattern SURVEY
# §2.1 S6 flags — so this is a small in-process TOLERANT reader for the
# JS-object-literal subset real tailwind configs are written in: unquoted
# keys, single/double/backtick strings, numbers, booleans,
# null/undefined, nested objects/arrays, trailing commas, // and /* */
# comments, `module.exports = {...}` or `export default {...}`.
# Node v20 IS present on this host, and tests/test_tailwind_node_parity.py
# pins this reader against the reference's actual require+JSON.stringify
# subprocess on literal fixture configs (including JSON.stringify's
# undefined semantics: object keys dropped, array elements -> null).
# Non-literal values (require(...), identifiers, arrow functions) are
# preserved as their raw source text — C20 only consumes the theme
# extensions, which are literal in practice; Node's eval would error on
# an uninstalled plugin require where this reader degrades gracefully, a
# divergence the parity tests document rather than hide.


# JS `undefined` sentinel: the reference's dict comes through
# JSON.stringify, which DROPS undefined-valued object keys and turns
# undefined ARRAY elements into null — distinct from `null` (kept as
# null in both positions). Parity pinned in test_tailwind_node_parity.
_UNDEFINED = object()


class _JsLiteralParser:
    def __init__(self, src: str) -> None:
        self.s = src
        self.i = 0
        self.n = len(src)

    # -- lexical helpers ---------------------------------------------------
    def _ws(self) -> None:
        while self.i < self.n:
            c = self.s[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif self.s.startswith("//", self.i):
                j = self.s.find("\n", self.i)
                self.i = self.n if j < 0 else j + 1
            elif self.s.startswith("/*", self.i):
                j = self.s.find("*/", self.i + 2)
                self.i = self.n if j < 0 else j + 2
            else:
                return

    def _string(self) -> str:
        quote = self.s[self.i]
        self.i += 1
        out = []
        while self.i < self.n:
            c = self.s[self.i]
            if c == "\\" and self.i + 1 < self.n:
                nxt = self.s[self.i + 1]
                out.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                self.i += 2
            elif c == quote:
                self.i += 1
                return "".join(out)
            else:
                out.append(c)
                self.i += 1
        return "".join(out)  # unterminated: tolerate

    def _raw_until_delim(self) -> str:
        """Consume a non-literal value (require(...), identifier, arrow fn)
        up to the next , } ] at nesting depth 0; returns the raw source."""
        start = self.i
        depth = 0
        while self.i < self.n:
            c = self.s[self.i]
            if c in "'\"`":
                self._string()
                continue
            if c in "([{":
                depth += 1
            elif c in ")]}":
                if depth == 0:
                    break
                depth -= 1
            elif c == "," and depth == 0:
                break
            self.i += 1
        return self.s[start : self.i].strip()

    # -- grammar -----------------------------------------------------------
    def value(self):
        self._ws()
        if self.i >= self.n:
            return None
        c = self.s[self.i]
        if c == "{":
            return self.obj()
        if c == "[":
            return self.arr()
        if c in "'\"`":
            return self._string()
        m = re.match(r"-?\d+(?:\.\d+)?(?![\w$])", self.s[self.i :])
        if m:
            self.i += m.end()
            txt = m.group(0)
            return float(txt) if "." in txt else int(txt)
        m = re.match(r"(true|false|null|undefined)(?![\w$])", self.s[self.i :])
        if m:
            self.i += m.end()
            if m.group(1) == "undefined":
                return _UNDEFINED
            return {"true": True, "false": False}.get(m.group(1))
        raw = self._raw_until_delim()
        # bare identifier that is really a literal-ish alias? keep raw text
        return raw

    def obj(self) -> dict:
        assert self.s[self.i] == "{"
        self.i += 1
        out: dict = {}
        while True:
            self._ws()
            if self.i >= self.n:
                return out
            if self.s[self.i] == "}":
                self.i += 1
                return out
            if self.s[self.i] == ",":
                self.i += 1
                continue
            # key: identifier | string | number | [computed]
            if self.s[self.i] in "'\"`":
                key = self._string()
            elif self.s[self.i] == "[":
                depth, start = 0, self.i
                while self.i < self.n:
                    if self.s[self.i] == "[":
                        depth += 1
                    elif self.s[self.i] == "]":
                        depth -= 1
                        if depth == 0:
                            self.i += 1
                            break
                    self.i += 1
                key = self.s[start : self.i]
            else:
                m = re.match(r"[\w$.-]+", self.s[self.i :])
                if not m:  # tolerate garbage: skip a char
                    self.i += 1
                    continue
                key = m.group(0)
                self.i += m.end()
            self._ws()
            if self.i < self.n and self.s[self.i] == ":":
                self.i += 1
                v = self.value()
                if v is not _UNDEFINED:  # JSON.stringify drops these keys
                    out[key] = v
            else:
                out[key] = key  # shorthand property {a,} -> raw name
        return out

    def arr(self) -> list:
        assert self.s[self.i] == "["
        self.i += 1
        out: list = []
        while True:
            self._ws()
            if self.i >= self.n:
                return out
            if self.s[self.i] == "]":
                self.i += 1
                return out
            if self.s[self.i] == ",":
                self.i += 1
                continue
            v = self.value()
            out.append(None if v is _UNDEFINED else v)  # JSON.stringify: undefined element -> null


def parse_tailwind_config_text(src: str) -> dict:
    """tailwind.config.js source text -> config dict (no Node).

    Finds the exported object (`module.exports = {` / `export default {`)
    and parses the JS object literal tolerantly; returns {} when no
    exported object is found (mirroring the reference's {'error': ...}
    degradation, tailwind_analyzer.py:122-124)."""
    m = re.search(r"(?:module\.exports\s*=|export\s+default)\s*", src)
    if not m:
        return {}
    p = _JsLiteralParser(src)
    p.i = m.end()
    p._ws()
    if p.i >= p.n or p.s[p.i] != "{":
        return {}
    return p.obj()
