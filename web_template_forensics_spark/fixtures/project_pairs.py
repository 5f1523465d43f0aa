"""Deterministic two-sided project fixture for the E1 cascade queries.

Synthesizes an (original, modified) pair of web projects as a flat file
table — rows ``(side, path, filetype, content)`` — engineered so every
stage of the reference matching cascade (core/file_matcher.py:401-465)
fires at least once per filetype where the reference semantics allow:

  * exact path matches (identical and edited content),
  * fuzzy filename matches (basename difflib ratio >= 0.75),
  * structure matches (CSS only — see the Q9-Q11 quirks in
    oracle/cascade_oracle.py: the reference's html/jsx/js structure
    stages can never produce a match),
  * contextual folder matches,
  * CSS content matches (difflib ratio >= 0.6 on raw text while the
    rule-level css_similarity stays < 0.5),
  * unmatched remainders on both sides (the A1/A2 penalty terms),
  * a js-side ``next-env.d.ts`` (the reference's post-hoc unmatched
    filter, file_matcher.py:573-576).

Everything is seeded and pure (no wall clock, no I/O); the same rows
feed the distributed cascade, the pure-Python replay oracle, and the
pinned-VALUES DuckDB SQL.
"""

from __future__ import annotations

import random

FILETYPES = ("html", "css", "jsx", "js")

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform "
    "victor whiskey xray yankee zulu"
).split()

_TW = (
    "flex grid p-2 p-4 m-2 mt-4 text-sm text-lg font-bold rounded shadow "
    "bg-white bg-gray-100 border items-center justify-between w-full h-8"
).split()


def _sent(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _classes(rng: random.Random, n: int) -> str:
    return " ".join(rng.sample(_TW, n))


def _html(rng: random.Random, sections: int, title: str) -> str:
    body = []
    for i in range(sections):
        cls = _classes(rng, 3)
        body.append(
            f'<div class="{cls}" id="s{i}"><h2>{_sent(rng, 2)}</h2>'
            f"<p>{_sent(rng, 6)}</p></div>"
        )
    return (
        f"<html><head><title>{title}</title></head><body>"
        f'<main class="{_classes(rng, 2)}">' + "".join(body) + "</main></body></html>"
    )


def _css(rng: random.Random, rules: int, prefix: str) -> str:
    out = []
    for i in range(rules):
        out.append(
            f".{prefix}-{i} {{ color: #{rng.randrange(16**6):06x}; "
            f"margin: {rng.randrange(1, 9)}px; }}"
        )
    return "\n".join(out)


def _jsx(rng: random.Random, title: str) -> str:
    cls = _classes(rng, 4)
    return (
        f"export default function {title}() {{\n"
        f'  return <div className="{cls}"><span>{_sent(rng, 3)}</span></div>;\n'
        "}\n"
    )


def _js(rng: random.Random, fnames: list[str]) -> str:
    parts = []
    for fn in fnames:
        parts.append(
            f"function {fn}(a, b) {{\n"
            f"  let x{rng.randrange(10)} = a + {rng.randrange(100)};\n"
            f"  if (x{rng.randrange(10)} > b) {{ return helper(a); }}\n"
            "  return b;\n}\n"
        )
    parts.append("function helper(v) { return v * 2; }\n")
    return "\n".join(parts)


def project_pair_rows(seed: int = 42) -> list[tuple[str, str, str, str]]:
    """-> rows (side, path, filetype, content); sorted-path order is the
    documented deterministic file order (SURVEY.md §4.3 item 1)."""
    rng = random.Random(seed)
    rows: list[tuple[str, str, str, str]] = []

    def add(side: str, path: str, ftype: str, content: str) -> None:
        rows.append((side, path, ftype, content))

    # ---- html ------------------------------------------------------------
    # exact: same path, identical content
    h_home = _html(random.Random(seed + 1), 3, "home")
    add("original", "app/pages/home.html", "html", h_home)
    add("modified", "app/pages/home.html", "html", h_home)
    # exact: same path, edited content (different similarity < 1)
    add("original", "app/pages/shop.html", "html", _html(random.Random(seed + 2), 3, "shop"))
    add("modified", "app/pages/shop.html", "html", _html(random.Random(seed + 3), 3, "shop"))
    # fuzzy: similar basenames
    add("original", "app/pages/about.html", "html", _html(random.Random(seed + 4), 2, "about"))
    add("modified", "app/pages/about2.html", "html", _html(random.Random(seed + 4), 2, "about"))
    # contextual: same folder, dissimilar basenames; siblings above matched
    add("original", "app/pages/contact.html", "html", _html(random.Random(seed + 5), 2, "contact"))
    add("modified", "app/pages/zmisc.html", "html", _html(random.Random(seed + 6), 2, "zmisc"))
    # unmatched original (different top folder — contextual is blocked on it)
    add("original", "legacy/old.html", "html", _html(random.Random(seed + 7), 1, "old"))
    # unmatched modified
    add("modified", "beta/new.html", "html", _html(random.Random(seed + 8), 1, "new"))

    # ---- css -------------------------------------------------------------
    c_main = _css(random.Random(seed + 10), 6, "main")
    add("original", "styles/main.css", "css", c_main)
    add("modified", "styles/main.css", "css", c_main)
    # fuzzy basename
    add("original", "styles/theme.css", "css", _css(random.Random(seed + 11), 5, "theme"))
    add("modified", "styles/themes.css", "css", _css(random.Random(seed + 11), 5, "theme"))
    # structure match: dissimilar basenames, shared rule structure
    c_grid = _css(random.Random(seed + 12), 8, "grid")
    add("original", "styles/grid.css", "css", c_grid)
    add("modified", "styles/columns9.css", "css", c_grid + "\n.extra-0 { color: #000000; }")
    # content match: selectors all renamed (rule compare ~0) but raw text
    # highly similar (difflib >= 0.6); different top folders so the
    # contextual stage (folder term 0, score <= 0.3) cannot claim it first
    c_anim = _css(random.Random(seed + 13), 7, "animx")
    add("original", "styles/anim.css", "css", c_anim)
    add("modified", "assets/motionz.css", "css", c_anim.replace("animx-", "animy-"))
    # unmatched
    add("original", "styles/print.css", "css", _css(random.Random(seed + 14), 2, "print"))

    # ---- jsx -------------------------------------------------------------
    j_card = _jsx(random.Random(seed + 20), "Card")
    add("original", "src/components/Card.jsx", "jsx", j_card)
    add("modified", "src/components/Card.jsx", "jsx", j_card)
    add("original", "src/components/Button.jsx", "jsx", _jsx(random.Random(seed + 21), "Button"))
    add("modified", "src/components/Buttons.jsx", "jsx", _jsx(random.Random(seed + 22), "Buttons"))
    # contextual within src/components
    add("original", "src/components/Navbar.jsx", "jsx", _jsx(random.Random(seed + 23), "Navbar"))
    add("modified", "src/components/TopStrip.jsx", "jsx", _jsx(random.Random(seed + 24), "TopStrip"))
    # unmatched modified
    add("modified", "src/components/Footer.jsx", "jsx", _jsx(random.Random(seed + 25), "Footer"))

    # ---- js --------------------------------------------------------------
    s_util = _js(random.Random(seed + 30), ["parseInput", "formatOutput"])
    add("original", "src/lib/util.js", "js", s_util)
    add("modified", "src/lib/util.js", "js", s_util)
    add("original", "src/lib/api.js", "js", _js(random.Random(seed + 31), ["fetchData"]))
    add("modified", "src/lib/api2.js", "js", _js(random.Random(seed + 32), ["fetchData"]))
    # contextual in src/lib
    add("original", "src/lib/store.js", "js", _js(random.Random(seed + 33), ["saveState"]))
    add("modified", "src/lib/vault.js", "js", _js(random.Random(seed + 34), ["loadState"]))
    # the reference's post-hoc unmatched filter target
    add("modified", "next-env.d.ts", "js", "/// <reference types=\"next\" />\n")
    # plain unmatched original
    add("original", "scripts/build.js", "js", _js(random.Random(seed + 35), ["build"]))

    rng.random()  # keep rng referenced (future content hooks)
    return sorted(rows, key=lambda r: (r[0], r[1]))


def tailwind_config_file_fixtures() -> tuple[str, str]:
    """A pair of tailwind.config.js SOURCE TEXTS (the reference's actual
    input, evaluated there via Node — tailwind_analyzer.py:111-124).
    Deliberately exercises the JS-isms the tolerant reader must survive:
    comments, unquoted keys, single quotes, trailing commas, a require()
    plugin entry (kept as raw text; outside the theme so C20 semantics
    are Node-identical)."""
    a = """
// site A tailwind config
module.exports = {
  content: ['./src/**/*.{js,jsx}'],
  theme: {
    extend: {
      colors: { brand: '#123456', accent: "#abcdef" }, /* brand palette */
      spacing: { '18': '4.5rem', },
      fontSize: { xxs: '0.6rem' },
    },
  },
  plugins: [require('@tailwindcss/forms')],
}
"""
    b = """
export default {
  content: ['./src/**/*.{js,jsx}'],
  theme: {
    extend: {
      colors: { brand: '#123456', muted: '#999999' },
      spacing: { '18': '4.5rem', '22': '5.5rem' },
      screens: { '3xl': '1920px' },
    },
  },
  plugins: [],
}
"""
    return a, b


def config_fixtures(seed: int = 42) -> dict:
    """Config-file pairs for C20-C22 (parsed-dict form, per SURVEY §2.1 S6)."""
    return {
        "tailwind_config": (
            {
                "theme": {
                    "extend": {
                        "colors": {"brand": "#123456", "accent": "#abcdef"},
                        "spacing": {"18": "4.5rem"},
                        "fontSize": {"xxs": "0.6rem"},
                    }
                }
            },
            {
                "theme": {
                    "extend": {
                        "colors": {"brand": "#123456", "muted": "#999999"},
                        "spacing": {"18": "4.5rem", "22": "5.5rem"},
                        "screens": {"3xl": "1920px"},
                    }
                }
            },
        ),
        "package_json": (
            {
                "name": "site-a",
                "version": "1.2.3",
                "dependencies": {"react": "^18.2.0", "axios": "1.6.0", "zod": "3.22.0"},
                "devDependencies": {"eslint": "8.50.0"},
                "scripts": {"dev": "next dev", "test": "jest", "deploy": "sh deploy.sh"},
            },
            {
                "name": "site-b",
                "version": "1.2.3",
                "dependencies": {"react": "^18.2.0", "axios": "1.6.1", "lodash": "4.17.21"},
                "devDependencies": {"eslint": "8.50.0", "prettier": "3.0.0"},
                "scripts": {"dev": "next dev", "test": "jest --ci", "deploy": "sh deploy.sh"},
            },
        ),
        "tsconfig_json": (
            {
                "compilerOptions": {
                    "target": "ES2020",
                    "strict": True,
                    "paths": {"@/*": ["./src/*"]},
                }
            },
            {
                "compilerOptions": {
                    "target": "es2020",
                    "strict": False,
                    "paths": {"@/*": ["./src/*"]},
                }
            },
        ),
    }
