"""Node parity fixtures for the tailwind.config.js reader (round-4 item).

The reference parses tailwind.config.js by evaluating it in a Node
subprocess (`require(path)` + JSON.stringify — core/tailwind_analyzer.py
:111-124). Our engine replaces that per-row side process with the
in-process JS-object-literal reader ``parse_tailwind_config_text``
(oracle/config_oracle.py). Node v20 IS installed on this host, so these
tests pin the reader against the reference's ACTUAL subprocess recipe:

- literal configs (the shape real tailwind configs are written in) must
  round-trip IDENTICALLY through both paths — including trailing commas,
  comments, quote styles, numeric keys and JSON.stringify's undefined
  semantics (object keys dropped, array elements -> null);
- non-literal configs (require()-plugin, ESM export syntax) are the
  documented DIVERGENCE: the reference's require() errors out (plugin
  not installed / not CommonJS) and degrades to {'error': ...} -> {},
  while our reader degrades gracefully (raw source text for plugin
  entries, full theme dict still extracted). Asserted, not hidden.
"""

from __future__ import annotations

import json
import shutil
import subprocess

import pytest

from web_template_forensics_spark.oracle.config_oracle import (
    extract_theme_extensions,
    parse_tailwind_config_text,
)

node_missing = shutil.which("node") is None


def node_parse(config_path: str) -> dict:
    """The reference's parse_config recipe, verbatim semantics
    (tailwind_analyzer.py:111-124): require the file in a Node
    subprocess, JSON.stringify the export, degrade to {'error': ...}."""
    node_script_path = config_path.replace("\\", "\\\\")
    node_script = (
        f"const config = require('{node_script_path}');\n"
        "console.log(JSON.stringify(config));"
    )
    try:
        result = subprocess.run(
            ["node", "-e", node_script], capture_output=True, text=True, check=True
        )
        return json.loads(result.stdout.strip())
    except Exception as e:  # reference: except Exception -> error dict
        return {"error": str(e)}


LITERAL_CONFIGS = {
    "basic": """\
module.exports = {
  content: ['./src/**/*.{js,jsx,ts,tsx}', './public/index.html'],
  theme: {
    extend: {
      colors: { brand: '#1a2b3c', accent: { 50: '#f0f9ff', 900: '#0c4a6e' } },
      spacing: { '18': '4.5rem', '128': '32rem' },
    },
  },
  plugins: [],
}
""",
    "comment_heavy": """\
// project tailwind config
/* multi
   line header */
module.exports = {
  // content globs
  content: [
    './app/**/*.tsx', // app tree
    /* legacy */ './pages/**/*.jsx',
  ],
  theme: {
    extend: {
      fontSize: { 'xxs': '0.625rem', }, // trailing comma
      borderRadius: { '4xl': '2rem' },
    }, // extend
  },
}
""",
    "quote_styles": """\
module.exports = {
  content: ["./src/**/*.html", './lib/**/*.js', `./tpl/**/*.hbs`],
  theme: {
    screens: { sm: '640px', md: "768px", lg: `1024px` },
    extend: {
      fontFamily: { sans: ['Inter', "system-ui", 'sans-serif'] },
    },
  },
  darkMode: 'class',
}
""",
    "numbers_and_nesting": """\
module.exports = {
  important: true,
  prefix: '',
  theme: {
    extend: {
      spacing: { 0.5: '0.125rem', 1.5: '0.375rem', 72: '18rem' },
      boxShadow: { glow: '0 0 8px #fff', none: 'none' },
      zIndex: { modal: 1000, toast: 1100 },
    },
  },
  corePlugins: { preflight: false },
  separator: ':',
  future: null,
}
""",
    "undefined_semantics": """\
module.exports = {
  theme: {
    extend: {
      colors: { ghost: undefined, real: '#123456', missing: null },
    },
  },
  variants: undefined,
  safelist: ['a', undefined, 'b', null],
}
""",
}


@pytest.mark.skipif(node_missing, reason="node not installed")
@pytest.mark.parametrize("name", sorted(LITERAL_CONFIGS))
def test_literal_config_matches_node(name, tmp_path):
    src = LITERAL_CONFIGS[name]
    path = tmp_path / "tailwind.config.js"
    path.write_text(src)
    ref = node_parse(str(path))
    assert "error" not in ref, ref
    ours = parse_tailwind_config_text(src)
    # json round-trip canonicalizes int-vs-float and tuple-vs-list noise
    # without masking value differences
    assert json.loads(json.dumps(ours)) == ref
    # and the downstream consumer (C20 theme extensions) agrees too
    assert extract_theme_extensions(ours) == extract_theme_extensions(ref)


@pytest.mark.skipif(node_missing, reason="node not installed")
def test_plugin_require_divergence_documented(tmp_path):
    """A config requiring an uninstalled plugin: the reference's Node
    path ERRORS (module not found) and degrades to {'error': ...}; our
    reader keeps the raw require() text and still extracts the literal
    theme — graceful degradation is the engine's documented behavior."""
    src = """\
module.exports = {
  content: ['./src/**/*.js'],
  theme: { extend: { colors: { brand: '#bada55' } } },
  plugins: [require('@tailwindcss/typography'), require('@tailwindcss/forms')],
}
"""
    path = tmp_path / "tailwind.config.js"
    path.write_text(src)
    ref = node_parse(str(path))
    assert "error" in ref  # plugin not installed -> reference loses EVERYTHING
    ours = parse_tailwind_config_text(src)
    # ours: theme survives, plugin entries preserved as raw source text
    assert ours["theme"]["extend"]["colors"]["brand"] == "#bada55"
    assert [p.startswith("require(") for p in ours["plugins"]] == [True, True]


@pytest.mark.skipif(node_missing, reason="node not installed")
def test_template_literal_interpolation_divergence_documented(tmp_path):
    """A template literal WITH interpolation (`${base * 4}px`): Node
    EVALUATES the expression (the reference sees '32px'); our reader is
    a literal parser, so it keeps the raw `${base * 4}px` source text —
    the one value that diverges. Everything else in the config (plain
    backtick strings included — those are already pinned identical by
    the quote_styles fixture) matches the Node face exactly."""
    src = """\
const base = 8;
module.exports = {
  content: ['./src/**/*.js'],
  theme: {
    extend: {
      spacing: { huge: `${base * 4}px`, fixed: `32px` },
      colors: { brand: '#abc' },
    },
  },
}
"""
    path = tmp_path / "tailwind.config.js"
    path.write_text(src)
    ref = node_parse(str(path))
    assert "error" not in ref, ref
    ours = parse_tailwind_config_text(src)
    # the single divergent leaf: evaluated vs raw-text degradation
    assert ref["theme"]["extend"]["spacing"]["huge"] == "32px"
    assert ours["theme"]["extend"]["spacing"]["huge"] == "${base * 4}px"
    # degradation equality everywhere else: patch the one leaf and the
    # faces are identical, so the raw-text fallback loses NOTHING else
    patched = json.loads(json.dumps(ours))
    patched["theme"]["extend"]["spacing"]["huge"] = "32px"
    assert patched == ref
    # downstream C20 consumer sees the same keys on both faces
    assert sorted(extract_theme_extensions(ours)) == sorted(extract_theme_extensions(ref))


@pytest.mark.skipif(node_missing, reason="node not installed")
def test_esm_export_divergence_documented(tmp_path):
    """`export default {...}` in a .js file: Node >= 20.19 resolves the
    require() through ESM interop, so the reference gets the WRAPPER
    object {'__esModule': True, 'default': {...}} — its theme extraction
    then finds nothing because the config is buried one level down. Our
    reader parses the exported object directly and keeps the theme.
    (On older Node, require() raised on ESM syntax and the reference
    degraded to {'error': ...} — either way the theme is lost.)"""
    src = """\
export default {
  theme: { extend: { spacing: { '18': '4.5rem' } } },
}
"""
    path = tmp_path / "tailwind.config.js"
    path.write_text(src)
    ref = node_parse(str(path))
    ours = parse_tailwind_config_text(src)
    assert ours["theme"]["extend"]["spacing"] == {"18": "4.5rem"}
    assert extract_theme_extensions(ours) == {"spacing": {"18": "4.5rem"}}
    if "error" not in ref:  # modern Node: ESM interop wrapper
        assert ref == {"__esModule": True, "default": json.loads(json.dumps(ours))}
        assert extract_theme_extensions(ref) == {}  # reference loses the theme
