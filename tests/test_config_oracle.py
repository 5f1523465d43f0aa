"""Config comparator tests (C20-C22), incl. ports of the reference's
tailwind config tests (tests/tailwind_analyzer_test.py semantics)."""

from web_template_forensics_spark.oracle.config_oracle import (
    compare_dependencies,
    compare_scripts,
    flatten_dict,
    jaccard,
    normalize_version,
    package_json_similarity,
    tailwind_config_similarity,
    tsconfig_json_similarity,
)


def test_normalize_version():
    assert normalize_version("^1.0.0") == "1.0.0"
    assert normalize_version("~2.3.4") == "2.3.4"
    assert normalize_version(">= 3.0") == "3.0"
    assert normalize_version(1) == "1"


def test_dependency_scoring():
    # equal versions -> 1.0 value; boilerplate excluded from key jaccard
    d1 = {"react": "18.0.0", "lodash": "^4.17.21"}
    d2 = {"react": "18.0.0", "lodash": "4.17.21"}
    assert compare_dependencies(d1, d2) == 1.0
    # last-part minor bump -> 0.3
    assert compare_dependencies({"a": "1.2.3"}, {"a": "1.2.4"}) == 0.3 * 1.0 + 0.7 * 0.3
    # disjoint -> key_sim only
    assert compare_dependencies({"a": "1"}, {"b": "1"}) == 0.0


def test_scripts_boilerplate_excluded():
    s1 = {"dev": "next dev", "deploy": "run x"}
    s2 = {"dev": "vite", "deploy": "run x"}
    assert compare_scripts(s1, s2) == 1.0  # dev is boilerplate; deploy equal


def test_package_json_weight_reallocation():
    # only dependencies present -> full weight on deps
    p1 = {"dependencies": {"a": "1.0.0"}}
    p2 = {"dependencies": {"a": "1.0.0"}}
    overall, details = package_json_similarity(p1, p2)
    assert overall == 1.0
    # all absent-section weights flow to dependencies: 0.5+0.2+0.05*3+... = 0.9
    assert abs(details["dependencies_weight"] - 0.9) < 1e-12

def test_package_json_full_sections():
    p1 = {
        "name": "app", "version": "1.0.0",
        "dependencies": {"a": "1.0.0"},
        "devDependencies": {"jest": "29.0.0"},
        "scripts": {"deploy": "x"},
    }
    overall, details = package_json_similarity(p1, dict(p1))
    # reference quirk: metadata fields absent from BOTH sides score 0.0
    # (json_similarity_checker.py:88-91: '' == '' but n1 == '' -> 0), so an
    # identical package.json with 2/5 meta fields scores meta 0.4 and
    # overall (0.6 + 0.2 + 0.05 + 0.4*0.05) / 0.9
    assert details["meta_similarity"] == 0.4
    assert abs(overall - (0.6 + 0.2 + 0.05 + 0.4 * 0.05) / 0.9) < 1e-12


def test_tsconfig_flatten_and_similarity():
    ts1 = {"compilerOptions": {"strict": True, "paths": {"@/*": ["src/*"]}}}
    ts2 = {"compilerOptions": {"strict": "true", "paths": {"@/*": ["src/*"]}}}
    flat = flatten_dict(ts1["compilerOptions"])
    assert "paths.@/*" in flat
    score, details = tsconfig_json_similarity(ts1, ts2)
    assert score == 1.0  # case-insensitive str compare: True == 'true'
    score2, _ = tsconfig_json_similarity(ts1, {"compilerOptions": {"strict": False}})
    assert score2 == 0.0


def test_tailwind_config_similarity():
    cfg1 = {"theme": {"extend": {"colors": {"brand": "#123456", "accent": "#fff"}}}}
    cfg2 = {"theme": {"extend": {"colors": {"brand": "#123456"}}}}
    r = tailwind_config_similarity(cfg1, cfg2)
    assert r["key_jaccard_similarity"] == 1.0
    assert r["per_extension_similarity"]["colors"] == 0.5
    assert r["improved_config_similarity"] == 0.75
    # extend overrides top-level when both dicts (merge)
    cfg3 = {"theme": {"colors": {"x": "1"}, "extend": {"colors": {"y": "2"}}}}
    r2 = tailwind_config_similarity(cfg3, {"theme": {"colors": {"x": "1", "y": "2"}}})
    assert r2["improved_config_similarity"] == 1.0


def test_jaccard_empty_rule():
    assert jaccard(set(), set()) == 1.0
    assert jaccard({"a"}, set()) == 0.0


def test_parse_tailwind_config_text_parity():
    """The tolerant JS-object-literal reader produces the SAME dict the
    reference's Node eval (tailwind_analyzer.py:111-124) would print for
    literal configs: unquoted keys, single quotes, trailing commas,
    comments; non-literal values (require(...)) survive as raw text."""
    from web_template_forensics_spark.fixtures.project_pairs import (
        tailwind_config_file_fixtures,
    )
    from web_template_forensics_spark.oracle.config_oracle import (
        parse_tailwind_config_text,
        tailwind_config_similarity,
    )

    a, b = tailwind_config_file_fixtures()
    da = parse_tailwind_config_text(a)
    # node -e "console.log(JSON.stringify(require(a)))" output for the
    # literal part (plugins would eval to plugin objects; we keep raw text)
    assert da["theme"] == {
        "extend": {
            "colors": {"brand": "#123456", "accent": "#abcdef"},
            "spacing": {"18": "4.5rem"},
            "fontSize": {"xxs": "0.6rem"},
        }
    }
    assert da["content"] == ["./src/**/*.{js,jsx}"]
    assert da["plugins"] == ["require('@tailwindcss/forms')"]

    db = parse_tailwind_config_text(b)  # export default form
    assert db["theme"]["extend"]["screens"] == {"3xl": "1920px"}
    assert db["plugins"] == []

    # C20 over the parsed pair: shared keys colors+spacing, only-in sides
    r = tailwind_config_similarity(da, db)
    assert r["key_jaccard_similarity"] == 0.5  # {colors,spacing}/{4 keys}
    assert r["per_extension_similarity"]["colors"] == 1 / 3
    assert r["per_extension_similarity"]["spacing"] == 0.5

    # degradations: no export -> {}, numbers/booleans/nested arrays
    assert parse_tailwind_config_text("const x = 1") == {}
    d = parse_tailwind_config_text(
        "module.exports = { a: 1, b: -2.5, c: true, d: null, e: [1, 'x', [2]], }"
    )
    assert d == {"a": 1, "b": -2.5, "c": True, "d": None, "e": [1, "x", [2]]}
