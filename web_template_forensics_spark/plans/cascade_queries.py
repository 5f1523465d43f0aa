"""Oracle-checked queries for the E1 cascade + comparator family.

Every query here runs the DISTRIBUTED implementation
(operators/cascade.py) over the seeded project-pair fixture
(fixtures/project_pairs.py); its DuckDB oracle is a pinned VALUES table
produced by the single-threaded pure-Python replay
(oracle/cascade_oracle.py) of the reference lifecycle. The two
implementations share only the leaf comparator functions (by mandate —
the scores ARE the semantics); for the single-pair queries the
composition, greedy/threshold semantics, remainders, and the whole
A1-A6 aggregation layer are computed twice, independently, and
hash-compared by the driver. TWO exceptions, disclosed: the
match_cascade_many and forensic_pairs rows run the SAME replay function
on both sides (the per-pair grouped-map wraps replay_cascade /
analyze_pair by design), so those two rows verify the applyInPandas
distribution plumbing, not the composition math — which for those paths
is pinned instead by the ported-fixture pytest suite (test_cascade.py,
test_js_reference_parity.py) against the reference.

Float fidelity: per-pair scores are bit-identical by construction (same
pure functions both sides); ORDER-DEPENDENT aggregates are rounded to 6
decimals on both sides (documented; accumulated fp error ~1e-15);
everywhere the reference rounds (2dp match scores, 3dp A1) both sides
use Python round (half-even) — see py_round_udf.
"""

from __future__ import annotations

import json
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures.project_pairs import config_fixtures, project_pair_rows
from ..operators import cascade as C

_FILES_SCHEMA = "side string, path string, filetype string, content string"


def fixture_files(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(project_pair_rows(), _FILES_SCHEMA)


_MWC_CACHE: dict[str, DataFrame] = {}


def _mwc(spark: SparkSession) -> DataFrame:
    """matched_with_contents over the fixture, materialized ONCE per
    session (localCheckpoint) — the cascade subplan holds ~a dozen
    grouped-map stages, and the 13 queries here would otherwise each
    recompute it several times over.

    Keyed by applicationId, not id(spark): CPython reuses freed object
    addresses, so an id() key could serve a checkpointed DataFrame bound
    to a STOPPED SparkContext to a brand-new session. One entry per app
    is kept (sessions are sequential here), so the dict stays bounded."""
    key = spark.sparkContext.applicationId
    if key not in _MWC_CACHE:
        _MWC_CACHE.clear()  # drop frames bound to previous (dead) contexts
        _MWC_CACHE[key] = C.matched_with_contents(fixture_files(spark)).localCheckpoint()
    return _MWC_CACHE[key]


def _config_rows() -> list[tuple[str, str, str]]:
    from ..fixtures.project_pairs import tailwind_config_file_fixtures

    rows = [
        (kind, json.dumps(a, sort_keys=True), json.dumps(b, sort_keys=True))
        for kind, (a, b) in sorted(config_fixtures().items())
    ]
    # from-FILE row: raw tailwind.config.js source texts; the score UDF
    # runs the tolerant JS-object-literal reader before C20 (the no-Node
    # replacement for the reference's subprocess eval)
    fa, fb = tailwind_config_file_fixtures()
    rows.append(("tailwind_config_file", fa, fb))
    return rows


def config_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_config_rows(), "kind string, json1 string, json2 string")


# --------------------------------------------------------------------------
# SQL literal helpers
# --------------------------------------------------------------------------


def _s(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _d(v: float) -> str:
    return f"CAST({v!r} AS DOUBLE)"


def _i(v: int, t: str = "BIGINT") -> str:
    return f"CAST({int(v)} AS {t})"


def _values_sql(rows: list[tuple], cols: list[str], exprs: list) -> str:
    body = ",\n    ".join(
        "(" + ", ".join(fn(v) for fn, v in zip(exprs, row)) + ")" for row in rows
    )
    return f"SELECT * FROM (VALUES\n    {body}\n) AS t({', '.join(cols)})"


@lru_cache(maxsize=1)
def _replay():
    from ..oracle.cascade_oracle import replay_cascade

    return replay_cascade(project_pair_rows())


@lru_cache(maxsize=1)
def _config_scores_py() -> dict[str, float]:
    from ..fixtures.project_pairs import tailwind_config_file_fixtures
    from ..oracle.config_oracle import (
        package_json_similarity,
        parse_tailwind_config_text,
        tailwind_config_similarity,
        tsconfig_json_similarity,
    )

    cfg = config_fixtures()
    pkg, _ = package_json_similarity(*cfg["package_json"])
    ts, _ = tsconfig_json_similarity(*cfg["tsconfig_json"])
    tw = tailwind_config_similarity(*cfg["tailwind_config"])["improved_config_similarity"]
    fa, fb = tailwind_config_file_fixtures()
    twf = tailwind_config_similarity(
        parse_tailwind_config_text(fa), parse_tailwind_config_text(fb)
    )["improved_config_similarity"]
    return {
        "tailwind_config": tw,
        "tailwind_config_file": twf,
        "package_json": 0.0 if pkg is None else pkg,
        "tsconfig_json": ts,
    }


# --------------------------------------------------------------------------
# queries (Spark) + oracles (pinned VALUES)
# --------------------------------------------------------------------------


def q_match_cascade(spark, sf_dir):
    return _mwc(spark).select("filetype", "original", "modified", "match_type", "score")


def sql_match_cascade() -> str:
    rows = _replay()["matched_rows"]
    return _values_sql(
        rows, ["filetype", "original", "modified", "match_type", "score"],
        [_s, _s, _s, _s, _d],
    )


def q_pair_scores(spark, sf_dir):
    return C.pair_scores(fixture_files(spark), _mwc(spark))


def sql_pair_scores() -> str:
    rows = _replay()["pair_rows"]
    ii = lambda v: _i(v, "INT")  # noqa: E731
    return _values_sql(
        rows,
        ["filetype", "original", "modified", "similarity", "matching", "different", "missing", "extra"],
        [_s, _s, _s, _d, ii, ii, ii, ii],
    )


def q_js_pair_metrics(spark, sf_dir):
    return C.js_pair_metrics(fixture_files(spark), _mwc(spark))


def sql_js_pair_metrics() -> str:
    rows = _replay()["js_metric_rows"]
    ii = lambda v: _i(v, "INT")  # noqa: E731
    return _values_sql(
        rows,
        ["original", "modified", "function_similarity", "import_similarity",
         "class_similarity", "control_flow_similarity", "call_graph_similarity",
         "total_functions"],
        [_s, _s, _d, _d, _d, _d, _d, ii],
    )


def q_filetype_aggregates(spark, sf_dir):
    return C.filetype_aggregates(fixture_files(spark), _mwc(spark))


def sql_filetype_aggregates() -> str:
    rows = [
        (ft, v["files_matched"], v["files_unmatched"], v["aggregate_score"], v["prediction"])
        for ft, v in _replay()["per_type"].items()
    ]
    return _values_sql(
        rows,
        ["filetype", "files_matched", "files_unmatched", "aggregate_score", "prediction"],
        [_s, _i, _i, _d, _s],
    )


def q_overall_similarity(spark, sf_dir):
    return C.overall_similarity(fixture_files(spark), mwc=_mwc(spark))


def sql_overall_similarity() -> str:
    r = _replay()
    rows = [(round(r["overall_similarity"], 6), r["total_files"], r["overall_prediction"])]
    return _values_sql(
        rows, ["overall_similarity", "total_files", "prediction"], [_d, _i, _s]
    )


def q_overall_with_config(spark, sf_dir):
    """A2 general form: + JSON virtual files (package.json x2, tsconfig x1,
    file_matcher.py:598-619), config sims computed by the distributed UDF."""
    cfg = config_df(spark).withColumn(
        "score", C.config_score_udf("kind", "json1", "json2")
    )
    virtual = (
        cfg.groupBy()
        .pivot("kind", ["package_json", "tsconfig_json"])
        .agg(F.first("score"))
        .select(
            F.col("package_json").alias("package_json_similarity"),
            F.col("tsconfig_json").alias("tsconfig_similarity"),
        )
    )
    return C.overall_similarity(
        fixture_files(spark), virtual_json=virtual, mwc=_mwc(spark)
    ).select("overall_similarity", "total_files")


def sql_overall_with_config() -> str:
    r = _replay()
    cs = _config_scores_py()
    sims = sum(s for _, _, _, s, *_ in r["pair_rows"]) + sum(
        t["hybrid_similarity"] for t in r["tailwind_rows"]
    )
    total = r["total_files"] + 3
    overall = (sims + 2 * cs["package_json"] + cs["tsconfig_json"]) / total
    return _values_sql(
        [(round(overall, 6), total)], ["overall_similarity", "total_files"], [_d, _i]
    )


def q_tailwind_pair_scores(spark, sf_dir):
    return C.tailwind_pairs(fixture_files(spark), _mwc(spark)).select(
        "filetype", "original", "modified", "set_jaccard",
        "frequency_weighted_jaccard", "hybrid_similarity", "total_classes",
    )


def sql_tailwind_pair_scores() -> str:
    rows = [
        (t["filetype"], t["original"], t["modified"], t["set_jaccard"],
         t["frequency_weighted_jaccard"], t["hybrid_similarity"], t["total_classes"])
        for t in _tw_rows_with_filetype()
    ]
    return _values_sql(
        rows,
        ["filetype", "original", "modified", "set_jaccard",
         "frequency_weighted_jaccard", "hybrid_similarity", "total_classes"],
        [_s, _s, _s, _d, _d, _d, _i],
    )


@lru_cache(maxsize=1)
def _tw_rows_with_filetype():
    r = _replay()
    ft_of = {(o, m): ft for ft, o, m, *_ in r["matched_rows"]}
    out = []
    for t in r["tailwind_rows"]:
        t = dict(t)
        t["filetype"] = ft_of[(t["original"], t["modified"])]
        out.append(t)
    return out


def q_tailwind_aggregate(spark, sf_dir):
    return C.tailwind_aggregate(fixture_files(spark), _mwc(spark))


def sql_tailwind_aggregate() -> str:
    a = _replay()["tailwind_aggregate"]
    rows = [(
        round(a["class_similarity"], 6), round(a["set_jaccard"], 6),
        round(a["frequency_weighted_jaccard"], 6), round(a["median_similarity"], 6),
        round(a["percent_files_above_90"], 6), round(a["weighted_average"], 6),
        round(a["soft_average"], 6), a["files_compared"],
    )]
    return _values_sql(
        rows,
        ["class_similarity", "set_jaccard", "frequency_weighted_jaccard",
         "median_similarity", "percent_files_above_90", "weighted_average",
         "soft_average", "files_compared"],
        [_d, _d, _d, _d, _d, _d, _d, _i],
    )


def q_tailwind_change_impact(spark, sf_dir):
    return C.tailwind_change_impact(fixture_files(spark), _mwc(spark))


def sql_tailwind_change_impact() -> str:
    rows = _replay()["impact_rows"]
    return _values_sql(
        rows,
        ["original", "modified", "class", "original_count", "user_count", "count_diff"],
        [_s, _s, _s, _i, _i, _i],
    )


def q_summary_rollups(spark, sf_dir):
    return C.summary_rollups(fixture_files(spark), _mwc(spark))


def sql_summary_rollups() -> str:
    rows = [
        (ft, v["total"], v["matching"], v["different"], v["missing"], v["extra"])
        for ft, v in _replay()["rollups"].items()
    ]
    return _values_sql(
        rows,
        ["filetype", "total_elements", "matching", "different", "missing", "extra"],
        [_s, _i, _i, _i, _i, _i],
    )


def q_js_metric_averages(spark, sf_dir):
    return C.js_metric_averages(fixture_files(spark), _mwc(spark))


def sql_js_metric_averages() -> str:
    r = _replay()
    a = r["js_avgs"]
    rows = [(
        round(a["function_similarity"], 6), round(a["import_similarity"], 6),
        round(a["class_similarity"], 6), round(a["control_flow_similarity"], 6),
        round(a["call_graph_similarity"], 6), len(r["js_metric_rows"]),
    )]
    return _values_sql(
        rows,
        ["function_similarity", "import_similarity", "class_similarity",
         "control_flow_similarity", "call_graph_similarity", "pairs"],
        [_d, _d, _d, _d, _d, _i],
    )


def q_config_scores(spark, sf_dir):
    return config_df(spark).select(
        "kind", C.config_score_udf("kind", "json1", "json2").alias("score")
    )


def sql_config_scores() -> str:
    rows = sorted(_config_scores_py().items())
    return _values_sql(rows, ["kind", "score"], [_s, _d])


# 20 differently-seeded project pairs (round 4; was 3): each pair is a
# full ~30-file project on both sides, so the grouped-map distribution
# plumbing is exercised across more groups than cores and the oracle
# carries one A1/A2 row per pair.
_MANY_PAIR_SEEDS = tuple(range(42, 62))


def q_match_cascade_many(spark, sf_dir):
    """The MANY-pairs cascade as ONE grouped dataflow (cascade.py
    cascade_reports_per_pair): three differently-seeded project pairs run
    the whole E1 lifecycle per pair_id in a single applyInPandas pass —
    no cross-pair shuffle, linear in pairs. The driver row checks the
    grouped-map DISTRIBUTION plumbing (per-pair isolation, Arrow
    round-trip, row fan-in): both sides intentionally call the same
    replay (see module docstring); the composition math itself is
    fixture-pinned in pytest."""
    rows = []
    for pid, seed in enumerate(_MANY_PAIR_SEEDS):
        rows += [(pid, *r) for r in project_pair_rows(seed=seed)]
    df = spark.createDataFrame(rows, "pair_id long, " + _FILES_SCHEMA)
    rep = C.cascade_reports_per_pair(df)
    rnd = C.py_round_udf(6)
    return rep.select(
        "pair_id",
        rnd(F.col("overall_similarity")).alias("overall_similarity"),
        "total_files",
        "prediction",
        rnd(F.col("html_score")).alias("html_score"),
        rnd(F.col("css_score")).alias("css_score"),
        rnd(F.col("jsx_score")).alias("jsx_score"),
        rnd(F.col("js_score")).alias("js_score"),
        rnd(F.col("tailwind_class_similarity")).alias("tailwind_class_similarity"),
        "files_matched",
        "files_unmatched",
    )


def sql_match_cascade_many() -> str:
    from ..oracle.cascade_oracle import replay_cascade

    rows = []
    for pid, seed in enumerate(_MANY_PAIR_SEEDS):
        rep = replay_cascade(project_pair_rows(seed=seed))
        per = rep["per_type"]
        rows.append(
            (
                pid,
                round(rep["overall_similarity"], 6),
                rep["total_files"],
                rep["overall_prediction"],
                round(per["html"]["aggregate_score"], 6),
                round(per["css"]["aggregate_score"], 6),
                round(per["jsx"]["aggregate_score"], 6),
                round(per["js"]["aggregate_score"], 6),
                round(rep["tailwind_aggregate"]["class_similarity"], 6),
                sum(v["files_matched"] for v in per.values()),
                sum(v["files_unmatched"] for v in per.values()),
            )
        )
    ib = lambda v: _i(v, "BIGINT")  # noqa: E731
    return _values_sql(
        rows,
        [
            "pair_id", "overall_similarity", "total_files", "prediction",
            "html_score", "css_score", "jsx_score", "js_score",
            "tailwind_class_similarity", "files_matched", "files_unmatched",
        ],
        [ib, _d, ib, _s, _d, _d, _d, _d, _d, ib, ib],
    )


def q_single_pair_overall(spark, sf_dir):
    """A7 AND E2's app-level overall over the per-filetype aggregate
    scores: all 16 zero-masks of (html, jsx, js, css) exercise A7's
    nonzero-renormalization (0.3/0.3/0.4 over html/jsx/js) next to the
    /analyze formula (plain mean of nonzero html/jsx/css,
    web/app.py:248-259) — SURVEY Q4's three coexisting formulas, the
    third pinned since round 3."""
    agg = C.filetype_aggregates(fixture_files(spark), _mwc(spark)).select(
        "filetype", "aggregate_score"
    )
    one = (
        agg.groupBy()
        .pivot("filetype", ["html", "jsx", "js", "css"])
        .agg(F.first("aggregate_score"))
    )
    masks = spark.createDataFrame([(m,) for m in range(16)], "case_id int")
    g = one.crossJoin(masks)
    h = F.when(F.col("case_id").bitwiseAND(1) > 0, F.col("html")).otherwise(F.lit(0.0))
    j = F.when(F.col("case_id").bitwiseAND(2) > 0, F.col("jsx")).otherwise(F.lit(0.0))
    s = F.when(F.col("case_id").bitwiseAND(4) > 0, F.col("js")).otherwise(F.lit(0.0))
    c = F.when(F.col("case_id").bitwiseAND(8) > 0, F.col("css")).otherwise(F.lit(0.0))
    rnd = C.py_round_udf(6)
    return g.select(
        "case_id",
        h.alias("html_sim"),
        j.alias("jsx_sim"),
        s.alias("js_sim"),
        c.alias("css_sim"),
        rnd(C.single_pair_overall_expr(h, j, s)).alias("overall"),
        rnd(C.app_overall_expr(h, j, c)).alias("app_overall"),
    )


def sql_single_pair_overall() -> str:
    from ..oracle.cascade_oracle import app_overall, single_pair_overall

    per = _replay()["per_type"]
    hv, jv, sv, cv = (per[t]["aggregate_score"] for t in ("html", "jsx", "js", "css"))
    rows = []
    for m in range(16):
        h = hv if m & 1 else 0.0
        j = jv if m & 2 else 0.0
        s = sv if m & 4 else 0.0
        c = cv if m & 8 else 0.0
        rows.append(
            (m, h, j, s, c,
             round(single_pair_overall(h, j, s), 6), round(app_overall(h, j, c), 6))
        )
    ii = lambda v: _i(v, "INT")  # noqa: E731
    return _values_sql(
        rows,
        ["case_id", "html_sim", "jsx_sim", "js_sim", "css_sim", "overall", "app_overall"],
        [ii, _d, _d, _d, _d, _d, _d],
    )


CASCADE_QUERIES = {
    "match_cascade": q_match_cascade,
    "cascade_pair_scores": q_pair_scores,
    "cascade_js_pair_metrics": q_js_pair_metrics,
    "cascade_filetype_aggregates": q_filetype_aggregates,
    "cascade_overall_similarity": q_overall_similarity,
    "cascade_overall_with_config": q_overall_with_config,
    "tailwind_pair_scores": q_tailwind_pair_scores,
    "tailwind_aggregate": q_tailwind_aggregate,
    "tailwind_change_impact": q_tailwind_change_impact,
    "cascade_summary_rollups": q_summary_rollups,
    "cascade_js_metric_averages": q_js_metric_averages,
    "config_scores": q_config_scores,
    "single_pair_overall": q_single_pair_overall,
    "match_cascade_many": q_match_cascade_many,
}

_SQL_BUILDERS = {
    "match_cascade": sql_match_cascade,
    "cascade_pair_scores": sql_pair_scores,
    "cascade_js_pair_metrics": sql_js_pair_metrics,
    "cascade_filetype_aggregates": sql_filetype_aggregates,
    "cascade_overall_similarity": sql_overall_similarity,
    "cascade_overall_with_config": sql_overall_with_config,
    "tailwind_pair_scores": sql_tailwind_pair_scores,
    "tailwind_aggregate": sql_tailwind_aggregate,
    "tailwind_change_impact": sql_tailwind_change_impact,
    "cascade_summary_rollups": sql_summary_rollups,
    "cascade_js_metric_averages": sql_js_metric_averages,
    "config_scores": sql_config_scores,
    "single_pair_overall": sql_single_pair_overall,
    "match_cascade_many": sql_match_cascade_many,
}


@lru_cache(maxsize=1)
def cascade_oracle_sql() -> dict[str, str]:
    """Built lazily (the replay runs once, ~100 ms) and cached."""
    return {name: build() for name, build in _SQL_BUILDERS.items()}


# --------------------------------------------------------------------------
# E2 single-pair analysis (A7/A8 over real parses, incl. tree-sitter P2)
# --------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _forensic_cases() -> list[tuple]:
    """(case_id, html1, html2, jsx1, jsx2, js1, js2) — full triples plus
    absent-side variants exercising the A7 weight renormalization."""
    rows = project_pair_rows()
    get = {(side, path): content for side, path, _, content in rows}
    h1 = get[("original", "app/pages/shop.html")]
    h2 = get[("modified", "app/pages/shop.html")]
    x1 = get[("original", "src/components/Button.jsx")]
    x2 = get[("modified", "src/components/Buttons.jsx")]
    s1 = get[("original", "src/lib/api.js")]
    s2 = get[("modified", "src/lib/api2.js")]
    return [
        (0, h1, h2, x1, x2, s1, s2),
        (1, None, None, x1, x2, s1, s2),
        (2, h1, h2, None, None, s1, s2),
        (3, h1, h2, x1, x2, None, None),
        (4, h1, h2, x1, x1, s1, s1),   # identical jsx/js sides
        (5, None, None, None, None, None, None),
    ]


def q_forensic_pairs(spark, sf_dir):
    from ..functions.code_udfs import analyze_templates_udf

    df = spark.createDataFrame(
        _forensic_cases(),
        "case_id int, html1 string, html2 string, jsx1 string, jsx2 string, js1 string, js2 string",
    )
    return df.select(
        "case_id",
        analyze_templates_udf("html1", "html2", "jsx1", "jsx2", "js1", "js2").alias("r"),
    ).select("case_id", "r.*")


def sql_forensic_pairs() -> str:
    from ..oracle.forensic_oracle import analyze_pair

    cols = ["case_id", "html_similarity", "jsx_structure_similarity",
            "jsx_callgraph_similarity", "jsx_body_similarity", "jsx_similarity",
            "js_similarity", "overall_similarity"]
    out = []
    for case in _forensic_cases():
        r = analyze_pair(*case[1:])
        out.append(tuple([case[0]] + [r[c] for c in cols[1:]]))
    ii = lambda v: _i(v, "INT")  # noqa: E731
    return _values_sql(out, cols, [ii] + [_d] * 7)


CASCADE_QUERIES["forensic_pairs"] = q_forensic_pairs
_SQL_BUILDERS["forensic_pairs"] = sql_forensic_pairs
