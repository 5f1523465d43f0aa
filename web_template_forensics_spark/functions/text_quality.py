"""Training-data text-quality rules — Gopher-style filters + PII, two-faced.

Every rule is an exactly-specified function of the raw ``text`` string
with a Spark Column face (pure ``pyspark.sql.functions`` — JVM-side,
whole-stage codegen, zero Python in the hot path) and a DuckDB SQL face
built from the SAME spec, so the driver's correctness gate can replay
each rule verbatim (the repo-wide two-faced pattern of
``functions/text_udfs.py``).

The rule set follows the published Gopher quality heuristics (Rae et
al. 2021, "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher", Table A1) re-specified over this repo's shared ASCII
whitespace class (``text_udfs.ASCII_WS_REGEX`` — RE2's ``\\s`` excludes
``\\x0B``, so every face spells the class out):

- ``n_words``      — whitespace-token count (non-space runs).
- ``mean_word_len``— non-whitespace chars / n_words (Gopher keeps
                     documents with mean word length in [3, 10]).
- ``alpha_word_frac`` — fraction of words containing at least one
                     ``[A-Za-z]`` (Gopher: > 0.8 must contain an
                     alphabetic character).
- ``stopword_kinds``  — how many DISTINCT words of the Gopher stop set
                     {the, be, to, of, and, that, have, with} appear at
                     least once in the lower-cased, whitespace-collapsed
                     text (Gopher: >= 2).
- ``symbol_ratio`` — (count of '#' + count of '...') / n_words
                     (Gopher: symbol-to-word ratio < 0.1).
- ``bullet_line_frac`` / ``ellipsis_line_frac`` — fraction of
                     newline-split lines starting with '- ' / '* '
                     resp. ending with '...' (Gopher: < 0.9 / < 0.3;
                     ASCII bullets only — the spec is the code).
- ``gopher_keep``  — 1 iff 50 <= n_words <= 100000 AND
                     3.0 <= mean_word_len <= 10.0 AND
                     symbol_ratio < 0.1 AND bullet_line_frac < 0.9 AND
                     ellipsis_line_frac < 0.3 AND
                     alpha_word_frac > 0.8 AND stopword_kinds >= 2.
                     Comparisons run on the ROUNDED (6 dp) fractions so
                     both engines compare bit-identical doubles.

PII rules use RE2-safe patterns (no lookaround, no ``\\d``/``\\w``/
``\\b`` shorthand — explicit ASCII classes only, per the cross-engine
regex parity notes in ``BPE_TOKEN_PATTERN``): email, IPv4-shaped, and
NANP-dashed phone. ``redact`` replaces matches with ``<EMAIL>`` /
``<IP>`` / ``<PHONE>`` in that fixed order; the gate compares the md5
of the redacted text, so one divergent byte fails the row.

Reference parity: the reference has no text-quality surface (SURVEY.md
§2 — LLM-pipeline graft components); the rule definitions come from the
public Gopher paper, re-specified deterministically.

100 TB shape: every rule is a scalar projection — no shuffle, no
Python, fully pushdown-friendly (only ``text`` is read).
"""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .text_udfs import ASCII_WS_REGEX, _count_token_occurrences_col, _count_token_occurrences_sql

# The Gopher stop set (Table A1). Order fixed for deterministic SQL.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# RE2 ∩ Java-regex ∩ Python-re safe PII patterns: explicit ASCII
# classes, no shorthand, no anchors, no lookaround. `[.]` (not `\.`)
# keeps the literal printable through SQL string quoting.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
IPV4_RE = "[0-9]{1,3}([.][0-9]{1,3}){3}"
PHONE_RE = "[0-9]{3}[-][0-9]{3}[-][0-9]{4}"
# replacement order is part of the spec (email first: an email's domain
# can contain an IPv4-shaped substring, which must already be redacted
# as part of the email, not double-counted)
PII_REPLACEMENTS = ((EMAIL_RE, "<EMAIL>"), (IPV4_RE, "<IP>"), (PHONE_RE, "<PHONE>"))


# --------------------------------------------------------------------------
# shared word/line decomposition
# --------------------------------------------------------------------------


def collapsed_text_col(text: Column) -> Column:
    """Whitespace-collapsed, trimmed text — the canonical word stream."""
    return F.trim(F.regexp_replace(F.coalesce(text, F.lit("")), F.lit(ASCII_WS_REGEX), F.lit(" ")))


def collapsed_text_sql(text_expr: str) -> str:
    return f"trim(regexp_replace(coalesce(({text_expr}), ''), '{ASCII_WS_REGEX}', ' ', 'g'))"


def words_col(text: Column) -> Column:
    """Word array of the collapsed text; EMPTY array (not ['']) for
    blank text — Spark's split('') and DuckDB's string_split('') both
    yield [''], so both faces guard identically."""
    c = collapsed_text_col(text)
    return F.when(F.length(c) > 0, F.split(c, " ")).otherwise(
        F.array().cast("array<string>")
    )


def words_sql(text_expr: str) -> str:
    c = collapsed_text_sql(text_expr)
    return f"(CASE WHEN length({c}) > 0 THEN string_split({c}, ' ') ELSE [] END)"


def _lines_col(text: Column) -> Column:
    return F.split(F.coalesce(text, F.lit("")), "\n")


def _lines_sql(text_expr: str) -> str:
    return f"string_split(coalesce(({text_expr}), ''), chr(10))"


def _occurrences_col(text: Column, needle: str) -> Column:
    """Non-overlapping literal occurrences via length/replace — identical
    integer semantics in Spark and DuckDB (no regex engine involved)."""
    t = F.coalesce(text, F.lit(""))
    return (
        (F.length(t) - F.length(F.replace(t, F.lit(needle)))) / F.lit(len(needle))
    ).cast("long")


def _occurrences_sql(text_expr: str, needle: str) -> str:
    t = f"coalesce(({text_expr}), '')"
    esc = needle.replace("'", "''")
    return f"cast((length({t}) - length(replace({t}, '{esc}', ''))) / {len(needle)} as bigint)"


# --------------------------------------------------------------------------
# Gopher rule columns (each returns the full select list)
# --------------------------------------------------------------------------


def gopher_rule_cols(text: Column) -> dict[str, Column]:
    """All Gopher rule columns keyed by output name (see module doc)."""
    words = words_col(text)
    n_words = F.size(words).cast("long")
    collapsed = collapsed_text_col(text)
    non_ws = F.length(F.regexp_replace(F.coalesce(text, F.lit("")), F.lit(ASCII_WS_REGEX), F.lit("")))
    mean_word_len = F.when(
        n_words > 0, F.round(non_ws.cast("double") / n_words.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    alpha_word_frac = F.when(
        n_words > 0, F.round(alpha_words.cast("double") / n_words.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    low = F.lower(collapsed)
    kinds = None
    for sw in GOPHER_STOPWORDS:
        present = F.when(_count_token_occurrences_col(low, sw) > 0, F.lit(1)).otherwise(F.lit(0))
        kinds = present if kinds is None else kinds + present
    stopword_kinds = kinds.cast("long")
    symbols = _occurrences_col(text, "#") + _occurrences_col(text, "...")
    symbol_ratio = F.when(
        n_words > 0, F.round(symbols.cast("double") / n_words.cast("double"), 6)
    ).otherwise(F.lit(0.0))
    lines = _lines_col(text)
    n_lines = F.size(lines).cast("long")  # >= 1 always (split of '' -> [''])
    bullet = F.size(
        F.filter(lines, lambda l: F.startswith(l, F.lit("- ")) | F.startswith(l, F.lit("* ")))
    ).cast("long")
    ellipsis = F.size(F.filter(lines, lambda l: F.endswith(l, F.lit("...")))).cast("long")
    bullet_line_frac = F.round(bullet.cast("double") / n_lines.cast("double"), 6)
    ellipsis_line_frac = F.round(ellipsis.cast("double") / n_lines.cast("double"), 6)
    keep = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (symbol_ratio < 0.1)
        & (bullet_line_frac < 0.9)
        & (ellipsis_line_frac < 0.3)
        & (alpha_word_frac > 0.8)
        & (stopword_kinds >= 2)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "alpha_word_frac": alpha_word_frac,
        "stopword_kinds": stopword_kinds,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_line_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
        "gopher_keep": F.when(keep, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    }


def gopher_rule_sqls(text_expr: str) -> dict[str, str]:
    """The same rules as DuckDB SQL expressions, same keys/order."""
    words = words_sql(text_expr)
    n_words = f"cast(len({words}) as bigint)"
    collapsed = collapsed_text_sql(text_expr)
    non_ws = f"length(regexp_replace(coalesce(({text_expr}), ''), '{ASCII_WS_REGEX}', '', 'g'))"
    mean_word_len = (
        f"(CASE WHEN {n_words} > 0 THEN round(cast({non_ws} as double) / cast({n_words} as double), 6) ELSE 0.0 END)"
    )
    alpha_words = f"cast(len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]'))) as bigint)"
    alpha_word_frac = (
        f"(CASE WHEN {n_words} > 0 THEN round(cast({alpha_words} as double) / cast({n_words} as double), 6) ELSE 0.0 END)"
    )
    low = f"lower({collapsed})"
    kinds = " + ".join(
        f"(CASE WHEN {_count_token_occurrences_sql(low, sw)} > 0 THEN 1 ELSE 0 END)"
        for sw in GOPHER_STOPWORDS
    )
    stopword_kinds = f"cast(({kinds}) as bigint)"
    symbols = f"({_occurrences_sql(text_expr, '#')} + {_occurrences_sql(text_expr, '...')})"
    symbol_ratio = (
        f"(CASE WHEN {n_words} > 0 THEN round(cast({symbols} as double) / cast({n_words} as double), 6) ELSE 0.0 END)"
    )
    lines = _lines_sql(text_expr)
    n_lines = f"cast(len({lines}) as bigint)"
    bullet = f"cast(len(list_filter({lines}, l -> starts_with(l, '- ') OR starts_with(l, '* '))) as bigint)"
    ellipsis = f"cast(len(list_filter({lines}, l -> ends_with(l, '...'))) as bigint)"
    bullet_line_frac = f"round(cast({bullet} as double) / cast({n_lines} as double), 6)"
    ellipsis_line_frac = f"round(cast({ellipsis} as double) / cast({n_lines} as double), 6)"
    keep = (
        f"({n_words} >= 50 AND {n_words} <= 100000"
        f" AND {mean_word_len} >= 3.0 AND {mean_word_len} <= 10.0"
        f" AND {symbol_ratio} < 0.1 AND {bullet_line_frac} < 0.9"
        f" AND {ellipsis_line_frac} < 0.3 AND {alpha_word_frac} > 0.8"
        f" AND {stopword_kinds} >= 2)"
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "alpha_word_frac": alpha_word_frac,
        "stopword_kinds": stopword_kinds,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_line_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
        "gopher_keep": f"cast((CASE WHEN {keep} THEN 1 ELSE 0 END) as bigint)",
    }


# --------------------------------------------------------------------------
# PII columns
# --------------------------------------------------------------------------


def pii_cols(text: Column) -> dict[str, Column]:
    t = F.coalesce(text, F.lit(""))
    red = t
    for pat, token in PII_REPLACEMENTS:
        red = F.regexp_replace(red, F.lit(pat), F.lit(token))
    return {
        "email_count": F.regexp_count(t, F.lit(EMAIL_RE)).cast("long"),
        "ipv4_count": F.regexp_count(t, F.lit(IPV4_RE)).cast("long"),
        "phone_count": F.regexp_count(t, F.lit(PHONE_RE)).cast("long"),
        "redacted_md5": F.md5(red),
    }


def pii_sqls(text_expr: str) -> dict[str, str]:
    t = f"coalesce(({text_expr}), '')"
    red = t
    for pat, token in PII_REPLACEMENTS:
        red = f"regexp_replace({red}, '{pat}', '{token}', 'g')"
    return {
        "email_count": f"cast(len(regexp_extract_all({t}, '{EMAIL_RE}')) as bigint)",
        "ipv4_count": f"cast(len(regexp_extract_all({t}, '{IPV4_RE}')) as bigint)",
        "phone_count": f"cast(len(regexp_extract_all({t}, '{PHONE_RE}')) as bigint)",
        "redacted_md5": f"md5({red})",
    }


# --------------------------------------------------------------------------
# pure-Python twin (pytest envelope oracle — NOT used on the cluster)
# --------------------------------------------------------------------------

_WS_RE = re.compile(ASCII_WS_REGEX)
_ALPHA_RE = re.compile("[A-Za-z]")


def gopher_rules_py(text: str | None) -> dict[str, object]:
    """Driver-side reference implementation of the same spec, used by
    pytest to pin the Column face's semantics string-by-string."""
    t = text or ""
    collapsed = _WS_RE.sub(" ", t).strip()
    words = collapsed.split(" ") if collapsed else []
    n_words = len(words)
    non_ws = len(_WS_RE.sub("", t))
    mean_word_len = round(non_ws / n_words, 6) if n_words else 0.0
    alpha = sum(1 for w in words if _ALPHA_RE.search(w))
    alpha_word_frac = round(alpha / n_words, 6) if n_words else 0.0
    low = f" {collapsed.lower()} "
    stopword_kinds = sum(1 for sw in GOPHER_STOPWORDS if f" {sw} " in low)
    symbols = t.count("#") + t.count("...")
    symbol_ratio = round(symbols / n_words, 6) if n_words else 0.0
    lines = t.split("\n")
    bullet = sum(1 for l in lines if l.startswith(("- ", "* ")))
    ellipsis = sum(1 for l in lines if l.endswith("..."))
    bullet_line_frac = round(bullet / len(lines), 6)
    ellipsis_line_frac = round(ellipsis / len(lines), 6)
    keep = (
        50 <= n_words <= 100000
        and 3.0 <= mean_word_len <= 10.0
        and symbol_ratio < 0.1
        and bullet_line_frac < 0.9
        and ellipsis_line_frac < 0.3
        and alpha_word_frac > 0.8
        and stopword_kinds >= 2
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "alpha_word_frac": alpha_word_frac,
        "stopword_kinds": stopword_kinds,
        "symbol_ratio": symbol_ratio,
        "bullet_line_frac": bullet_line_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
        "gopher_keep": int(keep),
    }


def pii_py(text: str | None) -> dict[str, object]:
    t = text or ""
    red = t
    for pat, token in PII_REPLACEMENTS:
        red = re.sub(pat, token, red)
    return {
        "email_count": len(re.findall(EMAIL_RE, t)),
        "ipv4_count": len(re.findall(IPV4_RE, t)),
        "phone_count": len(re.findall(PHONE_RE, t)),
        "redacted_md5": hashlib.md5(red.encode("utf-8")).hexdigest(),
    }
