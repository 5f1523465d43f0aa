"""Deterministic fixture rows for the text-pipeline gate queries.

The synthetic ``documents`` table is lowercase word-soup — no newlines,
bullets, ellipses, symbols, or PII — so the Gopher line rules and the
PII counters would be constant over it and the gate would not prove
them. Each gate query unions these crafted rows (doc_id >= 1_000_000,
far above any synthetic id) into BOTH faces: Spark via createDataFrame,
DuckDB via a rendered VALUES table, so the same bytes flow through both
engines. Module constants only — no I/O, no randomness.
"""

from __future__ import annotations

_PASS_ALL = (
    "the quick brown fox and the lazy dog have agreed that with some "
    "patience you can write one document that passes every single "
    "gopher rule because it has plenty of normal words of sensible "
    "length and it contains the common stopwords that the filter wants "
    "to see while avoiding bullets symbols and trailing dots entirely "
    "so the keep flag must come out true for this row"
)

# (doc_id, text) — each row names the rule it exercises.
QUALITY_FIXTURE_ROWS: tuple[tuple[int, str], ...] = (
    (1000000, _PASS_ALL),  # keep = 1: every rule satisfied
    (1000001, "too short to keep the filter happy"),  # n_words < 50
    (1000002, "- one\n- two\n- three\n- four\nplain"),  # bullet lines 4/5
    (1000003, "wait...\nmore...\nfine\nok"),  # ellipsis lines 2/4
    (1000004, "# a # b # c # d # e # f"),  # symbol_ratio >> 0.1
    (1000005, "12 34 56 78 90 11 22 33"),  # alpha_word_frac = 0
    (1000006, "supercalifragilisticexpialidocious pneumonoultramicroscopicsilicovolcanoconiosis"),  # mean_word_len > 10
    (1000007, "a b c d e f g h i j"),  # mean_word_len < 3
    (1000008, ""),  # empty text: every count 0, fractions 0
    (1000009, "* starred bullet line\nnormal line"),  # '* ' bullet form
)

PII_FIXTURE_ROWS: tuple[tuple[int, str], ...] = (
    (1000100, "contact alice.smith+spam@example.org or bob@sub.domain.co for details"),
    (1000101, "server at 10.0.0.1 and backup at 192.168.254.3 port whatever"),
    (1000102, "call 415-555-2671 or 212-555-0100 now"),
    (1000103, "mixed: eve@host.io from 172.16.0.9 dialed 650-555-1234 twice: 650-555-1234"),
    # the email's domain ends with a dotted-number-ish host: replacement
    # order (email first) must redact it as ONE <EMAIL>, not <EMAIL>+<IP>
    (1000104, "odd@10.0.0.1.example.net plus a bare 8.8.8.8"),
    (1000105, "no pii here at all just words"),
    (1000106, ""),
)

# Cross-document span sharing (window_span_dedup: span_words=8, stride=4;
# windows start at word positions 1, 5, 9, ...). R is a 16-word run.
_R = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa"
)
SPAN_FIXTURE_ROWS: tuple[tuple[int, str], ...] = (
    # A: R at position 1, then 8 unique words -> R-internal windows at 1/5/9
    (1000200, _R + " quebec romeo sierra tango uniform victor whiskey xray"),
    # B: 4-word prefix puts R at position 5 (stride-aligned) -> B's
    # windows at 5/9/13 hash-match A's at 1/5/9
    (1000201, "zero one two three " + _R + " yankee zulu"),
    # C: unrelated words, no shared windows
    (1000202, "red orange yellow green blue indigo violet cyan magenta teal maroon olive"),
    # D: exact copy of A — every window duplicated
    (1000203, _R + " quebec romeo sierra tango uniform victor whiskey xray"),
    # E: too short to shingle (n_windows = 0)
    (1000204, "just five words right here"),
)


def fixture_values_sql(rows: tuple[tuple[int, str], ...]) -> str:
    """Render rows as a DuckDB VALUES relation ``(doc_id, text)``.

    Newlines become ``chr(10)`` concatenations so the SQL literal stays
    single-line printable; quotes are doubled per the SQL standard.
    """
    rendered = []
    for doc_id, text in rows:
        parts = text.split("\n")
        lits = [f"'{p.replace(chr(39), chr(39) * 2)}'" for p in parts]
        expr = " || chr(10) || ".join(lits)
        rendered.append(f"({doc_id}, {expr})")
    return "(VALUES " + ", ".join(rendered) + ") fixture_rows(doc_id, text)"


def union_table_sql(rows: tuple[tuple[int, str], ...], table: str = "documents") -> str:
    """A table expression: real table UNION ALL fixture rows, ready to
    pass as the ``table`` argument of the operator SQL builders."""
    return (
        f"(SELECT doc_id, text FROM {table}"
        f" UNION ALL SELECT doc_id, text FROM {fixture_values_sql(rows)}) docs_plus_fixture"
    )


def fixture_df(spark, rows: tuple[tuple[int, str], ...]):
    return spark.createDataFrame(list(rows), "doc_id long, text string")


# Benchmark-decontamination eval set (decontaminate: n=8, stride 1).
# The middle doc carries words 3..12 of _R, so its three 8-grams hit the
# SPAN fixture docs A (1000200), B (1000201) and D (1000203) — at
# DIFFERENT window offsets, proving the stride-1 any-alignment rule —
# while C/E and the word-soup corpus stay clean.
EVAL_FIXTURE_ROWS: tuple[tuple[int, str], ...] = (
    (1000300, "charlie delta echo foxtrot golf hotel india juliet kilo lima"),
    (1000301, "a benchmark question about nothing the corpus contains at all"),
    (1000302, "too short to shingle"),
)
