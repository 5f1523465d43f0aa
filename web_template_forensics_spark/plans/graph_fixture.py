"""Deterministic edge/node fixture for the dedup-cluster gate query.

The consensus near-dup pairs over the synthetic corpus are (at gate
scale) cliques of mutual near-duplicates, so they cannot prove the part
that makes connected components necessary: TRANSITIVITY — A~B and B~C
landing A, B, C in one cluster when A~C never fired. These crafted
edges (node ids >= 2_000_000, above every synthetic doc_id and every
text-fixture id) union into BOTH faces — Spark via createDataFrame,
DuckDB via a rendered VALUES relation. Module constants only — no I/O,
no randomness.
"""

from __future__ import annotations

# (id_a, id_b) — each block names the graph shape it pins.
COMPONENT_FIXTURE_EDGES: tuple[tuple[int, int], ...] = (
    # 4-node chain: pure transitivity, diameter 3
    (2000001, 2000002),
    (2000002, 2000003),
    (2000003, 2000004),
    # triangle with a tail: cycle + pendant
    (2000011, 2000012),
    (2000012, 2000013),
    (2000011, 2000013),
    (2000013, 2000014),
    # reversed orientation (larger id first) — input order must not matter
    (2000022, 2000021),
    # self-loop: must drop, node stays a singleton cluster
    (2000031, 2000031),
    # two pairs merged by one bridge edge
    (2000041, 2000042),
    (2000043, 2000044),
    (2000042, 2000043),
)

# every node id above, plus the self-loop singleton
COMPONENT_FIXTURE_NODES: tuple[int, ...] = tuple(
    sorted({i for e in COMPONENT_FIXTURE_EDGES for i in e})
)


def edges_df(spark):
    return spark.createDataFrame(list(COMPONENT_FIXTURE_EDGES), "id_a long, id_b long")


def nodes_df(spark):
    return spark.createDataFrame(
        [(i,) for i in COMPONENT_FIXTURE_NODES], "doc_id long"
    )


def edges_values_sql() -> str:
    vals = ", ".join(f"({a}, {b})" for a, b in COMPONENT_FIXTURE_EDGES)
    return f"(VALUES {vals}) fixture_edges(id_a, id_b)"


def nodes_values_sql() -> str:
    vals = ", ".join(f"({i})" for i in COMPONENT_FIXTURE_NODES)
    return f"(VALUES {vals}) fixture_nodes(doc_id)"
