"""Deterministic embedding fixture for the semantic near-dup gate.

The synthetic embeddings table has NO high-cosine pairs (max pairwise
cosine 0.513 at sf0.01), so a semantic near-dup threshold that means
anything (0.95) would generate zero pairs and the gate would prove
nothing. These crafted vectors (vec_id >= 1_000_000, above every
synthetic id) union into BOTH faces and pin the topology that makes
the operator + components composition non-trivial:

- A~B (cos 0.970143) and B~C (cos 0.976187) but A~C = 0.894427 < 0.95:
  a transitive CHAIN only connected components can merge;
- D = exact copy of A (cos 1.0);
- E: orthogonal isolate;
- F~G at cos 0.936329 — candidates in the same LSH bucket, REJECTED by
  the threshold (pins that candidate generation is not acceptance).

Every non-zero component is exactly representable in float32 (1, 0.25,
0.5, 0.375), so parquet-float vs SQL-literal round-trips are bitwise
and both faces compute identical cosines. Module constants only.
"""

from __future__ import annotations

DIM = 64


def _v(*pairs: tuple[int, float]) -> tuple[float, ...]:
    vec = [0.0] * DIM
    for i, x in pairs:
        vec[i] = x
    return tuple(vec)


# (vec_id, vector) — see module docstring for the pinned topology.
EMBEDDING_FIXTURE_ROWS: tuple[tuple[int, tuple[float, ...]], ...] = (
    (1000000, _v((0, 1.0))),                 # A
    (1000001, _v((0, 1.0), (1, 0.25))),      # B
    (1000002, _v((0, 1.0), (1, 0.5))),       # C
    (1000003, _v((0, 1.0))),                 # D = A
    (1000004, _v((1, 1.0))),                 # E isolate
    (1000005, _v((2, 1.0))),                 # F
    (1000006, _v((2, 1.0), (3, 0.375))),     # G: ~F below threshold
)


def fixture_df(spark):
    return spark.createDataFrame(
        [(i, list(v)) for i, v in EMBEDDING_FIXTURE_ROWS],
        "vec_id long, embedding array<float>",
    )


def fixture_values_sql() -> str:
    rows = ", ".join(
        "({}, [{}]::FLOAT[])".format(
            i, ", ".join(repr(x) for x in v)
        )
        for i, v in EMBEDDING_FIXTURE_ROWS
    )
    return f"(VALUES {rows}) fixture_vecs(vec_id, embedding)"


def union_table_sql(table: str = "embeddings") -> str:
    """(vec_id, embedding) relation: real table UNION ALL fixture."""
    return (
        f"(SELECT vec_id, embedding FROM {table}"
        f" UNION ALL SELECT vec_id, embedding FROM {fixture_values_sql()}) vecs_plus_fixture"
    )
