"""Connected components (large-star/small-star) vs a union-find twin.

Every graph shape the operator must survive: chains (multi-hop
transitivity), cycles, stars (skew hubs), bridges, self-loops,
reversed edge orientation, empty edge sets, and a seeded random graph —
each compared label-for-label against a 20-line driver-side union-find.
"""

from __future__ import annotations

import random

from web_template_forensics_spark.operators.components import (
    connected_components,
    dedup_clusters,
)


def _uf_components(edges):
    """Union-find reference: {node: min-node-of-component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want
    return got


def test_chain_transitivity(spark):
    # diameter-9 chain: the shape label propagation is slow on and
    # star rounds must still collapse to one min label
    _run(spark, [(i, i + 1) for i in range(10, 19)])


def test_cycle_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    got = _run(spark, edges)
    assert all(c == 1 for _, c in got)


def test_skew_star_hub(spark):
    # one hub with 200 leaves — the case large-star exists for
    edges = [(500, i) for i in range(1000, 1200)]
    got = _run(spark, edges)
    assert {c for _, c in got} == {500}


def test_self_loops_and_reversed(spark):
    # contract: a node whose ONLY edges are self-loops is absent from
    # connected_components output (dedup_clusters restores it from the
    # doc set as a singleton); reversed orientation must not matter
    edges = [(7, 7), (9, 8), (8, 2)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {(r["node"], r["component"]) for r in connected_components(df).collect()}
    assert got == {(9, 2), (8, 2), (2, 2)}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(300))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(220)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_two_components_merge_only_via_bridge(spark):
    edges = [(11, 12), (21, 22)]
    got = dict(_run(spark, edges))
    assert got[12] == 11 and got[22] == 21
    got2 = dict(_run(spark, edges + [(12, 22)]))
    assert set(got2.values()) == {11}


def test_dedup_clusters_singletons_and_canonicals(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    edges = spark.createDataFrame([(2, 5), (5, 3)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, edges).collect()}
    assert len(rows) == 7
    for d in (2, 3, 5):
        assert rows[d]["cluster_id"] == 2 and rows[d]["cluster_size"] == 3
        assert rows[d]["is_canonical"] == (1 if d == 2 else 0)
    for d in (1, 4, 6, 7):
        assert rows[d]["cluster_id"] == d
        assert rows[d]["cluster_size"] == 1
        assert rows[d]["is_canonical"] == 1


def test_dedup_clusters_edge_node_missing_from_docs(spark):
    # an edge endpoint outside the doc set must not invent output rows
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    edges = spark.createDataFrame([(2, 99)], "id_a long, id_b long")
    rows = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, edges).collect()}
    assert set(rows) == {1, 2}
    assert rows[2] == 2  # component min is 2 among {2, 99}


def test_fixture_cluster_shapes(spark):
    from web_template_forensics_spark.plans.graph_fixture import (
        COMPONENT_FIXTURE_EDGES,
        COMPONENT_FIXTURE_NODES,
    )

    docs = spark.createDataFrame(
        [(i,) for i in COMPONENT_FIXTURE_NODES], "doc_id long"
    )
    edges = spark.createDataFrame(
        list(COMPONENT_FIXTURE_EDGES), "id_a long, id_b long"
    )
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, edges).collect()}
    assert rows[2000004]["cluster_id"] == 2000001  # chain end, 3 hops
    assert rows[2000004]["cluster_size"] == 4
    assert rows[2000014]["cluster_id"] == 2000011  # triangle tail
    assert rows[2000022]["cluster_id"] == 2000021  # reversed orientation
    assert rows[2000031]["cluster_size"] == 1      # self-loop singleton
    assert rows[2000044]["cluster_id"] == 2000041  # bridge merge
    assert rows[2000044]["cluster_size"] == 4


def test_corpus_curation_decision_consistency(spark):
    from web_template_forensics_spark.plans.queries import (
        CURATION_MAX_TOP2GRAM,
        CURATION_MIN_WORDS,
        q_corpus_curation,
    )

    rows = q_corpus_curation(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        bad_q = r["n_words"] < CURATION_MIN_WORDS
        bad_r = r["top2gram_frac"] > CURATION_MAX_TOP2GRAM
        dup = r["is_canonical"] == 0
        assert r["keep"] == (0 if (bad_q or bad_r or dup) else 1)
        want = (
            "quality" if bad_q
            else "repetition" if bad_r
            else "duplicate" if dup
            else "none"
        )
        assert r["drop_reason"] == want


def test_semantic_fixture_topology(spark):
    # fixture ids: A=1000000 B=1000001 C=1000002 D=copy-of-A=1000003
    # E=isolate F=1000005 G=1000006 (F~G below threshold)
    from web_template_forensics_spark.plans.queries import (
        q_semantic_dedup_clusters,
        q_semantic_near_dup,
    )

    sf = "/root/testdata/sf0.001"
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in q_semantic_near_dup(spark, sf).collect()
        if r["id_a"] >= 1000000
    }
    assert set(pairs) == {
        (1000000, 1000001),
        (1000000, 1000003),
        (1000001, 1000002),
        (1000001, 1000003),
    }
    assert pairs[(1000000, 1000003)] == 1.0  # exact copy
    # A~C and F~G are candidates but below 0.95: must NOT appear
    clusters = {
        r["vec_id"]: r
        for r in q_semantic_dedup_clusters(spark, sf).collect()
        if r["vec_id"] >= 1000000
    }
    # the chain merges A,B,C,D into one cluster rooted at A
    for vid in (1000000, 1000001, 1000002, 1000003):
        assert clusters[vid]["cluster_id"] == 1000000
        assert clusters[vid]["cluster_size"] == 4
    assert clusters[1000000]["is_canonical"] == 1
    for vid in (1000004, 1000005, 1000006):
        assert clusters[vid]["cluster_size"] == 1
