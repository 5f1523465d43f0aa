"""TF-IDF top-k vs a pure-Python twin on a crafted mini-corpus."""

from __future__ import annotations

import math

from web_template_forensics_spark.operators.tfidf import tfidf_topk_pairs

_DOCS = [
    (1, "apple banana cherry apple"),
    (2, "apple banana date"),
    (3, "cherry cherry cherry elderberry"),
    (4, "fig grape honeydew"),
    (5, "fig grape banana"),
    (6, "the the the the"),  # token 'the' everywhere-ish? only here — survives
]


def _py_topk(docs, k=3, df_cap_frac=0.6):
    n = len(docs)
    cap = int(df_cap_frac * n)
    tf = {}
    for did, text in docs:
        for t in text.split():
            tf[(did, t)] = tf.get((did, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    keep = {t for t, d in df.items() if d <= cap}
    w = {
        (did, t): round(c * (math.log((n + 1) / (df[t] + 1)) + 1.0), 9)
        for (did, t), c in tf.items()
        if t in keep
    }
    ids = sorted({d for d, _ in w})
    nrm = {
        d: round(math.sqrt(sum(v * v for (dd, _), v in w.items() if dd == d)), 9)
        for d in ids
    }
    out = []
    for a in ids:
        scored = []
        for b in ids:
            if b == a:
                continue
            dot = sum(
                w[(a, t)] * w[(b, t)]
                for (dd, t) in w
                if dd == a and (b, t) in w
            )
            if dot:
                scored.append((round(round(dot / (nrm[a] * nrm[b]), 9), 6), b))
        scored.sort(key=lambda x: (-x[0], x[1]))
        for r, (c, b) in enumerate(scored[:k], 1):
            out.append((a, b, r, c))
    return set(out)


def test_matches_python_twin(spark):
    df = spark.createDataFrame(_DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["neighbor_id"], r["rank"], r["cosine"])
        for r in tfidf_topk_pairs(df, k=3).collect()
    }
    assert got == _py_topk(_DOCS, k=3)


def test_df_cap_prunes_ubiquitous_tokens(spark):
    # 'x' appears in every doc -> pruned; only the 'y' pair survives
    docs = [(i, "x") for i in range(1, 10)] + [(10, "x y"), (11, "x y")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = tfidf_topk_pairs(df, k=3).collect()
    assert {(r["doc_id"], r["neighbor_id"]) for r in rows} == {(10, 11), (11, 10)}
    assert all(r["cosine"] == 1.0 for r in rows)
