"""Operator-level Spark tests: UDF==oracle parity, round-trips, greedy
matching fidelity, dedup signatures."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from web_template_forensics_spark.geo import cells


def test_cell_udf_matches_sql_columns(spark):
    """Arrow UDF and pure-SQL morton column must agree exactly."""
    from web_template_forensics_spark.functions.geo_udfs import (
        cell_encode_udf,
        cell_id_col,
        tile_ix_col,
        tile_iy_col,
    )

    rng = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-89, 89, 500), "lon": rng.uniform(-180, 179.9, 500)}
    )
    df = spark.createDataFrame(pdf)
    lvl = 12
    out = df.select(
        cell_encode_udf(lvl)(F.col("lat"), F.col("lon")).alias("udf_cell"),
        cell_id_col(F.col("lat"), F.col("lon"), lvl).alias("sql_cell"),
        tile_ix_col(F.col("lon"), lvl).alias("ix"),
        tile_iy_col(F.col("lat"), lvl).alias("iy"),
    ).toPandas()
    assert (out.udf_cell == out.sql_cell).all()
    # and both agree with the numpy spec
    spec = cells.cell_encode(pdf.lat.to_numpy(), pdf.lon.to_numpy(), lvl)
    assert np.array_equal(np.sort(out.udf_cell.to_numpy()), np.sort(spec))


def test_raster_vector_roundtrip(spark):
    from web_template_forensics_spark.operators.tiles import (
        rasterize_tiles,
        tile_rollup,
        vectorize_raster,
    )

    rng = np.random.RandomState(4)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-60, 60, 2000), "lon": rng.uniform(-170, 170, 2000)}
    )
    df = spark.createDataFrame(pdf)
    z_base, depth = 3, 3
    raster = rasterize_tiles(df, z_base, depth)
    back = vectorize_raster(raster, depth).toPandas()
    # direct fine-tile rollup must equal the raster->vector extraction
    direct = (
        tile_rollup(df, z_base + depth)
        .toPandas()
        .rename(columns={"tile_x": "fine_x", "tile_y": "fine_y", "page_count": "n"})
    )
    a = back.sort_values(["fine_x", "fine_y"]).reset_index(drop=True)
    b = direct[["fine_x", "fine_y", "n"]].sort_values(["fine_x", "fine_y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["fine_x", "fine_y", "n"]], b)
    # grid cells sum to total points
    assert back.n.sum() == 2000


def test_knn_matches_bruteforce(spark):
    from web_template_forensics_spark.operators.spatial_join import knn_join

    rng = np.random.RandomState(5)
    n = 400
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "lat": rng.uniform(-80, 80, n),
            "lon": rng.uniform(-179, 179, n),
        }
    )
    df = spark.createDataFrame(pdf)
    probes = df.filter(F.col("id") % 10 == 0)
    got = (
        knn_join(spark, probes, df, k=4, level=3)
        .toPandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    # pure-numpy brute force
    lats, lons = pdf.lat.to_numpy(), pdf.lon.to_numpy()
    rows = []
    for pid in range(0, n, 10):
        d2 = (lats[pid] - lats) ** 2 + (lons[pid] - lons) ** 2
        order = sorted((float(d2[j]), j) for j in range(n) if j != pid)[:4]
        for r, (dd, j) in enumerate(order, 1):
            rows.append((pid, j, r, dd))
    exp = pd.DataFrame(rows, columns=["probe_id", "neighbor_id", "rank", "dist2"])
    assert len(got) == len(exp)
    assert (got.probe_id.to_numpy() == exp.probe_id.to_numpy()).all()
    assert (got.neighbor_id.to_numpy() == exp.neighbor_id.to_numpy()).all()
    assert np.array_equal(got.dist2.to_numpy(), exp.dist2.to_numpy())


def test_greedy_match_replays_reference_semantics(spark):
    """greedy_similarity_match == the reference fuzzy loop
    (core/file_matcher.py:61-82) run on sorted inputs."""
    import difflib

    from web_template_forensics_spark.operators.matching import (
        fuzzy_filename_scores,
        greedy_similarity_match,
    )

    files1 = sorted(
        ["src/index.html", "src/about.html", "css/main.css", "js/app.js", "js/util.js"]
    )
    files2 = sorted(
        ["src/index2.html", "src/about.html", "css/maine.css", "js/apps.js", "js/extra.js"]
    )
    l = spark.createDataFrame([(p,) for p in files1], "path string")
    r = spark.createDataFrame([(p,) for p in files2], "path string")
    scored = fuzzy_filename_scores(l, r)
    got = {
        (row.left_key, row.right_key): row.score
        for row in greedy_similarity_match(scored, threshold=0.75).collect()
    }

    # reference loop replay (left order = sorted, rights in sorted order)
    used = set()
    exp = {}
    for f1 in files1:
        b1 = f1.split("/")[-1]
        best, best_f2 = 0.0, None
        for f2 in files2:
            if f2 in used:
                continue
            s = difflib.SequenceMatcher(None, b1, f2.split("/")[-1]).ratio()
            if s > best:
                best, best_f2 = s, f2
        if best >= 0.75 and best_f2:
            used.add(best_f2)
            exp[(f1, best_f2)] = best
    assert got == exp


def test_exact_and_latest_dedup(spark):
    from web_template_forensics_spark.operators.dedup import (
        exact_dedup,
        latest_crawl_dedup,
    )

    pdf = pd.DataFrame(
        {
            "url": ["a", "a", "b", "c", "c", "c"],
            "warc_ts": pd.to_datetime(
                ["2025-01-01", "2025-01-03", "2025-01-02", "2025-01-01", "2025-01-05", "2025-01-04"]
            ),
            "text": ["x", "x2", "y", "z", "z5", "z4"],
        }
    )
    df = spark.createDataFrame(pdf)
    latest = latest_crawl_dedup(df).toPandas().set_index("url")
    assert latest.loc["a", "text"] == "x2"
    assert latest.loc["c", "text"] == "z5"

    dd = exact_dedup(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": ["t", "t", "u", "t"]})
        ),
        "doc_id",
        "text",
    ).toPandas()
    byhash = dd.set_index("content_hash")
    assert sorted(dd.dup_count.tolist()) == [1, 3]
    assert byhash.loc[dd[dd.dup_count == 3].content_hash.iloc[0], "canonical_id"] == 1


def test_minhash_lsh_finds_near_dups(spark):
    from web_template_forensics_spark.operators.dedup import minhash_lsh_pairs

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest tonight").split()
    docs = []
    for i in range(30):
        words = list(base)
        words[i % len(words)] = f"tok{i}"  # near-dup of base
        docs.append((i, " ".join(words)))
    docs.append((100, " ".join(f"z{i}" for i in range(20))))  # unrelated
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).toPandas()
    assert len(pairs) > 100  # near-dup cluster found
    assert 100 not in set(pairs.id_a) | set(pairs.id_b)
    assert (pairs.jaccard >= 0.5).all()


def test_simhash_hamming(spark):
    from web_template_forensics_spark.operators.dedup import simhash_near_dup_pairs

    # large token count -> a one-token edit flips only a few simhash bits
    a = " ".join(f"w{i}" for i in range(400))
    b = a.replace("w3 ", "q3 ")  # one-token diff
    c = " ".join(f"v{i}" for i in range(400))
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], "doc_id long, text string")
    pairs = simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=3).toPandas()
    assert {(1, 2)} == set(zip(pairs.id_a, pairs.id_b))


def test_cosine_topk_exact_and_lsh_recall(spark):
    from web_template_forensics_spark.operators.similarity_search import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    rng = np.random.RandomState(6)
    # clustered vectors (real-embedding shape): LSH recall is only
    # meaningful when neighbors are genuinely close in angle
    centers = rng.standard_normal((10, 16))
    vecs = (
        centers[np.arange(200) % 10] + 0.15 * rng.standard_normal((200, 16))
    ).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    probes = df.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(probes, df, k=5).toPandas()
    # numpy verification of top-1
    m64 = vecs.astype(np.float64)
    m = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
    sims = m[:20] @ m.T
    np.fill_diagonal(sims[:, :20], -2)
    for pid in range(20):
        best = int(np.argmax(sims[pid]))
        got = exact[(exact.probe_id == pid) & (exact["rank"] == 1)].neighbor_id.iloc[0]
        assert got == best
    approx = cosine_topk_lsh(probes, df, k=5, bits=8, probe_hamming=1).toPandas()
    hits = len(
        set(map(tuple, exact[["probe_id", "neighbor_id"]].values))
        & set(map(tuple, approx[["probe_id", "neighbor_id"]].values))
    )
    assert hits / len(exact) > 0.5  # recall sanity at hamming-1 probing


def test_structure_compare_udf_matches_oracle(spark):
    from web_template_forensics_spark.functions.similarity_udfs import (
        structure_compare_udf,
    )
    from web_template_forensics_spark.oracle.html_oracle import (
        parse_html_tree,
        tree_to_json,
    )
    from web_template_forensics_spark.oracle.similarity import compare_structures

    pairs = [
        ("<div><span>Hello</span></div>", "<div><span>Hello</span></div>"),
        ('<div class="a"><p>x</p></div>', '<div class="b"><p>y</p></div>'),
        ("<ul><li>1</li><li>2</li></ul>", "<ul><li>1</li></ul>"),
    ]
    rows = [(tree_to_json(parse_html_tree(a)), tree_to_json(parse_html_tree(b))) for a, b in pairs]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(structure_compare_udf("a", "b").alias("r")).select("r.*").toPandas()
    for i, (a, b) in enumerate(pairs):
        exp = compare_structures(parse_html_tree(a), parse_html_tree(b))
        assert got.score[i] == pytest.approx(exp.similarity_score, abs=0)
        assert got.matching[i] == exp.matching
        assert got.missing[i] == exp.missing


def test_contextual_match_replays_reference(spark):
    """contextual_match_scores + greedy == the reference loop
    (core/file_matcher.py:325-360) on sorted inputs."""
    from web_template_forensics_spark.operators.matching import (
        contextual_match_scores,
        greedy_similarity_match,
    )

    files1 = sorted(["app/pages/one.html", "app/pages/two.html", "lib/util/x.js"])
    files2 = sorted(["app/pages/uno.html", "app/pages/dos.html", "lib/util/y.js", "other/z.js"])
    prior = [("app/pages/one.html", "app/pages/uno.html")]

    l = spark.createDataFrame([(p,) for p in files1], "path string")
    r = spark.createDataFrame([(p,) for p in files2], "path string")
    mp = spark.createDataFrame(prior, "left_key string, right_key string")
    scored = contextual_match_scores(l, r, mp)
    got = {
        (row.left_key, row.right_key): round(row.score, 9)
        for row in greedy_similarity_match(scored, threshold=0.5).collect()
    }

    # pure-python replay of the reference loop
    used2 = {m for _, m in prior}
    exp = {}
    for f1 in files1:
        best, best_f2 = 0.0, None
        p1 = f1.split("/")
        for f2 in files2:
            if f2 in used2:
                continue
            p2 = f2.split("/")
            fs = 0
            for a, b in zip(p1[:-1], p2[:-1]):
                if a == b:
                    fs += 1
                else:
                    break
            fs = fs / max(len(p1), len(p2))
            f1p, f2p = "/".join(p1[:-1]), "/".join(p2[:-1])
            ns = sum(
                1 for o, m in prior if o.startswith(f1p) and m.startswith(f2p)
            ) / (len(prior) + 1)
            score = 0.7 * fs + 0.3 * ns
            if score > best:
                best, best_f2 = score, f2
        if best >= 0.5 and best_f2:
            used2.add(best_f2)
            exp[(f1, best_f2)] = round(best, 9)
    assert got == exp
    assert got, "expected at least one contextual match"


def test_aggregate_match_scores(spark):
    from web_template_forensics_spark.operators.matching import aggregate_match_scores

    matched = spark.createDataFrame(
        [("a", "a2", 0.9), ("b", "b2", 0.8)], "left_key string, right_key string, score double"
    )
    # 4 left + 3 right files, 2 matched -> denom = 4 + 3 - 2 = 5
    row = aggregate_match_scores(matched, 4, 3).first()
    assert row.files_matched == 2
    assert row.aggregate_score == round((0.9 + 0.8) / 5, 3)
    assert row.prediction.startswith("Low")


def test_simhash_banding_sound_at_large_radius(spark):
    """A pair at hamming 4..12 is invisible to the radius-3 banding but
    MUST be found when max_hamming=12 (13 bands, pigeonhole-sound)."""
    from web_template_forensics_spark.functions.text_udfs import simhash64
    from web_template_forensics_spark.operators.dedup import simhash_near_dup_pairs

    a = " ".join(f"w{i}" for i in range(400))
    b = None
    for k in range(2, 60):
        cand = " ".join(
            (f"q{i}" if i < k else f"w{i}") for i in range(400)
        )
        h = bin(simhash64(a) ^ simhash64(cand)).count("1")
        if 5 <= h <= 12:
            b = cand
            break
    assert b is not None, "could not construct a hamming-5..12 pair"
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    wide = simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=12).toPandas()
    assert set(zip(wide.id_a, wide.id_b)) == {(1, 2)}
    assert 5 <= wide.hamming.iloc[0] <= 12
    narrow = simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=3).toPandas()
    assert len(narrow) == 0
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(df, "doc_id", "text", max_hamming=12, n_bands=4)


def test_minhash_jvm_jaccard_matches_python_sets(spark):
    """The JVM array_intersect verification == Python shingle-set Jaccard."""
    from web_template_forensics_spark.functions.text_udfs import word_shingles
    from web_template_forensics_spark.operators.dedup import minhash_lsh_pairs

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.3).toPandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.itertuples()}
    texts = dict(docs)
    for (ia, ib), j in got.items():
        sa, sb = set(word_shingles(texts[ia])), set(word_shingles(texts[ib]))
        exp = 1.0 if not (sa | sb) else len(sa & sb) / len(sa | sb)
        assert j == pytest.approx(round(exp, 6), abs=0)
    assert (1, 3) in got and got[(1, 3)] == 1.0
    assert (1, 2) in got


def test_contextual_root_level_paths_match_reference(spark):
    """Root-level files (no '/') must use parent '' — the reference then
    counts EVERY prior matched pair as a sibling (file_matcher.py:346-351).
    Exercised unblocked at a low threshold where the sibling term decides."""
    from web_template_forensics_spark.operators.matching import (
        contextual_match_scores,
        greedy_similarity_match,
    )

    files1 = sorted(["index.html", "about.html", "app/x.html"])
    files2 = sorted(["home.html", "info.html", "app/y.html"])
    prior = [("app/x.html", "app/y.html"), ("app/z.html", "app/w.html")]

    l = spark.createDataFrame([(p,) for p in files1], "path string")
    r = spark.createDataFrame([(p,) for p in files2], "path string")
    mp = spark.createDataFrame(prior, "left_key string, right_key string")
    scored = contextual_match_scores(l, r, mp, blocked=False)
    got = {
        (row.left_key, row.right_key): round(row.score, 9)
        for row in greedy_similarity_match(scored, threshold=0.15).collect()
    }

    used2 = {m for _, m in prior}
    exp = {}
    for f1 in files1:
        best, best_f2 = 0.0, None
        p1 = f1.split("/")
        for f2 in files2:
            if f2 in used2:
                continue
            p2 = f2.split("/")
            fs = 0
            for a, b in zip(p1[:-1], p2[:-1]):
                if a == b:
                    fs += 1
                else:
                    break
            fs = fs / max(len(p1), len(p2))
            f1p, f2p = "/".join(p1[:-1]), "/".join(p2[:-1])
            ns = sum(
                1 for o, m in prior if o.startswith(f1p) and m.startswith(f2p)
            ) / (len(prior) + 1)
            score = 0.7 * fs + 0.3 * ns
            if score > best:
                best, best_f2 = score, f2
        if best >= 0.15 and best_f2:
            used2.add(best_f2)
            exp[(f1, best_f2)] = round(best, 9)
    assert got == exp
    # root files must have matched via the sibling term (parent '')
    assert any("/" not in a for a, _ in got), got


def test_text_udfs_ascii_whitespace_parity(spark):
    """UDF face == Column face == documented spec on non-ASCII whitespace
    (U+00A0 NBSP, U+2028 line separator must NOT split tokens)."""
    from web_template_forensics_spark.functions.text_udfs import (
        quality_score_col,
        quality_score_udf,
        token_count_col,
        token_count_udf,
    )

    rows = [
        ("plain ascii words here",),
        ("nbsp joined and joined tokens",),
        ("tabs\tand\nnewlines split",),
        ("",),
        (None,),  # null text: every face must yield 0, not NULL
    ]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        token_count_udf("text").alias("t_udf"),
        token_count_col(F.col("text")).alias("t_col"),
        quality_score_udf("text").alias("q_udf"),
        quality_score_col(F.col("text")).alias("q_col"),
    ).toPandas()
    assert out.t_col.notna().all() and out.q_col.notna().all(), out
    assert (out.t_udf == out.t_col).all(), out
    assert (out.q_udf == out.q_col).all(), out
    assert out.t_col.iloc[-1] == 0  # null row
    # NBSP/LS glue tokens: 'nbsp\\u00a0joined', 'and\\u2028joined', 'tokens'
    assert out.t_udf[1] == 3


def test_bpe_token_count_three_face_parity(spark):
    """Column (Java regex) == UDF (Python re) == SQL (DuckDB RE2) on the
    BPE-ish pre-tokenizer, including contraction/apostrophe/punct edges."""
    import duckdb

    from web_template_forensics_spark.functions.text_udfs import (
        bpe_token_count_col,
        bpe_token_count_sql,
        bpe_token_count_udf,
    )

    rows = [
        ("it's a test, don't panic!!",),   # 's / 't contractions, punct runs
        ("abc123def 45.6%",),              # letter/digit runs, mixed punct
        ("'hello' said O'Brien",),         # stray quotes + capital-B contraction miss
        ("tabs\tand\nnewlines",),
        ("",),
        ("...",),
        # Java-regex trap chars: \v in a Java class is the vertical-ws
        # CLASS — these pin that the pattern uses \x0B instead, so NEL /
        # LS / PS / VT count identically in all three engines
        ("a\x85b",),
        ("a b",),
        ("a b",),
        ("a\x0bb",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        "text",
        bpe_token_count_col(F.col("text")).alias("n_col"),
        bpe_token_count_udf("text").alias("n_udf"),
    ).toPandas()
    assert (out.n_col == out.n_udf).all(), out
    con = duckdb.connect()
    for _, r in out.iterrows():
        n_sql = con.execute(
            f"select {bpe_token_count_sql('?')}", [r.text]
        ).fetchone()[0]
        assert n_sql == r.n_col, (r.text, n_sql, r.n_col)
    # pinned spec examples: "it's a test, don't panic!!"
    # -> it 's a test , don 't panic !!  = 9
    assert out.n_col[0] == 9
    # "'hello' said O'Brien" -> ' hello ' said O 'Brien?? (capital B:
    # contraction fails, lone ' then Brien) -> ' hello ' said O ' Brien = 7
    assert out.n_col[2] == 7


def test_ngram_hot_gram_cap(spark):
    """DF-filtered Jaccard: a gram shared by every doc is excluded from
    candidates AND the measure when the cap is set; exact without it."""
    from web_template_forensics_spark.operators.dedup import ngram_jaccard_pairs

    # every doc shares the hot trigram "a b c"; docs 1/2 also share "x y z"
    docs = [
        (1, "a b c x y z", "en"),
        (2, "a b c x y z", "en"),
        (3, "a b c q r s", "en"),
        (4, "a b c t u v", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    exact = ngram_jaccard_pairs(df, "doc_id", "text", "lang", threshold=0.01).toPandas()
    exact_pairs = set(zip(exact.id_a, exact.id_b))
    assert (1, 2) in exact_pairs and (3, 4) in exact_pairs  # via the hot gram
    capped = ngram_jaccard_pairs(
        df, "doc_id", "text", "lang", threshold=0.01, max_gram_doc_freq=3
    ).toPandas()
    capped_pairs = set(zip(capped.id_a, capped.id_b))
    assert (3, 4) not in capped_pairs  # only-shared-hot-gram pair dropped
    assert (1, 2) in capped_pairs
    # DF-filtered measure: docs 1,2 share all surviving grams -> 1.0
    row = capped[(capped.id_a == 1) & (capped.id_b == 2)]
    assert row.jaccard.iloc[0] == 1.0


def test_cosine_topk_ivf_recall(spark):
    from web_template_forensics_spark.operators.similarity_search import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    rng = np.random.RandomState(6)
    centers = rng.standard_normal((10, 16))
    vecs = (
        centers[np.arange(200) % 10] + 0.15 * rng.standard_normal((200, 16))
    ).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [v.tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    probes = df.filter(F.col("vec_id") < 20)
    exact = cosine_topk_bruteforce(probes, df, k=5).toPandas()
    approx = cosine_topk_ivf(probes, df, k=5, n_lists=16, n_probe=4).toPandas()
    hits = len(
        set(map(tuple, exact[["probe_id", "neighbor_id"]].values))
        & set(map(tuple, approx[["probe_id", "neighbor_id"]].values))
    )
    assert hits / len(exact) > 0.7  # clustered data: 4/16 lists recall high
    # full-probe IVF degenerates to exact
    full = cosine_topk_ivf(probes, df, k=5, n_lists=8, n_probe=8).toPandas()
    assert set(map(tuple, full[["probe_id", "neighbor_id"]].values)) == set(
        map(tuple, exact[["probe_id", "neighbor_id"]].values)
    )


def test_cosine_topk_ivf_layout_invariant(spark):
    """r3 determinism fix: the k-means training sample is orderBy(id) +
    limit, so the IVF output no longer depends on the input's partition
    layout (bare ``limit`` picked whatever partitions arrived first)."""
    from web_template_forensics_spark.operators.similarity_search import (
        cosine_topk_ivf,
    )

    rng = np.random.RandomState(9)
    vecs = rng.standard_normal((120, 8)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(120), "embedding": [v.tolist() for v in vecs]})
    df1 = spark.createDataFrame(pdf).repartition(1)
    df2 = spark.createDataFrame(pdf).repartition(13, "vec_id")
    probes1 = df1.filter(F.col("vec_id") < 10)
    out1 = cosine_topk_ivf(probes1, df1, k=3, n_lists=6, n_probe=2, sample_rows=64)
    out2 = cosine_topk_ivf(
        df2.filter(F.col("vec_id") < 10), df2, k=3, n_lists=6, n_probe=2, sample_rows=64
    )
    rows1 = sorted(map(tuple, out1.toPandas().values.tolist()))
    rows2 = sorted(map(tuple, out2.toPandas().values.tolist()))
    assert rows1 == rows2


def test_minhash_empty_docs_never_pair(spark):
    """Zero-shingle (empty / whitespace-only) docs are excluded: their
    Jaccard is 0/0, not 1.0 — previously the constant sentinel signatures
    paired every empty doc with every other empty doc."""
    from web_template_forensics_spark.operators.dedup import minhash_lsh_pairs

    docs = [
        (1, ""),
        (2, "   \t  "),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5).toPandas()
    pairs = set(zip(out.id_a, out.id_b))
    assert pairs == {(3, 4)}, out


def test_knn_brute_only_r_max_zero(spark):
    """r_max=0 is the legal brute-force-only parameterization (previously
    AttributeError on the None accumulator)."""
    import pandas as pd

    from web_template_forensics_spark.operators.spatial_join import knn_join

    pdf = pd.DataFrame(
        {"id": range(20), "lat": [float(i) for i in range(20)], "lon": [2.0 * i for i in range(20)]}
    )
    df = spark.createDataFrame(pdf)
    probes = df.filter(F.col("id") % 5 == 0)
    out = knn_join(spark, probes, df, k=2, level=3, r_max=0).toPandas()
    assert len(out) == 4 * 2
    assert set(out.probe_id) == {0, 5, 10, 15}


def test_knn_all_points_one_cell(spark):
    """Adversarial density: every probe AND every corpus point lands in
    ONE level-3 cell (a 22.5-degree cell easily holds a 0.5-degree
    cluster). Round 1's disk-1 search sees ALL candidates at once; the
    coverage proof must still hold (kth_d2 < guarantee) and results must
    equal brute force exactly."""
    import pandas as pd

    from web_template_forensics_spark.operators.spatial_join import knn_join

    rng = np.random.RandomState(11)
    n = 60
    # 0.5-degree-wide cluster centered mid-cell (10.0, 10.0)
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "lat": 10.0 + rng.uniform(-0.25, 0.25, n),
            "lon": 10.0 + rng.uniform(-0.25, 0.25, n),
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        knn_join(spark, df, df, k=3, level=3)
        .toPandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    lats, lons = pdf.lat.to_numpy(), pdf.lon.to_numpy()
    rows = []
    for pid in range(n):
        d2 = (lats[pid] - lats) ** 2 + (lons[pid] - lons) ** 2
        order = sorted((float(d2[j]), j) for j in range(n) if j != pid)[:3]
        rows.extend((pid, j, r, dd) for r, (dd, j) in enumerate(order, 1))
    exp = pd.DataFrame(rows, columns=["probe_id", "neighbor_id", "rank", "dist2"])
    assert len(out) == len(exp)
    assert (out.neighbor_id.to_numpy() == exp.neighbor_id.to_numpy()).all()
    assert np.array_equal(out.dist2.to_numpy(), exp.dist2.to_numpy())


def test_knn_probes_in_empty_space_r_max_one(spark):
    """Adversarial sparsity: probes sit in a region with ZERO corpus
    points within the r_max=1 search disk, so every probe must fall
    through to the bounded brute-force pass — and still return the
    exact k nearest from the far-away corpus."""
    import pandas as pd

    from web_template_forensics_spark.operators.spatial_join import knn_join

    corpus_pdf = pd.DataFrame(
        {
            "id": range(30),
            "lat": [60.0 + 0.1 * i for i in range(30)],
            "lon": [120.0 + 0.1 * i for i in range(30)],
        }
    )
    probe_pdf = pd.DataFrame(
        {"id": [1000, 1001, 1002], "lat": [-60.0, -61.0, -62.0], "lon": [-120.0] * 3}
    )
    corpus = spark.createDataFrame(corpus_pdf)
    probes = spark.createDataFrame(probe_pdf)
    out = (
        knn_join(spark, probes, corpus, k=2, level=4, r_max=1)
        .toPandas()
        .sort_values(["probe_id", "rank"])
        .reset_index(drop=True)
    )
    # every probe's 2 nearest are corpus ids 0 then 1 (corpus marches
    # away northeast; probes are all far southwest)
    assert len(out) == 6
    assert set(out.probe_id) == {1000, 1001, 1002}
    for pid in (1000, 1001, 1002):
        got = out[out.probe_id == pid].neighbor_id.tolist()
        assert got == [0, 1], got


def test_ngram_whitespace_and_simhash_exact_band(spark):
    """Leading/trailing whitespace must not corrupt grams (identical
    token content scores 1.0), whitespace-only docs never pair, and
    max_hamming=0 (one full-64-bit band) is legal."""
    from web_template_forensics_spark.operators.dedup import (
        ngram_jaccard_pairs,
        simhash_near_dup_pairs,
    )

    docs = [
        (1, "alpha bravo charlie delta", "en"),
        (2, "  alpha bravo charlie delta  ", "en"),
        (3, "   ", "en"),
        (4, " \t ", "en"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, lang string")
    out = ngram_jaccard_pairs(df, "doc_id", "text", "lang", threshold=0.01).toPandas()
    got = {(r.id_a, r.id_b): r.jaccard for r in out.itertuples()}
    assert got == {(1, 2): 1.0}, got  # padded twin identical; ws-only never pair

    sdf = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id long, text string"
    )
    exact = simhash_near_dup_pairs(sdf, "doc_id", "text", max_hamming=0).toPandas()
    assert set(zip(exact.id_a, exact.id_b)) == {(1, 2)}
    assert (exact.hamming == 0).all()
