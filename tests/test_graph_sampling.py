"""Semantic tests for connected components / dup clustering, TF-IDF,
pattern scrubbing, and deterministic hash sampling."""

import random

import pytest

from pyspark.sql import functions as F

from deepcell_data_engineering_spark.functions.graph import (
    connected_components,
    dup_clusters,
)
from deepcell_data_engineering_spark.functions.sampling import (
    hash_sample,
    stratified_hash_sample,
    threshold,
)
from deepcell_data_engineering_spark.functions.text import scrub, tfidf_topk


def _union_find_components(edges):
    """Driver-side reference: min-label union-find."""
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
    return {x: find(x) for x in parent}


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3, pair 10-11, triangle 20-21-22 (+ redundant edge)
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)]
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "id_a long, id_b long")
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_random_vs_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find_components(edges)
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            spark.createDataFrame(edges, "id_a long, id_b long")
        ).collect()
    }
    assert got == expected


def test_dup_clusters_singletons_and_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dup_clusters(docs, pairs).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0,
    }
    assert [d for d, r in rows.items() if r["is_canonical"]] == [0, 1, 2, 4]


def test_tfidf_ranks_rare_terms_above_common(spark):
    docs = spark.createDataFrame(
        [
            (0, "common common rare0"),
            (1, "common common rare1"),
            (2, "common common rare2"),
        ],
        "doc_id long, text string",
    )
    top1 = {
        r["doc_id"]: r["term"]
        for r in tfidf_topk(docs, k=1).collect()
    }
    # 'common' has tf=2 but df=3 -> score 2*4/4=2; rareN tf=1 df=1 -> 1*4/2=2.
    # Tie broken by term asc => 'common' wins; bump rare tf to break the tie.
    docs2 = spark.createDataFrame(
        [(0, "common rare0 rare0"), (1, "common rare1 rare1")],
        "doc_id long, text string",
    )
    top1 = {r["doc_id"]: r["term"] for r in tfidf_topk(docs2, k=1).collect()}
    assert top1 == {0: "rare0", 1: "rare1"}


def test_scrub_counts_and_redacts(spark):
    docs = spark.createDataFrame(
        [(0, "call customer about value"), (1, "nothing here")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in scrub(docs, r"\b(customer|value)\b").collect()
    }
    assert rows[0]["n_redacted"] == 2
    assert rows[1]["n_redacted"] == 0
    import hashlib

    assert rows[0]["redacted_fp"] == hashlib.md5(
        b"call <REDACTED> about <REDACTED>"
    ).hexdigest()


def test_hash_sample_deterministic_and_stable_under_growth(spark):
    docs = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    s1 = {r["doc_id"] for r in hash_sample(docs, 0.25).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, 0.25).collect()}
    assert s1 == s2  # pure function of the data
    assert 0.18 < len(s1) / 1000 < 0.32
    # a doc's fate is independent of the rest of the corpus
    half = docs.where(F.col("doc_id") < 500)
    s_half = {r["doc_id"] for r in hash_sample(half, 0.25).collect()}
    assert s_half == {d for d in s1 if d < 500}
    # nested fractions: the 10% sample is a subset of the 25% sample
    s_small = {r["doc_id"] for r in hash_sample(docs, 0.10).collect()}
    assert s_small <= s1


def test_stratified_fractions_respected(spark):
    rows = [(i, "en" if i % 2 else "de") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_hash_sample(docs, {"en": 0.5, "de": 0.1}).collect()
    by_lang = {"en": 0, "de": 0}
    for r in out:
        by_lang[r["lang"]] += 1
    assert 0.40 < by_lang["en"] / 1000 < 0.60
    assert 0.05 < by_lang["de"] / 1000 < 0.16
    # strata not named are dropped entirely
    out2 = stratified_hash_sample(docs, {"en": 0.5}).collect()
    assert {r["lang"] for r in out2} == {"en"}


def test_threshold_is_integer_exact():
    assert threshold(1.0) == 1 << 28
    assert threshold(0.0) == 0
    assert threshold(0.5) == 1 << 27


def test_moment_stats_match_numpy(spark):
    import numpy as np

    from deepcell_data_engineering_spark.functions.stats import moment_stats

    rng = np.random.default_rng(3)
    xs = rng.integers(1, 50, 500)
    ys = xs * 2 + rng.integers(0, 20, 500)  # correlated
    grp = rng.integers(0, 3, 500)
    df = spark.createDataFrame(
        [(int(g), int(x), int(y)) for g, x, y in zip(grp, xs, ys)],
        "g int, x long, y long",
    )
    got = {
        r["g"]: r
        for r in moment_stats(df, F.col("x"), F.col("y"), ["g"]).collect()
    }
    for g in range(3):
        m = grp == g
        assert got[g]["n"] == int(m.sum())
        assert abs(got[g]["stddev_x"] - float(np.std(xs[m], ddof=1))) < 1e-6
        assert (
            abs(got[g]["corr_x_y"] - float(np.corrcoef(xs[m], ys[m])[0, 1]))
            < 1e-6
        )


def test_moment_stats_partition_invariant(spark):
    """The whole point: identical values regardless of partitioning."""
    from deepcell_data_engineering_spark.functions.stats import moment_stats

    rows = [(i % 2, i % 47 + 1, (i * 7) % 31) for i in range(2000)]
    df1 = spark.createDataFrame(rows, "g int, x long, y long").repartition(1)
    df64 = spark.createDataFrame(rows, "g int, x long, y long").repartition(64)
    r1 = sorted(
        map(tuple, moment_stats(df1, F.col("x"), F.col("y"), ["g"]).collect())
    )
    r64 = sorted(
        map(tuple, moment_stats(df64, F.col("x"), F.col("y"), ["g"]).collect())
    )
    assert r1 == r64


def test_bm25_matches_reference(spark):
    import math

    from deepcell_data_engineering_spark.functions.text import bm25_scores

    corpus = {
        0: "spark window merge spark",
        1: "window table scan filter",
        2: "nothing relevant here at all",
        3: "spark spark spark spark spark",
    }
    docs = spark.createDataFrame(
        list(corpus.items()), "doc_id long, text string"
    )
    terms = ["spark", "window"]
    toks = {d: t.split() for d, t in corpus.items()}
    N = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / N
    dfreq = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}

    def ref_score(d):
        s = 0.0
        for t in terms:
            tf = toks[d].count(t)
            idf = math.log(1.0 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * (len(toks[d]) / avgdl))
            )
        return s

    got = {r["doc_id"]: r["bm25"] for r in bm25_scores(docs, terms).collect()}
    for d in corpus:
        assert abs(got[d] - ref_score(d)) < 1e-6
    assert got[3] > got[1] > got[2] == 0.0


def test_snapshot_diff_classifies(spark):
    from deepcell_data_engineering_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, None, None), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # 1 unchanged (absent), 2 changed, 3 changed (c -> NULL, not a
    # concat_ws collision), 4 removed, 5 added
    assert got == {2: "changed", 3: "changed", 4: "removed", 5: "added"}


def test_connected_components_clique_converges_fast(spark):
    """A dense near-clique (the shape mass-duplicated boilerplate
    produces) must converge in a handful of star rounds, not O(n)."""
    n = 120
    edges = [(i, j) for i in range(n) for j in range(i + 1, n) if (i + j) % 3]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = connected_components(df, max_iter=6).collect()
    assert len(got) == n
    assert {r["component"] for r in got} == {0}


def test_cluster_neardup_subset_of_brute_force(spark):
    from deepcell_data_engineering_spark.functions.dedup import (
        embedding_neardup_pairs,
    )
    from deepcell_data_engineering_spark.functions.similarity import (
        cluster_neardup_pairs,
    )
    from deepcell_data_engineering_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    brute = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    # list count sized to the corpus (~N/64 lists): recall depends on
    # list granularity, so a 500-vector corpus gets 8 lists, not the
    # default 32 a larger corpus would want
    clustered = {
        (r["id_a"], r["id_b"])
        for r in cluster_neardup_pairs(
            emb, threshold=0.4, n_centroids=8
        ).collect()
    }
    assert clustered <= brute  # no false positives vs exact cosine
    if brute:
        assert len(clustered) / len(brute) >= 0.5  # multi-probe recall


def test_span_udtf_chunks_documents(spark):
    from pyspark.sql.functions import lit

    from deepcell_data_engineering_spark.functions.udafs import make_span_udtf

    SpanUDTF = make_span_udtf()
    spark.udtf.register("doc_spans", SpanUDTF)
    rows = SpanUDTF(lit("a b c d e f g"), lit(3)).collect()
    assert [(r["span_idx"], r["n_tokens"]) for r in rows] == [
        (0, 3), (1, 3), (2, 1),
    ]
    assert rows[2]["span_text"] == "g"
    # LATERAL join form over a table
    spark.createDataFrame(
        [(0, "w x y z"), (1, None)], "doc_id long, text string"
    ).createOrReplaceTempView("_udtf_docs")
    out = spark.sql(
        """SELECT doc_id, s.span_idx, s.n_tokens
           FROM _udtf_docs, LATERAL doc_spans(text, 2) s
           ORDER BY doc_id, span_idx"""
    ).collect()
    assert [(r["doc_id"], r["span_idx"], r["n_tokens"]) for r in out] == [
        (0, 0, 2), (0, 1, 2),
    ]


def test_cluster_neardup_numpy_scorer_agrees(spark):
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.functions.similarity import (
        cluster_neardup_pairs,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    jvm = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cluster_neardup_pairs(emb, n_centroids=8).collect()
    }
    np_ = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cluster_neardup_pairs(
            emb, n_centroids=8, scorer="numpy"
        ).collect()
    }
    assert set(jvm) == set(np_)
    assert all(abs(jvm[k] - np_[k]) < 1e-9 for k in jvm)


def test_apply_changes_roundtrip_with_delete(spark):
    """diff -> apply must reproduce the new snapshot exactly, including
    deletes (absent from d48's grow-only fixture)."""
    from deepcell_data_engineering_spark.operators.diff import (
        apply_changes,
        snapshot_diff_with_payload,
    )

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "k long, s string, v double"
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)], "k long, s string, v double"
    )
    feed = snapshot_diff_with_payload(old, new, ["k"])
    got = sorted(map(tuple, apply_changes(old, feed, ["k"]).collect()))
    assert got == sorted(map(tuple, new.collect()))


def test_pagerank_matches_numpy_power_iteration(spark):
    """pagerank vs a dense numpy power iteration on a crafted graph:
    star (hub should dominate) + a separate triangle."""
    import numpy as np

    from deepcell_data_engineering_spark.functions.graph import pagerank

    edges = [(0, i) for i in range(1, 6)] + [(10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    got = {r["node"]: (r["rank"], r["d"]) for r in pagerank(df, iters=3).collect()}

    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    deg = {u: sum(1 for (x, _) in und if x == u) for u in nodes}
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        nxt = np.full(n, 0.15 / n)
        for (u, v) in und:
            nxt[idx[v]] += 0.85 * r[idx[u]] / deg[u]
        r = nxt
    for u in nodes:
        assert abs(got[u][0] - round(float(r[idx[u]]), 6)) <= 1e-6, u
        assert got[u][1] == deg[u]
    # the star hub out-ranks its leaves; triangle nodes are symmetric
    assert got[0][0] > got[1][0]
    assert got[10][0] == got[11][0] == got[12][0]


def test_pagerank_empty_graph_schema_matches_nonempty(spark):
    """The empty-graph early return must expose the same (node, rank, d)
    schema as the iterated path — downstream unions depend on it."""
    from deepcell_data_engineering_spark.functions.graph import pagerank

    empty = spark.createDataFrame([], "id_a LONG, id_b LONG")
    out = pagerank(empty, iters=3)
    assert out.columns == ["node", "rank", "d"]
    assert out.count() == 0


def test_weighted_sample_biases_toward_heavy_rows(spark):
    from deepcell_data_engineering_spark.functions.sampling import weighted_sample

    # two weight classes: 20 heavy (w=100) vs 180 light (w=1) rows.
    # P(heavy row in top-k) >> P(light); with k=20 the sample should be
    # dominated by heavy rows (each heavy is 100x likelier per draw).
    rows = [(i, "h", 100) for i in range(20)] + [
        (i, "l", 1) for i in range(20, 200)
    ]
    df = spark.createDataFrame(rows, "id long, cls string, w long")
    got = weighted_sample(df, F.col("id"), "w", 20, seed="bias")
    heavy = got.where(F.col("cls") == "h").count()
    assert heavy >= 12  # expectation ~18; md5 draw is fixed, so stable


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    from deepcell_data_engineering_spark.functions.sampling import weighted_sample

    df = spark.range(0, 500).select(
        F.col("id"),
        (F.pmod(F.col("id"), 7)).alias("g"),
        (F.pmod(F.col("id"), 13) + 1).alias("w"),
    )
    a = weighted_sample(df.repartition(1), F.col("id"), "w", 3, ["g"])
    b = weighted_sample(df.repartition(16), F.col("id"), "w", 3, ["g"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # exactly k per stratum
    per = a.groupBy("g").count().collect()
    assert all(r["count"] == 3 for r in per)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from deepcell_data_engineering_spark.functions.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -2), (4, 1)], "id long, w long"
    )
    got = weighted_sample(df, F.col("id"), "w", 10)
    ids = {r["id"] for r in got.collect()}
    assert ids == {1, 4}


def test_quality_gate_counts_and_null_predicates_fail_loudly(spark):
    from deepcell_data_engineering_spark.functions.validate import (
        check_constraints,
        check_reference,
        unique,
        violations,
    )

    df = spark.createDataFrame(
        [(1, "ok"), (1, "dup-id"), (2, None), (None, "null-id")],
        "id long, txt string",
    )
    rep = check_constraints(
        df,
        {
            "id_not_null": violations(F.col("id").isNull()),
            "id_unique": unique("id"),
            # NULL txt makes the predicate NULL -> must count as violation
            "txt_short": violations(F.length("txt") > 3),
        },
    )
    got = {r["check_name"]: (r["violations"], r["status"]) for r in rep.collect()}
    assert got["id_not_null"] == (1, "fail")
    # count(*) - count(distinct id): the duplicate id=1 AND the NULL id
    # (a NULL key is never unique) each count
    assert got["id_unique"] == (2, "fail")
    assert got["txt_short"] == (3, "fail")  # 'dup-id', 'null-id', and the NULL

    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    child = spark.createDataFrame([(1,), (3,), (None,)], "fk long")
    ref = check_reference(child, parent, "fk", "pk").collect()[0]
    assert (ref["violations"], ref["status"]) == (2, "fail")  # 3 and NULL

    ok = check_reference(parent, parent, "pk", "pk").collect()[0]
    assert (ok["violations"], ok["status"]) == (0, "pass")

    with pytest.raises(ValueError, match="empty"):
        check_constraints(df, {})


def test_triangle_counts_known_graph(spark):
    from deepcell_data_engineering_spark.functions.graph import triangle_counts

    # K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) plus a pendant
    # edge 4-5 and a disconnected edge 6-7; edges deliberately given in
    # mixed orientation and with a duplicate.
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (4, 2), (3, 4),
        (4, 5), (7, 6), (2, 1),
    ]
    df = spark.createDataFrame(edges, "u long, v long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_deterministic_split_stable_and_cluster_safe(spark):
    from deepcell_data_engineering_spark.functions.sampling import (
        deterministic_split,
    )

    rows = [(i, i // 3) for i in range(3000)]  # clusters of 3
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    s1 = deterministic_split(df, "doc_id")
    # pure function of the key: same assignment on rerun and under
    # repartitioning, and a row keeps its fate when the corpus grows
    a1 = {r["doc_id"]: r["split"] for r in s1.collect()}
    a2 = {
        r["doc_id"]: r["split"]
        for r in deterministic_split(df.repartition(7), "doc_id").collect()
    }
    assert a1 == a2
    grown = deterministic_split(
        spark.createDataFrame(
            [(i, i // 3) for i in range(6000)], "doc_id long, cluster_id long"
        ),
        "doc_id",
    )
    ga = {r["doc_id"]: r["split"] for r in grown.collect()}
    assert all(ga[d] == s for d, s in a1.items())
    # ~1/10 val rate
    nval = sum(1 for s in a1.values() if s == "val")
    assert 200 < nval < 400
    # keyed by cluster_id, every cluster is split-homogeneous
    bycluster = deterministic_split(df, "cluster_id").collect()
    seen: dict[int, str] = {}
    for r in bycluster:
        assert seen.setdefault(r["cluster_id"], r["split"]) == r["split"]
