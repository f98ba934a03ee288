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
