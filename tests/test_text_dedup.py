"""Semantic tests for text analysis, dedup, and similarity operators —
synthetic fixtures where the testdata lacks the phenomenon (near-dups)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from deepcell_data_engineering_spark.functions.dedup import (
    dedup_exact,
    embedding_neardup_pairs,
    exact_dup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    winnow_fingerprints,
)
from deepcell_data_engineering_spark.functions.similarity import (
    cosine_topk,
    lsh_topk,
)
from deepcell_data_engineering_spark.functions.text import (
    predict_lang,
    quality_features,
    token_count,
)


@pytest.fixture()
def docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away into the woods"
    )
    rows = [
        (0, base, "en"),
        (1, base, "en"),  # exact duplicate of 0
        (2, base.replace("quick", "swift"), "en"),  # near-duplicate of 0
        (3, "der hund und die katze spielen in der garten und haus", "de"),
        (4, "el perro y los gatos juegan en una casa grande", "es"),
        (5, "completely different content about spark query engines", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")


def test_token_count_and_quality(spark, docs):
    out = {r["doc_id"]: r for r in quality_features(docs).collect()}
    assert out[0]["q_n_tokens"] == len(out[0]["text"].split())
    assert out[0]["q_n_punct"] == 0
    assert 0.7 < out[0]["q_alpha_ratio"] < 0.9


def test_lang_id_heuristic(spark, docs):
    out = {r["doc_id"]: r["pred"] for r in
           docs.select("doc_id", predict_lang(F.col("text")).alias("pred")).collect()}
    assert out[0] == "en" and out[3] == "de" and out[4] == "es"


def test_exact_dedup(spark, docs):
    groups = exact_dup_groups(docs)
    dup = [r for r in groups.collect() if r["n_copies"] > 1]
    assert len(dup) == 1 and dup[0]["keep_id"] == 0 and dup[0]["n_copies"] == 2
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [0, 2, 3, 4, 5]


def test_minhash_lsh_finds_near_dup(spark, docs):
    sigs = minhash_signatures(docs, num_hashes=8, k=5)
    # exact dups must collide on every band
    pairs = lsh_candidate_pairs(sigs, bands=[[f"h{i}"] for i in range(8)])
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 2) in got  # near-dup caught by at least one single-hash band
    assert (0, 5) not in got  # unrelated doc shares no minimum


def test_ngram_jaccard_scores(spark, docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
           ngram_jaccard_pairs(docs, k=5).collect()}
    assert out[(0, 1)] == 1.0
    assert 0.5 < out[(0, 2)] < 1.0
    assert out.get((0, 5), 0.0) < 0.2


def test_nonportable_hash_path_same_semantics(spark, docs):
    # portable=False swaps md5 for JVM xxhash64 (the production path);
    # hash VALUES differ but the dedup semantics must be unchanged
    sigs = minhash_signatures(docs, num_hashes=8, k=5, portable=False)
    pairs = lsh_candidate_pairs(
        sigs, bands=[[f"h{i}"] for i in range(8)], portable=False
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got and (0, 5) not in got

    sh = {r["doc_id"]: int(r["simhash"]) for r in
          simhash(docs, bits=16, portable=False).collect()}
    assert sh[0] == sh[1]
    assert bin(sh[0] ^ sh[2]).count("1") < bin(sh[0] ^ sh[5]).count("1")

    fp = {}
    for r in winnow_fingerprints(docs, portable=False).collect():
        fp.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fp[0] == fp[1] and (fp[0] & fp[2])


def test_winnow_guarantee_and_density(spark, docs):
    k, w = 5, 4
    fps = winnow_fingerprints(docs, k=k, w=w)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # identical docs -> identical fingerprint sets
    assert by_doc[0] == by_doc[1]
    # near-dup shares a long substring (>= w+k-1 chars) -> must share a fp
    assert by_doc[0] & by_doc[2]
    # density: winnowing selects ~2/(w+1) of k-gram positions, never more
    # than the number of full windows
    base_len = docs.where(F.col("doc_id") == 0).select(F.length("text")).head()[0]
    assert len(by_doc[0]) <= base_len - (k - 1) - (w - 1)
    assert len(by_doc[0]) < (base_len - k + 1) / 2
    # unrelated doc: tiny overlap at most (hash collisions on short grams)
    assert len(by_doc[0] & by_doc[5]) <= 1


def test_simhash_near_dup_close_hamming(spark, docs):
    out = {r["doc_id"]: int(r["simhash"]) for r in simhash(docs, bits=16).collect()}
    assert out[0] == out[1]  # identical docs -> identical simhash
    ham_near = bin(out[0] ^ out[2]).count("1")
    ham_far = bin(out[0] ^ out[5]).count("1")
    assert ham_near < ham_far


@pytest.fixture()
def vectors(spark):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(50):
        v = rng.standard_normal(16)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    # vector 50 = near-copy of vector 0
    v0 = np.array(rows[0][1]) + 0.01 * rng.standard_normal(16)
    rows.append((50, [float(x) for x in v0 / np.linalg.norm(v0)]))
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")


def test_cosine_topk_exact(spark, vectors):
    out = cosine_topk(vectors, vectors.where("vec_id = 0"), k=3).collect()
    assert [r["query_id"] for r in out] == [0, 0, 0]
    assert out[0]["neighbor_id"] == 50 and out[0]["cosine"] > 0.99
    # numpy cross-check of the full ranking
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in vectors.collect()}
    sims = sorted(
        ((float(vecs[0] @ v / (np.linalg.norm(vecs[0]) * np.linalg.norm(v))), i)
         for i, v in vecs.items() if i != 0),
        reverse=True,
    )
    assert [i for _, i in sims[:3]] == [r["neighbor_id"] for r in out]


def test_lsh_topk_finds_near_copy(spark, vectors):
    out = lsh_topk(vectors, vectors.where("vec_id = 0"), dim=16, k=3, n_planes=4).collect()
    assert out and out[0]["neighbor_id"] == 50  # same bucket with high prob at 4 planes


def test_embedding_neardup(spark, vectors):
    pairs = embedding_neardup_pairs(vectors, threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 50)}


def test_kmeans_recovers_separated_clusters(spark):
    from deepcell_data_engineering_spark.functions.similarity import kmeans_fit

    rng = np.random.default_rng(7)
    anchors = np.eye(3)  # three orthogonal cluster directions
    rows = []
    for i in range(30):
        a = anchors[i % 3]
        v = a + 0.05 * rng.standard_normal(3)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    out = kmeans_fit(df, n_clusters=3, max_iter=10).collect()
    assert sorted(r["n_assigned"] for r in out) == [10, 10, 10]
    # each centroid should align tightly with one distinct anchor
    matched = set()
    for r in out:
        c = np.array(r["embedding"])
        best = int(np.argmax([c @ a / np.linalg.norm(c) for a in anchors]))
        assert c @ anchors[best] / np.linalg.norm(c) > 0.98
        matched.add(best)
    assert matched == {0, 1, 2}


def test_kmeans_join_fallback_matches_inline(spark, monkeypatch):
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.functions import similarity as sim

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    inline = sim.kmeans_fit(emb, n_clusters=4, max_iter=2).collect()
    monkeypatch.setattr(sim, "_INLINE_LIMIT", 0)
    joined = sim.kmeans_fit(emb, n_clusters=4, max_iter=2).collect()

    def canon(rows):
        return {
            r["centroid_id"]: (r["n_assigned"], tuple(round(x, 9) for x in r["embedding"]))
            for r in rows
        }

    assert canon(inline) == canon(joined)


def test_kmeans_matches_numpy_lloyd_reference(spark):
    """Independent driver-side Lloyd in plain numpy, mirroring kmeans_fit
    semantics (lowest-id init, cosine argmax with first-max ties,
    per-dimension mean update, empty clusters keep their centroid,
    counts from the last pass). Centroids compared to 9 decimals, counts
    exactly — a hard expected-value check alongside the unrolled-SQL
    oracle of x19."""
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.functions.similarity import kmeans_fit

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    k, iters = 5, 3
    out = kmeans_fit(emb, n_clusters=k, max_iter=iters, tol=0.0).collect()

    rows = sorted(
        (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        for r in emb.select("vec_id", "embedding").collect()
    )
    X = np.stack([v for _, v in rows])
    cents = X[:k].copy()
    counts = np.zeros(k, dtype=int)
    for _ in range(iters):
        norms = np.sqrt((cents**2).sum(axis=1))
        norms[norms == 0] = 1.0
        scores = X @ (cents / norms[:, None]).T
        assign = scores.argmax(axis=1)  # argmax takes the first max: ties -> smaller id
        counts = np.bincount(assign, minlength=k)
        for c in range(k):
            if counts[c]:
                cents[c] = X[assign == c].mean(axis=0)

    got = {r["centroid_id"]: (r["n_assigned"], np.array(r["embedding"])) for r in out}
    assert sorted(got) == list(range(k))
    for c in range(k):
        n, vec = got[c]
        assert n == counts[c]
        np.testing.assert_allclose(vec, cents[c], rtol=0, atol=1e-9)


def test_ivf_topk_recall_vs_exact(spark):
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.functions import similarity as sim

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = sim.cosine_topk(emb, queries, k=5)
    approx = sim.ivf_topk(emb, queries, n_centroids=8, nprobe=4, k=5)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # probing half the lists must recover a solid fraction of true top-5
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5
    # every approx neighbor carries the true cosine (exact rescoring)
    sc = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact.collect()}
    for r in approx.collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in sc:
            assert abs(r["cosine"] - sc[key]) < 1e-9


def test_lsh_band_skew_cap_bounds_pairs(spark):
    """One band holding half the corpus must not explode into quadratic
    pairs when the cap is set: its docs are diverted to a known-duplicate
    cluster output, and surviving pairs come only from under-cap bands."""
    from deepcell_data_engineering_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    # 20 near-identical docs (one hot band) + 10 distinct docs
    rows = [(i, "common boilerplate text repeated verbatim in every doc") for i in range(20)]
    rows += [(100 + i, f"unique document number {i} " + " ".join(f"w{i}{j}" for j in range(12)))
             for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, num_hashes=8, k=5)

    uncapped = lsh_candidate_pairs(sigs, bands=[["h0", "h1"], ["h2", "h3"]])
    assert uncapped.count() >= 190  # 20*19/2 pairs from the hot band

    pairs, clusters = lsh_candidate_pairs(
        sigs, bands=[["h0", "h1"], ["h2", "h3"]], max_band_size=10
    )
    hot_docs = {r["doc_id"] for r in clusters.collect()}
    assert set(range(20)) <= hot_docs  # the boilerplate block is diverted
    surviving = pairs.collect()
    # no surviving pair may have BOTH endpoints inside the capped band
    hot_pairs = [r for r in surviving if r["id_a"] in hot_docs and r["id_b"] in hot_docs]
    assert len(hot_pairs) == 0
    assert len(surviving) <= 45  # bounded: only the 10 distinct docs can pair


def test_embedding_neardup_size_guard(spark, vectors):
    with pytest.raises(ValueError, match="max_rows"):
        embedding_neardup_pairs(vectors, threshold=0.95, max_rows=10)
    # explicit opt-out still works
    pairs = embedding_neardup_pairs(
        vectors, threshold=0.95, max_rows=None
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 50)}


def test_bucketed_neardup_recall_vs_brute(spark):
    """The registered x10 path (IVF-bucketed cluster_neardup_pairs) is
    verified against the size-guarded brute-force all-pairs form: every
    bucketed pair must also be a brute pair with the identical cosine,
    and recall on the testdata subset must be high (multi-probe nprobe=2
    catches list-straddling near-dups)."""
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.functions.similarity import (
        cluster_neardup_pairs,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").where(
        "vec_id < 300"
    )
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(emb, threshold=0.4).collect()
    }
    bucketed = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cluster_neardup_pairs(
            emb, threshold=0.4, n_centroids=8, nprobe=2
        ).collect()
    }
    assert set(bucketed) <= set(brute)  # no false positives, exact scores
    for k, v in bucketed.items():
        assert abs(brute[k] - v) < 1e-9
    assert brute  # fixture actually exercises the threshold
    recall = len(bucketed) / len(brute)
    assert recall >= 0.8, (len(bucketed), len(brute))


def test_repetition_signals_crafted(spark):
    from deepcell_data_engineering_spark.functions.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # all dup words, one bigram
            (2, "all fresh words here now"),     # no repetition
            (3, "one"),                          # single word: no bigrams
        ],
        "doc_id LONG, text STRING",
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert out[1]["dup_word_frac"] == 0.75 and out[1]["top_bigram_frac"] == 1.0
    assert out[2]["dup_word_frac"] == 0.0 and out[2]["top_bigram_frac"] == 0.25
    assert out[3]["dup_word_frac"] == 0.0 and out[3]["top_bigram_frac"] == 0.0


def test_chunk_documents_covers_every_char(spark):
    from deepcell_data_engineering_spark.functions.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "a" * 500), (2, "b" * 200), (3, "c" * 10), (4, "d" * 201)],
        "doc_id LONG, text STRING",
    )
    out = chunk_documents(df, chunk_size=200, stride=150).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: chunks at 0,150,300 -> 3 total, last len 200
    assert sorted(r["chunk_idx"] for r in by_doc[1]) == [0, 1, 2]
    # coverage: last chunk must reach the end: idx*stride + len >= n
    for doc, n in [(1, 500), (2, 200), (3, 10), (4, 201)]:
        last = max(by_doc[doc], key=lambda r: r["chunk_idx"])
        assert last["chunk_idx"] * 150 + last["chunk_len"] == n
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 1
    assert len(by_doc[4]) == 2  # one char past a full chunk -> one more


def test_pack_sequences_budget_property(spark):
    from deepcell_data_engineering_spark.functions.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "de", " ".join(["w"] * (10 + i % 7)))
         for i in range(100)],
        "doc_id LONG, lang STRING, text STRING",
    )
    out = pack_sequences(docs, budget=64).collect()
    # pack ids are dense per lang and docs stay in id order within packs
    by_lang = {}
    for r in sorted(out, key=lambda r: (r["lang"], r["doc_id"])):
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        packs = [r["pack_id"] for r in rows]
        assert packs == sorted(packs)  # monotone in doc order
        # each pack's preceding-offset start is < budget past pack boundary:
        # sum of tokens before a pack's first doc lies in [pack*64, pack*64+64)
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // 64
            cum += r["n_tokens"]


def test_decontaminate_flags_planted_leak(spark):
    from deepcell_data_engineering_spark.functions.dedup import decontaminate

    leak = "the quick brown fox jumps over the lazy dog"
    train = spark.createDataFrame(
        [
            (1, f"intro words then {leak} trailing content"),  # contains leak
            (2, "completely unrelated text with no overlap at all"),
            (3, leak),                                          # verbatim
        ],
        "doc_id LONG, text STRING",
    )
    heldout = spark.createDataFrame(
        [(100, f"eval question: {leak}?")], "doc_id LONG, text STRING"
    )
    out = {r["doc_id"]: r["contaminated"] for r in decontaminate(train, heldout).collect()}
    assert out[1] and out[3] and not out[2]
    assert set(out) == {1, 2, 3}


def test_star_edges_same_components(spark):
    """lsh_band_star_edges must yield the IDENTICAL duplicate clusters as
    the C(n,2) clique pairs — a band's star spans the same vertex set as
    its clique, so the closure cannot differ."""
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.functions import graph as gr
    from deepcell_data_engineering_spark.functions.dedup import (
        lsh_band_star_edges,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sigs = minhash_signatures(docs, num_hashes=6, k=5)
    bands = [["h0", "h1", "h2"], ["h3", "h4", "h5"]]
    pairs = lsh_candidate_pairs(sigs, bands=bands)
    edges = lsh_band_star_edges(sigs, bands=bands)
    assert edges.count() < pairs.count()  # the whole point
    via_pairs = {
        (r["doc_id"], r["cluster_id"])
        for r in gr.dup_clusters(docs, pairs).collect()
    }
    via_edges = {
        (r["doc_id"], r["cluster_id"])
        for r in gr.dup_clusters(docs, edges).collect()
    }
    assert via_edges == via_pairs


def test_incremental_lsh_equivalence(spark):
    """The incremental-index contract: candidates(old UNION new) equals
    candidates(old) UNION incremental(index(old), new) — so a daily
    batch probed against the persisted band index yields exactly the
    pairs a full recompute would add, without the old-vs-old self-join."""
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.functions.dedup import (
        incremental_lsh_candidates,
        lsh_band_index,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    old = docs.where(F.col("doc_id") % 4 != 0)
    new = docs.where(F.col("doc_id") % 4 == 0)
    bands = [["h0", "h1", "h2"], ["h3", "h4", "h5"]]
    sig = lambda d: minhash_signatures(d, num_hashes=6, k=5)

    full = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sig(docs), bands=bands).collect()
    }
    old_only = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sig(old), bands=bands).collect()
    }
    index = lsh_band_index(sig(old), bands=bands)
    incr = {
        (r["id_a"], r["id_b"])
        for r in incremental_lsh_candidates(index, sig(new), bands=bands).collect()
    }
    assert old_only | incr == full
    assert not (incr & old_only) or all(
        a % 4 == 0 or b % 4 == 0 for a, b in incr
    )
    # every incremental pair involves a new doc
    assert all(a % 4 == 0 or b % 4 == 0 for a, b in incr)


def test_minhash_rowwise_matches_aggregated(spark):
    """minhash_signatures_rowwise (stateless per-row array HOFs — the
    streaming-safe form) produces bit-identical signatures to the
    exploded + aggregated form."""
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.functions.dedup import (
        minhash_signatures,
        minhash_signatures_rowwise,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    agg = minhash_signatures(docs, num_hashes=6, k=5).orderBy("doc_id").collect()
    row = minhash_signatures_rowwise(docs, num_hashes=6, k=5).orderBy("doc_id").collect()
    assert [tuple(r) for r in agg] == [tuple(r) for r in row]
    # short-document edge: len(text) < k still yields a signature
    from pyspark.sql import Row

    tiny = spark.createDataFrame([Row(doc_id=1, text="ab")])
    a = minhash_signatures(tiny, num_hashes=2, k=5).collect()
    b = minhash_signatures_rowwise(tiny, num_hashes=2, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_prefix_similarity_join_equals_brute_force(spark):
    """Prefix filtering must lose NOTHING: compare against the all-pairs
    brute force on a corpus with planted near-duplicates."""
    from deepcell_data_engineering_spark.functions.dedup import (
        similarity_join_prefix,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = []
    for i in range(30):
        words = base.split()
        words[i % len(words)] = f"w{i}"  # near-dups of the base sentence
        rows.append((i, " ".join(words)))
    rows += [(100 + i, f"totally different text number {i} about topic{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in similarity_join_prefix(df, threshold=0.5).collect()
    }

    # brute force in python
    import itertools

    toks = {r[0]: set(r[1].lower().split()) for r in rows}
    expect = {}
    for a, b in itertools.combinations(sorted(toks), 2):
        inter = len(toks[a] & toks[b])
        jac = inter / (len(toks[a]) + len(toks[b]) - inter)
        if jac >= 0.5:
            expect[(a, b)] = round(jac, 4)
    assert set(got) == set(expect)
    for k in expect:
        assert abs(got[k] - expect[k]) < 1e-9


def test_prefix_similarity_join_partition_invariant(spark):
    from deepcell_data_engineering_spark.functions.dedup import (
        similarity_join_prefix,
    )

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta {'x' if i % 2 else 'y'}{i % 5}") for i in range(40)],
        "doc_id long, text string",
    )
    a = similarity_join_prefix(df.repartition(1), 0.6)
    b = similarity_join_prefix(df.repartition(8), 0.6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_bpe_train_matches_python_reference(spark):
    from deepcell_data_engineering_spark.functions.text import bpe_train

    # aaaa / hahahaha / aaaaa exercise back-to-back occurrences of the
    # winning pair — the case where a single-space replace convention
    # silently deviates from canonical greedy BPE (round-5 verdict)
    corpus = [
        (1, "low lower lowest low low"),
        (2, "new newer newest new lower"),
        (3, "wide wider widest low new"),
        (4, "aaaa hahahaha aaaaa banana papa"),
        (5, "aaaa aaaa hahahaha lowlow"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")

    # pure-python reference: same greedy BPE on the word-frequency table
    from collections import Counter

    words = Counter(w for _, t in corpus for w in t.lower().split())
    seqs = {w: list(w) for w in words}
    expect = []
    for r in range(1, 7):
        pc = Counter()
        for w, toks_ in seqs.items():
            for x, y in zip(toks_, toks_[1:]):
                pc[(x, y)] += words[w]
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((r, a, b, a + b, c))
        for w, toks_ in seqs.items():
            out, i = [], 0
            while i < len(toks_):
                if i + 1 < len(toks_) and toks_[i] == a and toks_[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks_[i])
                    i += 1
            seqs[w] = out
    got = [tuple(r) for r in bpe_train(df, rounds=6).orderBy("round").collect()]
    assert got == expect
    # learned rules are real merges: every merged token is lhs+rhs
    assert all(m == a + b for _, a, b, m, _ in got)


def test_fuzzy_name_pairs_match_brute_force_within_blocks(spark):
    from deepcell_data_engineering_spark.functions.dedup import fuzzy_name_pairs

    names = [
        "red widget", "ted widget", "red gadget", "blue widget",
        "blue widge", "green anvil", "greon anvil", "red widget",  # dup row
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    got = sorted(
        map(
            tuple,
            fuzzy_name_pairs(
                df, "p_name", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)), 2
            ).collect(),
        )
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    uniq = sorted(set(names))
    want = sorted(
        (a, b, lev(a, b))
        for i, a in enumerate(uniq)
        for b in uniq[i + 1:]
        if a.split()[-1] == b.split()[-1] and a < b and lev(a, b) <= 2
    )
    assert got == want
    assert ("green anvil", "greon anvil", 1) in got
    assert ("red widget", "ted widget", 1) in got
    # cross-block near names must NOT appear, even at distance 1 —
    # blocking is a recall trade and the block key must bind
    assert ("blue widge", "blue widget", 1) not in got
    assert all(a.split()[-1] == b.split()[-1] for a, b, _ in got)


def test_fuzzy_name_pairs_multipass_recovers_last_word_variants(spark):
    """Multi-pass blocking (first word + last word) must catch the
    class single-key blocking misses: pairs whose names differ in the
    blocking word itself. Pairs caught by BOTH passes appear once, and
    pairs differing at both ends stay invisible (the documented
    residual)."""
    from deepcell_data_engineering_spark.functions.dedup import fuzzy_name_pairs

    names = [
        "blue widget", "blue widgat",   # last-word variant: only the
                                        # first-word pass can see it
        "red gadget", "ted gadget",     # first-word variant: only the
                                        # last-word pass can see it
        "green anvil", "green anvil x", # length/len-band play
        "grain anvol",                  # differs from green anvil at
                                        # BOTH ends -> invisible even
                                        # though lev()==2
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    keys = [
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(-1)),
    ]
    rows = fuzzy_name_pairs(df, "p_name", keys, 2).collect()
    got = sorted((r.name_a, r.name_b, r.dist) for r in rows)
    assert ("blue widgat", "blue widget", 1) in got       # pass 1 only
    assert ("red gadget", "ted gadget", 1) in got         # pass 2 only
    # both-ends variant is the documented recall residual
    assert not any("grain anvol" in (a, b) for a, b, _ in got)
    # no pair appears twice even when both passes find it
    assert len(got) == len({(a, b) for a, b, _ in got})


def test_simhash_hamming_pairs_guarantee_below_band_count(spark):
    """Pigeonhole: any signature pair with hamming < n_bands shares a
    band, so every such pair MUST be found; verify against brute force
    over all signature pairs."""
    from deepcell_data_engineering_spark.functions.dedup import (
        simhash_hamming_pairs,
    )

    base = 0b101010101010101010101010101010101010101010101010101010101010
    sigs = [
        base,
        base ^ 0b1,                    # hamming 1
        base ^ 0b11000000,             # hamming 2
        base ^ (1 << 59),              # hamming 1 (top bit)
        base ^ 0x7,                    # hamming 3 from base
        0b010101010101010101010101010101010101010101010101010101010101,  # far
    ]
    df = spark.createDataFrame([(s,) for s in sigs], "simhash long")
    got = {
        (r["sig_a"], r["sig_b"]): r["hamming"]
        for r in simhash_hamming_pairs(
            df, "simhash", n_bands=4, band_bits=15, max_hamming=6
        ).collect()
    }
    for i, a in enumerate(sigs):
        for b in sigs[i + 1:]:
            h = bin(a ^ b).count("1")
            lo, hi = min(a, b), max(a, b)
            if h < 4:  # guaranteed by pigeonhole
                assert got.get((lo, hi)) == h, (lo, hi, h)
            if (lo, hi) in got:
                assert got[(lo, hi)] == h  # reported distance always true


def test_bpe_encode_vocab_roundtrips_terms(spark):
    """Concatenating each term's encoded tokens reproduces the term,
    every token is either a single char or a learned merge product, and
    encoding with the trained rules leaves no adjacent learned pair
    unmerged for the FIRST rule (canonical greedy exhaustiveness)."""
    from deepcell_data_engineering_spark.functions.text import (
        bpe_encode_vocab,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(1, "banana bandana cabana"), (2, "banana banana hahahaha")],
        "doc_id long, text string",
    )
    rules = [
        (r["lhs"], r["rhs"])
        for r in bpe_train(df, rounds=4).orderBy("round").collect()
    ]
    enc = bpe_encode_vocab(df, rules).collect()
    merged_tokens = {a + b for a, b in rules}
    first = rules[0]
    for row in enc:
        assert "".join(row["toks"]) == row["term"]
        for t in row["toks"]:
            assert len(t) == 1 or t in merged_tokens, (row["term"], t)
        # canonical greedy: no adjacent (lhs, rhs) of the first-learned
        # rule can survive encoding
        for x, y in zip(row["toks"], row["toks"][1:]):
            assert (x, y) != first, (row["term"], row["toks"])


def test_pq_encode_is_partition_invariant_and_bounded(spark, vectors):
    """PQ codes are pure per-row functions of the vector and the
    (driver-resident) codebooks: repartitioning cannot change them, and
    every vector gets exactly m codes in [0, k)."""
    from deepcell_data_engineering_spark.functions.similarity import (
        pq_encode,
        pq_train,
    )

    cb = pq_train(vectors, m=4, n_clusters=4, iters=2)
    assert len(cb) == 16 and all(len(v) == 4 for _, _, v in cb)
    a = sorted(map(tuple, pq_encode(vectors.repartition(1), cb).collect()))
    b = sorted(map(tuple, pq_encode(vectors.repartition(8), cb).collect()))
    assert a == b
    n = vectors.count()
    assert len(a) == n * 4
    assert all(0 <= code < 4 for _, _, code in a)


def test_pq_reconstruction_beats_random_codes(spark, vectors):
    """Trained codebooks must reconstruct vectors better (higher mean
    dot with the reconstruction) than assigning every vector code 0 —
    the sanity floor for quantization quality."""
    import numpy as np

    from deepcell_data_engineering_spark.functions.similarity import (
        pq_encode,
        pq_train,
    )

    cb = pq_train(vectors, m=4, n_clusters=4, iters=2)
    cmap = {(s, j): np.array(v) for s, j, v in cb}
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in vectors.collect()}
    codes = {}
    for r in pq_encode(vectors, cb).collect():
        codes.setdefault(r["vec_id"], {})[r["s"]] = r["code"]

    def recon(vid, cs):
        return np.concatenate([cmap[(s, cs[s])] for s in range(4)])

    trained = np.mean(
        [vecs[i] @ recon(i, codes[i]) for i in vecs]
    )
    floor = np.mean(
        [vecs[i] @ recon(i, {s: 0 for s in range(4)}) for i in vecs]
    )
    assert trained > floor
    assert trained > 0  # reconstructions correlate with their sources


def test_residual_ivfpq_recall_not_worse_than_raw(spark):
    """The x96 claim, measured: under the FAISS-IP decomposition
    dot(q,v) = dot(q,c) + dot(q, v-c), residual-trained codebooks
    approximate dot(q,v) with error dot(q, residual-quantization-
    error) - smaller than raw PQ's at the same 4-byte budget - so
    recall@5 against the exact-dot ground truth (within the same
    probed candidate sets) must not degrade."""
    from deepcell_data_engineering_spark.catalog import load_table
    from deepcell_data_engineering_spark.relational import QUERIES
    from pyspark.sql import Window

    sf = "/root/testdata/sf0.01"
    emb = load_table(spark, sf, "embeddings")
    # GLOBAL exact-dot top-5 (the end-to-end truth): both methods are
    # charged for coarse-pruning misses as well as quantization error,
    # since they probe different list layouts (lowest-id vs trained)
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vc"),
    )
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("vq"),
    )
    dotqv = F.aggregate(
        F.zip_with("vq", "vc", lambda x, y: x * y),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    w = Window.partitionBy("qid").orderBy(F.desc("_d"), "neighbor_id")
    exact = (
        corpus.crossJoin(F.broadcast(qs))
        .where(F.col("neighbor_id") != F.col("qid"))
        .select("qid", "neighbor_id", dotqv.alias("_d"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .collect()
    )
    truth = {}
    for r in exact:
        truth.setdefault(r["qid"], set()).add(r["neighbor_id"])

    def recall(name):
        rows = QUERIES[name].build(spark, sf).collect()
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        per_q = [
            len(got.get(q, set()) & hits) / len(hits)
            for q, hits in truth.items()
        ]
        return sum(per_q) / len(per_q)

    raw = recall("x92_ivfpq_topk")
    residual = recall("x96_ivfpq_residual_topk")
    # measured on this fixture: raw 0.24, residual 0.32 - a 4x8
    # codebook is deliberately coarse (4 bytes/vector), the comparison
    # is the point, not the absolute number
    assert residual >= raw, (residual, raw)
    assert residual >= 0.25, (residual, raw)


def test_fuzzy_name_pairs_fastss_passes_catch_both_end_variants(spark):
    """FastSS deletion-neighborhood passes over the head and tail
    tokens (the x74 production blocking) CATCH pairs that differ at
    BOTH ends — the residual exact head/tail blocking left behind —
    whenever at least one end changed by <= 1 edit, which a <=3-edit
    budget guarantees for boundary-respecting alignments."""
    from deepcell_data_engineering_spark.functions.dedup import (
        fastss1_variants,
        fuzzy_name_pairs,
    )

    names = [
        "green anvil", "grean anvol",   # BOTH ends differ (1 edit each,
                                        # lev == 2): caught via either
                                        # end's shared deletion variant
        "blue widget", "blu widgets",   # deletion at head + insertion
                                        # at tail (lev == 2)
        "red gadget", "rod gidget",     # substitution at each end
        "zinc plate", "iron sheet",     # far pair: must NOT appear
    ]
    df = spark.createDataFrame([(n,) for n in names], "p_name string")
    keys = [
        fastss1_variants(F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))),
        fastss1_variants(F.split_part(F.col("p_name"), F.lit(" "), F.lit(-1))),
    ]
    rows = fuzzy_name_pairs(df, "p_name", keys, 3).collect()
    got = sorted((r.name_a, r.name_b, r.dist) for r in rows)
    assert ("grean anvol", "green anvil", 2) in got
    assert ("blu widgets", "blue widget", 2) in got
    assert ("red gadget", "rod gidget", 2) in got
    assert not any("zinc plate" in (a, b) for a, b, _ in got)
    # scalar and array passes compose: exact-tail pass plus a FastSS
    # head pass dedupe into one candidate set
    mixed = fuzzy_name_pairs(
        df,
        "p_name",
        [F.split_part(F.col("p_name"), F.lit(" "), F.lit(-1)), keys[0]],
        3,
    ).collect()
    pairs = {(r.name_a, r.name_b) for r in mixed}
    assert len(pairs) == len(mixed)
