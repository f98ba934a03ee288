"""Generate a LOCAL sf1 documents/embeddings pair for the scaling
pressure test (BENCH_scaling.json).

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md); the quadratic-tail
queries (LSH pairs, connected components, containment, semantic
near-dup) need one more decade to distinguish near-linear scaling from a
hidden quadratic. This generator reproduces the driver tables' SHAPE at
10x the sf0.1 row counts — deterministic seed, same schema, same
distributional fingerprints measured off sf0.1:

- documents: 31-word vocabulary, 15-60 tokens/doc (n_chars ~44-580,
  mean ~297), lang {en 40%, de/es/fr/zh 15%}, source src0..src19
  uniform, ~0.16% planted exact duplicates plus 2% near-duplicates
  (one-token mutation of an earlier doc — the LSH recall target).
- embeddings: 64-dim float32, 10 cluster labels, vectors = unit-noise
  around a per-label center (what k-means / IVF queries expect).

Output is NOT committed (gitignored): ~15 MB parquet under
.scaledata/sf1/. Usage: python tools/gen_scale_data.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg",
    "filter", "query", "big", "key", "window", "row", "table", "stream",
    "merge", "data", "vector", "join", "index", "page", "cache",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
N_SOURCES = 20
EMB_DIM = 64
N_LABELS = 10


def gen_documents(n_docs: int, rng: np.random.RandomState) -> pa.Table:
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.rand()
        if i > 10 and r < 0.0016:  # exact duplicate of an earlier doc
            texts.append(texts[rng.randint(0, i)])
            continue
        if i > 10 and r < 0.0216:  # near-duplicate: one-token mutation
            base = texts[rng.randint(0, i)].split(" ")
            base[rng.randint(0, len(base))] = VOCAB[rng.randint(0, len(VOCAB))]
            texts.append(" ".join(base))
            continue
        n_tok = rng.randint(15, 61)
        texts.append(" ".join(VOCAB[j] for j in rng.randint(0, len(VOCAB), n_tok)))
    langs = [LANGS[j] for j in rng.choice(len(LANGS), n_docs, p=LANG_P)]
    sources = [f"src{j}" for j in rng.randint(0, N_SOURCES, n_docs)]
    return pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_embeddings(n_vecs: int, rng: np.random.RandomState) -> pa.Table:
    centers = rng.randn(N_LABELS, EMB_DIM).astype(np.float32) * 0.5
    labels = rng.randint(0, N_LABELS, n_vecs)
    vecs = centers[labels] + rng.randn(n_vecs, EMB_DIM).astype(np.float32) * 0.15
    return pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }
    )


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else ".scaledata/sf1"
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(42)
    docs = gen_documents(50_000, rng)
    emb = gen_embeddings(20_000, rng)
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
    print(f"wrote {docs.num_rows} documents, {emb.num_rows} embeddings -> {out_dir}")


if __name__ == "__main__":
    main()
