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


def gen_events(n_events: int, rng: np.random.RandomState) -> pa.Table:
    """events at 10x sf0.1 rows, same shape as the driver testdata:
    30-day window, ~10x users at the same events/user, 5-type enum,
    value ~ the same right-skewed magnitude (x105/x108/x111/x113
    exercise per-type medians, clips, trends and day rollups)."""
    types = np.array(["click", "view", "purchase", "signup", "error"])
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC in micros
    ts_us = base_us + rng.randint(0, 30 * 86_400_000_000, n_events)
    return pa.table(
        {
            "event_id": pa.array(range(n_events), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(rng.randint(0, 15_000, n_events), pa.int64()),
            "event_type": pa.array(
                types[rng.randint(0, 5, n_events)], pa.string()
            ),
            "value": pa.array(
                np.round(rng.exponential(50.0, n_events), 2), pa.float64()
            ),
            "props": pa.array(
                ['{"k": %d}' % k for k in rng.randint(0, 100, n_events)],
                pa.string(),
            ),
        }
    )


def _write_lineitem_chunked(
    path: str,
    n_li: int,
    n_ord: int,
    n_part: int,
    n_supp: int,
    t0: int,
    day_us: int,
    rng: np.random.RandomState,
    chunk: int = 10_000_000,
) -> None:
    """Row-group-at-a-time lineitem writer for the 100x rehearsal: at
    60M rows the single-table path would hold ~6 GB of column arrays
    plus their Arrow copies at once; a ParquetWriter streams chunks.
    Consumes the rng in per-chunk column order, so it is NOT draw-
    compatible with the unchunked path (only used for scale > 10,
    where no prior artifact exists to stay compatible with)."""
    import pyarrow.parquet as pqw

    rf = np.array(["N", "A", "R"])
    ls = np.array(["O", "F"])
    writer = None
    done = 0
    while done < n_li:
        n = min(chunk, n_li - done)
        tbl = pa.table(
            {
                "l_orderkey": pa.array(
                    rng.randint(0, n_ord, n).astype(np.int64), pa.int64()
                ),
                "l_partkey": pa.array(
                    rng.randint(0, n_part, n).astype(np.int64), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.randint(0, n_supp, n).astype(np.int64), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.randint(1, 8, n).astype(np.int32), pa.int32()
                ),
                "l_quantity": pa.array(
                    rng.randint(1, 51, n).astype(np.float64), pa.float64()
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900, 105000, n), 2), pa.float64()
                ),
                "l_discount": pa.array(
                    np.round(rng.randint(0, 11, n) / 100.0, 2), pa.float64()
                ),
                "l_tax": pa.array(
                    np.round(rng.randint(0, 9, n) / 100.0, 2), pa.float64()
                ),
                "l_returnflag": pa.array(rf[rng.randint(0, 3, n)]),
                "l_linestatus": pa.array(ls[rng.randint(0, 2, n)]),
                "l_shipdate": pa.array(
                    (t0 + rng.randint(1, 2500, n).astype(np.int64) * day_us)
                    .astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )
        if writer is None:
            writer = pqw.ParquetWriter(path, tbl.schema)
        writer.write_table(tbl)
        done += n
    if writer is not None:
        writer.close()


def gen_dims(out_dir: str, scale: int, rng: np.random.RandomState) -> None:
    """supplier (1k x scale, sf0.1 fingerprints: dense s_suppkey,
    s_nationkey uniform 0..24) plus the fixed nation/region dims —
    the tables x187's revenue-concentration rollup joins through."""
    n_supp = 1_000 * scale
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(range(n_supp), pa.int64()),
                "s_name": pa.array(
                    [f"Supplier#{i:09d}" for i in range(n_supp)],
                    pa.string(),
                ),
                "s_nationkey": pa.array(
                    rng.randint(0, 25, n_supp), pa.int32()
                ),
                "s_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10000, n_supp), 2),
                    pa.float64(),
                ),
            }
        ),
        os.path.join(out_dir, "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(range(25), pa.int32()),
                "n_name": pa.array(
                    [f"NATION_{i}" for i in range(25)], pa.string()
                ),
                "n_regionkey": pa.array(
                    [i % 5 for i in range(25)], pa.int32()
                ),
            }
        ),
        os.path.join(out_dir, "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(range(5), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
                    pa.string(),
                ),
            }
        ),
        os.path.join(out_dir, "region.parquet"),
    )


def gen_tpch(out_dir: str, scale: int, rng: np.random.RandomState) -> None:
    """customer/orders/lineitem at ``scale``x the sf0.1 row counts,
    mirroring sf0.1's measured fingerprints (keys dense from 0,
    o_custkey uniform over customers at ~10 orders/customer,
    l_orderkey uniform over orders at ~4 lines/order, same enum
    domains and value ranges) — enough for the CMS join-size /
    profile queries (x79/x86/x87), which consume key multiplicity
    distributions and column NDVs, not TPC-H business semantics."""
    n_cust, n_ord, n_li = 15_000 * scale, 150_000 * scale, 600_000 * scale
    n_part, n_supp = 20_000 * scale, 1_000 * scale
    segs = ["AUTOMOBILE", "MACHINERY", "FURNITURE", "HOUSEHOLD", "BUILDING"]
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(n_cust), pa.int64()),
                "c_name": pa.array(
                    [f"Customer#{i:09d}" for i in range(n_cust)], pa.string()
                ),
                "c_nationkey": pa.array(
                    rng.randint(0, 25, n_cust), pa.int32()
                ),
                "c_acctbal": pa.array(
                    np.round(rng.uniform(-1000, 10000, n_cust), 2),
                    pa.float64(),
                ),
                "c_mktsegment": pa.array(
                    [segs[j] for j in rng.randint(0, len(segs), n_cust)],
                    pa.string(),
                ),
            }
        ),
        os.path.join(out_dir, "customer.parquet"),
    )
    # part mirrors sf0.1's shape: p_name = "adjective noun" from the
    # 8x8 fixed vocab (64 distinct names — includes the ed1 pairs
    # cold/old and red/rod that x149 certifies on)
    adjs = ["blue", "old", "small", "cold", "red", "new", "large", "hot"]
    nouns = ["gizmo", "bolt", "plate", "rod", "ring", "gear", "widget",
             "anvil"]
    types = ["LARGE", "STANDARD", "ECONOMY", "SMALL", "MEDIUM"]
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(range(n_part), pa.int64()),
                "p_name": pa.array(
                    [
                        f"{adjs[a]} {nouns[b]}"
                        for a, b in zip(
                            rng.randint(0, 8, n_part),
                            rng.randint(0, 8, n_part),
                        )
                    ],
                    pa.string(),
                ),
                "p_brand": pa.array(
                    [f"Brand#{j}" for j in rng.randint(1, 26, n_part)],
                    pa.string(),
                ),
                "p_type": pa.array(
                    [types[j] for j in rng.randint(0, len(types), n_part)],
                    pa.string(),
                ),
                "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
                "p_retailprice": pa.array(
                    np.round(rng.uniform(900, 2100, n_part), 2), pa.float64()
                ),
            }
        ),
        os.path.join(out_dir, "part.parquet"),
    )
    gen_dims(out_dir, scale, rng)
    day_us = 86_400_000_000
    t0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    odate = t0 + rng.randint(0, 2404, n_ord).astype(np.int64) * day_us
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(n_ord), pa.int64()),
                "o_custkey": pa.array(
                    rng.randint(0, n_cust, n_ord), pa.int64()
                ),
                "o_orderstatus": pa.array(
                    [("O", "F", "P")[j] for j in
                     rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])],
                    pa.string(),
                ),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000, 500000, n_ord), 2),
                    pa.float64(),
                ),
                "o_orderdate": pa.array(
                    odate.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(
                    [prios[j] for j in rng.randint(0, len(prios), n_ord)],
                    pa.string(),
                ),
            }
        ),
        os.path.join(out_dir, "orders.parquet"),
    )
    if scale > 10:
        _write_lineitem_chunked(
            os.path.join(out_dir, "lineitem.parquet"),
            n_li, n_ord, n_part, n_supp, t0, day_us, rng,
        )
        return
    lkey = rng.randint(0, n_ord, n_li).astype(np.int64)
    sdate = t0 + rng.randint(1, 2500, n_li).astype(np.int64) * day_us
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(lkey, pa.int64()),
                "l_partkey": pa.array(
                    rng.randint(0, n_part, n_li), pa.int64()
                ),
                "l_suppkey": pa.array(
                    rng.randint(0, n_supp, n_li), pa.int64()
                ),
                "l_linenumber": pa.array(
                    rng.randint(1, 8, n_li), pa.int32()
                ),
                "l_quantity": pa.array(
                    rng.randint(1, 51, n_li).astype(np.float64), pa.float64()
                ),
                "l_extendedprice": pa.array(
                    np.round(rng.uniform(900, 105000, n_li), 2), pa.float64()
                ),
                "l_discount": pa.array(
                    np.round(rng.randint(0, 11, n_li) / 100.0, 2),
                    pa.float64(),
                ),
                "l_tax": pa.array(
                    np.round(rng.randint(0, 9, n_li) / 100.0, 2),
                    pa.float64(),
                ),
                "l_returnflag": pa.array(
                    [("N", "A", "R")[j] for j in rng.randint(0, 3, n_li)],
                    pa.string(),
                ),
                "l_linestatus": pa.array(
                    [("O", "F")[j] for j in rng.randint(0, 2, n_li)],
                    pa.string(),
                ),
                "l_shipdate": pa.array(
                    sdate.astype("datetime64[us]"), pa.timestamp("us")
                ),
            }
        ),
        os.path.join(out_dir, "lineitem.parquet"),
    )


def main() -> None:
    """Default: the sf1 (10x sf0.1) full corpus for BENCH_scaling.
    ``--scale N`` generates an Nx-sf0.1 variant for the 100x dress
    rehearsal (tools/bench_100x.py): documents scale with N (sf0.1 has
    5k docs), tpch tables with N, events/embeddings are skipped unless
    the default 10x shape is requested — the rehearsal headliners
    (x94/x119/x103) read documents/lineitem/orders only."""
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("out_dir", nargs="?", default=".scaledata/sf1")
    ap.add_argument("--scale", type=int, default=10)
    ns = ap.parse_args()
    out_dir, scale = ns.out_dir, ns.scale
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(42)
    docs = gen_documents(5_000 * scale, rng)
    pq.write_table(docs, os.path.join(out_dir, "documents.parquet"))
    if scale == 10:
        emb = gen_embeddings(20_000, rng)
        pq.write_table(emb, os.path.join(out_dir, "embeddings.parquet"))
        pq.write_table(
            gen_events(1_000_000, rng),
            os.path.join(out_dir, "events.parquet"),
        )
    gen_tpch(out_dir, scale, np.random.RandomState(43))
    print(f"wrote {docs.num_rows} documents, "
          f"customer/orders/lineitem x{scale} -> {out_dir}")


if __name__ == "__main__":
    main()
