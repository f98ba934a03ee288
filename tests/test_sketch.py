"""Misra-Gries bounded-memory heavy hitters (functions/sketch.py):
exactness when capacity covers the vocabulary, deterministic error
bounds and the heavy-hitter guarantee under tight capacity."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from deepcell_data_engineering_spark.catalog import load_table
from deepcell_data_engineering_spark.functions.sketch import misra_gries_topk
from deepcell_data_engineering_spark.functions.text import tokens

from conftest import SF_SMOKE


def test_exact_when_capacity_covers_vocab(spark):
    toks = tokens(load_table(spark, SF_SMOKE, "documents"))
    exact = {
        r["term"]: r["c"]
        for r in toks.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    got = misra_gries_topk(toks, k=10, capacity=10_000).collect()
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["term"], r["count_min"]) for r in got] == want
    assert all(r["count_max"] == r["count_min"] for r in got)  # D == 0
    assert [r["rank"] for r in got] == list(range(1, 11))


def test_bounds_and_heavy_guarantee_under_tight_capacity(spark):
    """A zipf-ish stream where one term dominates: with capacity 8 the
    sketch must keep every term whose true count exceeds the reported
    decrement total, and bracket every returned count."""
    rng = np.random.RandomState(0)
    terms = (
        ["hot"] * 5000
        + ["warm"] * 1200
        + [f"cold{i}" for i in rng.randint(0, 400, 4000)]
    )
    rng.shuffle(terms)
    df = spark.createDataFrame([Row(term=t) for t in terms]).repartition(8)
    exact = {
        r["term"]: r["c"]
        for r in df.groupBy("term").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    out = misra_gries_topk(df, k=len(exact), capacity=8).collect()
    d = out[0]["count_max"] - out[0]["count_min"]
    assert d > 0  # capacity 8 over ~400 distinct terms must decrement
    returned = {r["term"]: r for r in out}
    for r in out:
        assert r["count_min"] <= exact[r["term"]] <= r["count_max"]
    heavy = [t for t, c in exact.items() if c > d]
    assert heavy, "test distribution must produce a guaranteed heavy hitter"
    assert all(t in returned for t in heavy)
    # and the dominant term ranks first
    assert out[0]["term"] == "hot"


def test_fixed_state_per_partition(spark):
    """The map stage ships at most capacity+1 rows per partition
    regardless of vocabulary size — the property that makes the sketch
    safe on an open vocabulary."""
    rng = np.random.RandomState(1)
    df = spark.createDataFrame(
        [Row(term=f"t{int(i)}") for i in rng.randint(0, 50_000, 20_000)]
    ).repartition(4)
    out = misra_gries_topk(df, k=5, capacity=16)
    assert len(out.collect()) == 5


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------

from deepcell_data_engineering_spark.functions.sketch import (  # noqa: E402
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _vals(spark, lo, hi, group="g"):
    return spark.range(lo, hi).select(
        F.lit(group).alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )


def test_hll_estimate_within_expected_error(spark):
    n = 20_000
    df = _vals(spark, 0, n).repartition(8)
    est = hll_estimate(hll_registers(df, "v", ["g"], p=12), ["g"], p=12).collect()[0]
    # p=12 -> sigma ~1.6%; 5 sigma guard band
    assert abs(est["est"] - n) / n < 0.08
    assert est["present"] + est["zeros"] == 4096


def test_hll_merge_equals_rebuild_and_is_idempotent(spark):
    a = _vals(spark, 0, 5_000)
    b = _vals(spark, 3_000, 9_000)  # overlapping ranges
    ra = hll_registers(a, "v", ["g"], p=10)
    rb = hll_registers(b, "v", ["g"], p=10)
    merged = hll_merge(ra, rb, ["g"])
    rebuilt = hll_registers(a.unionByName(b), "v", ["g"], p=10)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))
    # idempotent: merging a table with itself is a no-op
    twice = hll_merge(ra, ra, ["g"])
    assert sorted(map(tuple, twice.collect())) == sorted(map(tuple, ra.collect()))


def test_hll_registers_are_partition_invariant(spark):
    df = _vals(spark, 0, 4_000)
    r1 = hll_registers(df.repartition(1), "v", ["g"], p=11)
    r8 = hll_registers(df.repartition(8), "v", ["g"], p=11)
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r8.collect()))


def test_hll_linear_counting_branch_small_cardinality(spark):
    df = _vals(spark, 0, 50)
    est = hll_estimate(hll_registers(df, "v", ["g"], p=12), ["g"], p=12).collect()[0]
    # 50 distinct over 4096 buckets: linear counting, very tight
    assert abs(est["est"] - 50) < 5
    assert est["zeros"] > 0


def test_hll_rejects_bad_precision(spark):
    df = _vals(spark, 0, 10)
    with pytest.raises(ValueError, match=r"p must be in"):
        hll_registers(df, "v", ["g"], p=3)


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

from deepcell_data_engineering_spark.functions.sketch import (  # noqa: E402
    cms_build,
    cms_lookup,
    cms_merge,
)


def test_cms_never_underestimates_and_is_tight_on_sparse_input(spark):
    rng = np.random.RandomState(7)
    terms = [f"t{i}" for i in rng.zipf(1.5, 3_000) if i < 500]
    df = spark.createDataFrame([Row(term=t) for t in terms]).repartition(8)
    exact = df.groupBy("term").agg(F.count(F.lit(1)).alias("exact"))
    cms = cms_build(df, "term", width=1024, depth=4)
    est = cms_lookup(cms, exact, "term", width=1024, depth=4)
    rows = est.collect()
    assert rows and all(r["est_count"] >= r["exact"] for r in rows)
    # depth=4, width >> distinct: most keys should be collision-free
    tight = sum(1 for r in rows if r["est_count"] == r["exact"])
    assert tight / len(rows) > 0.8


def test_cms_merge_equals_rebuild(spark):
    a = spark.createDataFrame([Row(term=f"a{i % 17}") for i in range(300)])
    b = spark.createDataFrame([Row(term=f"a{i % 23}") for i in range(200)])
    merged = cms_merge(cms_build(a, "term", 256, 3), cms_build(b, "term", 256, 3))
    rebuilt = cms_build(a.unionByName(b), "term", 256, 3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))


def test_cms_state_is_bounded_and_partition_invariant(spark):
    df = spark.createDataFrame([Row(term=f"t{i}") for i in range(5_000)])
    c1 = cms_build(df.repartition(1), "term", width=64, depth=2)
    c8 = cms_build(df.repartition(8), "term", width=64, depth=2)
    rows = c1.collect()
    assert len(rows) <= 64 * 2  # counter table bounded by width*depth
    assert sorted(map(tuple, rows)) == sorted(map(tuple, c8.collect()))


def test_cms_build_from_counts_equals_raw_build(spark):
    # r13 optimization contract: building from a pre-aggregated per-key
    # count table (count_col=...) is bit-identical to the raw-row build
    # — the form x79/x86/x90 use to share one scan between the CMS and
    # their exact twins.
    raw = spark.createDataFrame(
        [Row(term=f"k{i % 37}") for i in range(1_000)]
    ).repartition(6)
    counts = raw.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    from_raw = cms_build(raw, "term", width=128, depth=3)
    from_counts = cms_build(counts, "term", width=128, depth=3, count_col="n")
    assert sorted(map(tuple, from_raw.collect())) == sorted(
        map(tuple, from_counts.collect())
    )


def test_cms_rejects_bad_shape(spark):
    df = spark.createDataFrame([Row(term="x")])
    with pytest.raises(ValueError, match="width"):
        cms_build(df, "term", width=1, depth=0)


# ---------------------------------------------------------------------------
# Log-histogram quantile registers
# ---------------------------------------------------------------------------

from deepcell_data_engineering_spark.functions.sketch import (  # noqa: E402
    hist_merge,
    hist_quantiles,
    hist_registers,
)


def test_hist_quantile_interval_always_contains_exact(spark):
    rng = np.random.RandomState(11)
    vals = np.concatenate(
        [rng.lognormal(8, 2, 2_000).astype(int), rng.randint(0, 4, 50)]
    )
    df = spark.createDataFrame([Row(g="a", x=int(v)) for v in vals])
    qs = [0.1, 0.5, 0.9, 0.99]
    got = {
        r["q"]: r
        for r in hist_quantiles(hist_registers(df, "x", ["g"]), ["g"], qs).collect()
    }
    srt = np.sort(vals)
    for q in qs:
        k = int(np.ceil(q * len(vals)))
        exact = int(srt[k - 1])
        assert got[q]["lo"] <= exact <= got[q]["hi"], (q, exact, got[q])
        # quarter-octave bins: interval is relatively tight
        assert got[q]["hi"] <= max(2 * got[q]["lo"], got[q]["lo"] + 3)


def test_hist_merge_equals_rebuild_and_partition_invariant(spark):
    a = spark.range(0, 3_000).select(F.lit("g").alias("g"), (F.col("id") * 7 % 5_000).alias("x"))
    b = spark.range(0, 2_000).select(F.lit("g").alias("g"), (F.col("id") * 13 % 9_000).alias("x"))
    merged = hist_merge(hist_registers(a, "x", ["g"]), hist_registers(b, "x", ["g"]), ["g"])
    rebuilt = hist_registers(a.unionByName(b), "x", ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, rebuilt.collect()))
    r1 = hist_registers(a.repartition(1), "x", ["g"])
    r8 = hist_registers(a.repartition(8), "x", ["g"])
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r8.collect()))


def test_hist_small_values_get_exact_singleton_bins(spark):
    df = spark.createDataFrame([Row(g="g", x=v) for v in [0, 1, 2, 3] * 10])
    got = hist_quantiles(hist_registers(df, "x", ["g"]), ["g"], [0.5]).collect()[0]
    assert got["lo"] == got["hi"]  # singleton bin below 4


def test_hist_state_is_logarithmically_bounded(spark):
    df = spark.range(1, 1_000_000).select(F.lit("g").alias("g"), F.col("id").alias("x"))
    n_bins = hist_registers(df, "x", ["g"]).count()
    # ~4 bins/octave * 20 octaves — two orders below the value count
    assert n_bins <= 4 * 21 + 4


def test_hll_rollup_levels_equal_direct_builds(spark):
    from deepcell_data_engineering_spark.functions.sketch import (
        hll_rollup_estimates,
    )

    df = spark.range(0, 6_000).select(
        F.concat(F.lit("s"), (F.col("id") % 3)).alias("src"),
        F.concat(F.lit("l"), (F.col("id") % 2)).alias("lng"),
        F.concat(F.lit("v"), (F.col("id") % 1_500)).alias("v"),
    )
    reg = hll_registers(df, "v", ["src", "lng"], p=10)
    rolled = hll_rollup_estimates(reg, ["src", "lng"], p=10)
    # lvl=1 rows must equal estimates from registers built directly at
    # (src) granularity; lvl=2 the global build — the lattice property
    direct1 = {
        r["src"]: r["est"]
        for r in hll_estimate(hll_registers(df, "v", ["src"], p=10), ["src"], p=10).collect()
    }
    got1 = {r["src"]: r["est"] for r in rolled.where(F.col("lvl") == 1).collect()}
    assert got1 == direct1
    direct0 = hll_estimate(hll_registers(df, "v", [], p=10), [], p=10).collect()[0]["est"]
    got0 = rolled.where(F.col("lvl") == 2).collect()[0]["est"]
    assert got0 == direct0
    # null values are dropped, not registered
    withnull = df.unionByName(
        spark.createDataFrame([("s0", "l0", None)], "src string, lng string, v string")
    )
    assert sorted(map(tuple, hll_registers(withnull, "v", ["src", "lng"], p=10).collect())) == sorted(
        map(tuple, reg.collect())
    )


def test_hist_quantiles_contain_duckdb_disc_on_d43_table(spark):
    """Cross-pin the two quantile paths (round-5 verdict item): the x63
    log-histogram interval must contain DuckDB's exact disc value —
    computed with the SAME ceil(q*n)-th row definition hist_quantiles
    uses — for every l_returnflag group and q, on d43's lineitem table
    at the driver's check scale (sf0.01)."""
    import duckdb

    sf_dir = "/root/testdata/sf0.01"
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("bigint").alias("x"),
    )
    got = {
        (r["g"], r["q"]): r
        for r in hist_quantiles(hist_registers(v, "x", ["g"]), ["g"], qs).collect()
    }
    con = duckdb.connect()
    qvals = ", ".join(str(q) for q in qs)
    exact = con.execute(
        f"""WITH v AS (
              SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
                     COUNT(*) OVER (PARTITION BY l_returnflag) AS n
              FROM read_parquet('{sf_dir}/lineitem.parquet'))
            SELECT g, q, MIN(x) AS disc
            FROM v, UNNEST([{qvals}]) AS t(q)
            WHERE rn = CEIL(q * n)
            GROUP BY g, q"""
    ).fetchall()
    assert len(exact) == 3 * len(qs)  # return flags A/N/R x qs
    for g, q, disc in exact:
        r = got[(g, float(q))]
        assert r["lo"] <= disc <= r["hi"], (g, q, disc, r)


# ---------------------------------------------------------------------------
# Round-6 additions: sliding registers, CMS inner product
# ---------------------------------------------------------------------------

from deepcell_data_engineering_spark.functions.sketch import (  # noqa: E402
    cms_build,
    cms_inner_product,
    hll_sliding_registers,
)


def test_sliding_registers_equal_rebuild_per_window(spark):
    """(wend, bucket, r) from the fan-out merge must equal registers
    built directly from each window's unioned values — merge == rebuild,
    the property that makes per-day state a substitute for rescans."""
    import datetime

    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=d), f"u{v}")
        for d in range(10)
        for v in range(d * 3, d * 3 + 40)  # overlapping value ranges
    ]
    df = spark.createDataFrame(rows, "day date, uid string")
    daily = hll_registers(df, "uid", ["day"], p=8)
    slid = {
        (r["wend"], r["bucket"]): r["r"]
        for r in hll_sliding_registers(daily, "day", window_days=7).collect()
    }
    days = sorted({d for d, _ in rows})
    for wend in days:
        lo = wend - datetime.timedelta(days=6)
        win = df.where((F.col("day") >= lo) & (F.col("day") <= wend))
        direct = {
            r["bucket"]: r["r"] for r in hll_registers(win, "uid", [], p=8).collect()
        }
        got = {b: r for (w, b), r in slid.items() if w == wend}
        assert got == direct, wend


def test_cms_inner_product_bounds_join_size(spark):
    """est >= true join size always; equality when no bucket collisions."""
    a = spark.createDataFrame(
        [(f"k{i % 7}",) for i in range(200)], "k string"
    )
    b = spark.createDataFrame(
        [(f"k{i % 11}",) for i in range(330)], "k string"
    )
    true_size = a.join(b, "k").count()
    est = cms_inner_product(
        cms_build(a, "k", width=4096, depth=4), cms_build(b, "k", width=4096, depth=4)
    ).collect()[0]["est"]
    assert est >= true_size
    # 7 and 11 distinct keys in 4096 buckets: collisions are possible in
    # principle but the md5 spread makes them absent here; the estimator
    # must then be exact
    assert est == true_size


def test_cms_inner_product_self_join_on_skew(spark):
    df = spark.createDataFrame(
        [(("hot" if i % 3 else f"cold{i}"),) for i in range(3000)], "k string"
    )
    exact = (
        df.groupBy("k")
        .count()
        .agg(F.sum(F.col("count") * F.col("count")))
        .collect()[0][0]
    )
    cms = cms_build(df, "k", width=4096, depth=4)
    est = cms_inner_product(cms, cms).collect()[0]["est"]
    assert est >= exact
    assert est <= exact * 1.5  # sane overestimate at this load factor


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch
# ---------------------------------------------------------------------------


def _kmv_rows(df):
    return sorted((tuple(r) for r in df.collect()))


def test_kmv_exact_when_unsaturated(spark):
    """Fewer than k distinct values: the state is every distinct hash
    and the estimate is exactly the distinct count."""
    from deepcell_data_engineering_spark.functions.sketch import (
        kmv_estimate,
        kmv_registers,
    )

    df = spark.createDataFrame(
        [(f"g{ i % 2}", f"v{i % 30}") for i in range(500)], "g string, v string"
    )
    reg = kmv_registers(df, "v", ["g"], k=64)
    got = {r["g"]: (r["n_state"], r["theta"], r["est"]) for r in
           kmv_estimate(reg, ["g"], k=64).collect()}
    for g in ("g0", "g1"):
        n, theta, est = got[g]
        assert n == 15  # 30 values split by i%2 -> 15 distinct per group
        assert theta == 1 << 60
        assert est == 15.0


def test_kmv_prefilter_invisible_and_rescue(spark):
    """The threshold prefilter (any slack, including one tiny enough to
    force the rescue path) must produce the identical state as the
    unfiltered rank."""
    from deepcell_data_engineering_spark.functions.sketch import kmv_registers

    df = spark.createDataFrame(
        [(f"g{i % 3}", f"value-{i}") for i in range(3000)], "g string, v string"
    )
    base = _kmv_rows(kmv_registers(df, "v", ["g"], k=32, prefilter=False))
    assert base == _kmv_rows(
        kmv_registers(df, "v", ["g"], k=32, prefilter=True, slack=8.0)
    )
    # slack 0.005 -> threshold ~ 0.16/nd of the space: expected survivors
    # ~ 0.16 < k, so the cut-below-k rescue re-ranks every group
    assert base == _kmv_rows(
        kmv_registers(df, "v", ["g"], k=32, prefilter=True, slack=0.005)
    )
    # global (no group columns) sketch, both paths
    gb = _kmv_rows(kmv_registers(df, "v", k=32, prefilter=False))
    assert gb == _kmv_rows(kmv_registers(df, "v", k=32, prefilter=True))
    assert gb == _kmv_rows(
        kmv_registers(df, "v", k=32, prefilter=True, slack=0.005)
    )


def test_kmv_merge_equals_rebuild_and_partition_invariance(spark):
    from deepcell_data_engineering_spark.functions.sketch import (
        kmv_merge,
        kmv_registers,
    )

    rows = [(f"g{i % 2}", f"value-{i % 700}") for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, v string")
    a = df.where(F.crc32(F.col("v")) % 2 == 0)
    b = df.where(F.crc32(F.col("v")) % 2 == 1)
    merged = kmv_merge(
        kmv_registers(a, "v", ["g"], k=48), kmv_registers(b, "v", ["g"], k=48),
        ["g"], k=48,
    )
    rebuilt = kmv_registers(df, "v", ["g"], k=48)
    assert _kmv_rows(merged) == _kmv_rows(rebuilt)
    assert _kmv_rows(rebuilt) == _kmv_rows(
        kmv_registers(df.repartition(7), "v", ["g"], k=48)
    )


def test_kmv_estimate_accuracy_and_intersection(spark):
    """Saturated estimates land within ~5 standard errors of truth, and
    the pairwise intersection estimator tracks a constructed overlap
    (sets of 3000/3000 sharing exactly 1500 values)."""
    from deepcell_data_engineering_spark.functions.sketch import (
        kmv_estimate,
        kmv_intersect_pairs,
        kmv_registers,
    )

    rows = [("a", f"v{i}") for i in range(3000)] + [
        ("b", f"v{i}") for i in range(1500, 4500)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    k = 256
    reg = kmv_registers(df, "v", ["g"], k=k)
    est = {r["g"]: r["est"] for r in kmv_estimate(reg, ["g"], k=k).collect()}
    se = 3000 / (k - 2) ** 0.5
    assert abs(est["a"] - 3000) < 5 * se
    assert abs(est["b"] - 3000) < 5 * se
    inter = kmv_intersect_pairs(reg, "g", k=k).collect()
    assert len(inter) == 1
    r = inter[0]
    assert (r["g_a"], r["g_b"]) == ("a", "b")
    # sample-of-intersection error ~ sqrt(common)/rate; 1500 +- wide band
    assert 500 < r["est_inter"] < 2500
    # unsaturated pair is exact
    small = spark.createDataFrame(
        [("a", f"v{i}") for i in range(100)]
        + [("b", f"v{i}") for i in range(60, 160)],
        "g string, v string",
    )
    sreg = kmv_registers(small, "v", ["g"], k=k)
    sr = kmv_intersect_pairs(sreg, "g", k=k).collect()[0]
    assert sr["common"] == 40 and sr["est_inter"] == 40.0
