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
