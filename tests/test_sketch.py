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
