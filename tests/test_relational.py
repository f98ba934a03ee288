"""Every declared relational query must hash-match the DuckDB oracle."""

import pytest

from deepcell_data_engineering_spark.oracle import compare, duckdb_connect
from deepcell_data_engineering_spark.relational import QUERIES

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def con():
    con = duckdb_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    spec = QUERIES[name]
    df = spec.build(spark, SF_SMOKE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver's weak gate
        return
    res = compare(name, df, con, spec.oracle)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows}, oracle={res.oracle_rows})"


def test_asof_join_directions_and_tolerance(spark):
    from pyspark.sql import functions as F

    from deepcell_data_engineering_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [("u1", 10, "a"), ("u1", 20, "b"), ("u2", 5, "c")], "k string, ts long, tag string"
    )
    right = spark.createDataFrame(
        [("u1", 8, 100), ("u1", 10, 200), ("u1", 15, 300), ("u2", 9, 400)],
        "k string, ts long, v int",
    )
    back = {
        r["tag"]: (r["v_matched"], r["ts_matched"])
        for r in asof_join(left, right, on="ts", by="k").collect()
    }
    # exact-time match is inclusive; latest at-or-before wins
    assert back["a"] == (200, 10)
    assert back["b"] == (300, 15)
    assert back["c"] == (None, None)  # u2 has no view at-or-before ts=5

    fwd = {
        r["tag"]: r["v_matched"]
        for r in asof_join(left, right, on="ts", by="k", direction="forward").collect()
    }
    assert fwd["a"] == 200 and fwd["b"] is None and fwd["c"] == 400

    tol = {
        r["tag"]: r["v_matched"]
        for r in asof_join(left, right, on="ts", by="k", tolerance=F.lit(2)).collect()
    }
    assert tol["a"] == 200  # gap 0 <= 2
    assert tol["b"] is None  # gap 5 > 2 nulled


def test_asof_join_matched_row_null_is_inherited(spark):
    """A NULL value column in the matched (latest at-or-before) right row
    must come through as NULL — not a stale value carried from an older
    right row (pandas merge_asof / DuckDB ASOF semantics: the matched
    row's whole tuple)."""
    from deepcell_data_engineering_spark.operators.joins import asof_join

    left = spark.createDataFrame([("u1", 20, "a")], "k string, ts long, tag string")
    right = spark.createDataFrame(
        [("u1", 5, 100, "x"), ("u1", 15, None, "y")],
        "k string, ts long, v int, w string",
    )
    out = asof_join(left, right, on="ts", by="k").collect()
    assert len(out) == 1
    r = out[0]
    # matched row is ts=15: v is NULL there, w='y'; ts_matched points at it
    assert r["ts_matched"] == 15
    assert r["v_matched"] is None
    assert r["w_matched"] == "y"


def test_canonicalizer_rejects_hugeint_class_mismatch(spark, con):
    """Strictness regression (r3 hardening): an uncast SUM(BIGINT) oracle
    surfaces through DuckDB fetchdf() as float64 (HUGEINT), and the local
    checker must REJECT it against Spark's int64 even though every value
    is integer-equal — that mismatch is exactly what the driver's gate
    flags. If someone removes the dtype-class gate, this test goes red."""
    df = spark.createDataFrame([(1, 10), (2, 20)], "k INT, v LONG").groupBy(
        "k"
    ).sum("v").withColumnRenamed("sum(v)", "s")
    # uncast SUM over BIGINT -> HUGEINT -> float64 via fetchdf
    bad = "SELECT k, SUM(v) AS s FROM (VALUES (1, 10::BIGINT), (2, 20::BIGINT)) t(k, v) GROUP BY k"
    res = compare("hugeint_guard", df, con, bad)
    assert not res.ok and "dtype-class" in res.detail
    # the cast form passes
    good = "SELECT k, CAST(SUM(v) AS BIGINT) AS s FROM (VALUES (1, 10::BIGINT), (2, 20::BIGINT)) t(k, v) GROUP BY k"
    assert compare("hugeint_guard_cast", df, con, good).ok


def test_canonicalizer_array_guard_scans_all_rows(spark, con):
    """_array_cols must flag a column whose FIRST row is scalar but a
    later row holds a list (driver sort_values would crash on it)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1,), (2,)], "k INT").withColumn(
        "mixed",
        F.when(F.col("k") == 2, F.array(F.lit(1), F.lit(2))),
    )
    res = compare(
        "array_guard",
        df,
        con,
        "SELECT 1 AS k, NULL AS mixed UNION ALL SELECT 2, [1, 2]",
    )
    assert not res.ok and "array-typed" in res.detail
