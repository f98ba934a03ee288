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
