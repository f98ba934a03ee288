"""Custom Python DataSource (Spark 4 DataSource V2 Python API):
registration, partition planning, determinism, content invariance."""

import pytest
from pyspark.sql import functions as F

from deepcell_data_engineering_spark.sources import pydatasource


@pytest.fixture(scope="module")
def registered(spark):
    pydatasource.register(spark)
    return spark


def _load(spark, n, parts):
    return (
        spark.read.format("synthetic_docs")
        .option("n", str(n))
        .option("partitions", str(parts))
        .load()
    )


def test_row_count_schema_and_partition_planning(registered):
    df = _load(registered, 500, 4)
    assert df.columns == ["doc_id", "lang", "value"]
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 4
    # ids dense and unique
    assert df.agg(F.countDistinct("doc_id")).collect()[0][0] == 500
    assert df.agg(F.min("doc_id"), F.max("doc_id")).collect()[0] == (0, 499)


def test_content_is_partition_count_invariant(registered):
    a = sorted(map(tuple, _load(registered, 300, 1).collect()))
    b = sorted(map(tuple, _load(registered, 300, 7).collect()))
    assert a == b
    # and matches the pure row function exactly
    assert a == sorted(pydatasource.gen_row(i) for i in range(300))


def test_generator_scales_by_slicing_not_restating(registered):
    """A bigger n is a strict superset: row i is a pure function of i,
    independent of n - the property that lets a 1000-executor cluster
    generate any prefix range without coordination."""
    small = set(map(tuple, _load(registered, 100, 3).collect()))
    big = set(map(tuple, _load(registered, 200, 5).collect()))
    assert small < big
