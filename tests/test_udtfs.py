"""Python UDTF surfaces: the polymorphic analyze() protocol."""


def test_json_fields_udtf_schema_follows_fields_argument(spark):
    """The analyze() contract: the resolved schema IS the constant
    fields argument - different constants, different schemas - and
    missing/malformed payloads yield NULLs, never errors."""
    from deepcell_data_engineering_spark.functions.udtfs import (
        register_json_fields_udtf,
    )

    fn = register_json_fields_udtf(spark)
    spark.createDataFrame(
        [('{"a": 1, "b": "x"}',), ("not json",), (None,)], "payload string"
    ).createOrReplaceTempView("jf_t")
    two = spark.sql(f"SELECT j.* FROM jf_t t, LATERAL {fn}(t.payload, 'a,b') j")
    assert two.columns == ["a", "b"]
    rows = sorted(two.collect(), key=lambda r: (r["a"] is None, r["a"] or ""))
    assert tuple(rows[0]) == ("1", "x")
    assert tuple(rows[1]) == (None, None) and tuple(rows[2]) == (None, None)
    three = spark.sql(
        f"SELECT j.* FROM jf_t t, LATERAL {fn}(t.payload, 'b, c ,a') j"
    )
    assert three.columns == ["b", "c", "a"]
