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


def test_stream_reader_drains_to_batch_parity(registered, tmp_path):
    """The streaming face of the source: micro-batches of `rate` rows
    until n, offsets as row indexes. Once drained, the streamed table
    equals the batch read exactly - and readBetweenOffsets regenerates
    any slice identically (the checkpoint-replay contract)."""
    out = str(tmp_path / "sink")

    q = (
        registered.readStream.format("synthetic_docs")
        .option("n", "250")
        .option("rate", "100")
        .load()
        .writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # a simple stream reader advances one offset window per micro-batch
    # (availableNow only drains the first prefetch), so poll until the
    # bounded source is exhausted
    import os
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            if (
                os.path.exists(out)
                and registered.read.parquet(out).count() >= 250
            ):
                break
        except Exception:
            pass
        time.sleep(1)
    q.stop()

    streamed = sorted(map(tuple, registered.read.parquet(out).collect()))
    batch = sorted(map(tuple, _load(registered, 250, 3).collect()))
    assert streamed == batch
    # replay contract: an arbitrary offset slice regenerates identically
    rdr = pydatasource.SyntheticDocsStreamReader({"n": "250", "rate": "100"})
    replayed = list(rdr.readBetweenOffsets({"index": 100}, {"index": 200}))
    assert replayed == [pydatasource.gen_row(i) for i in range(100, 200)]
