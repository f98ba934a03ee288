"""SparkSession factory with the engine's standard configuration.

Scale posture: these settings are chosen for a real cluster and merely
exercised on local[N]:
- AQE on (runtime coalescing of shuffle partitions, skew-join splitting).
- Arrow on for every pandas-UDF boundary.
- ``spark.sql.legacy.parquet.nanosAsLong`` — the testdata ``events.ts``
  column is parquet TIMESTAMP(NANOS), which vanilla Spark rejects; we read
  it as a long and normalize in the catalog (see catalog.load_table).
- Session timezone pinned to UTC so timestamp arithmetic matches the
  DuckDB oracle byte-for-byte.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "deepcell-data-engineering-spark",
    master: str | None = None,
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller passes nothing and spark-submit supplies the master.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    builder = (
        builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # 128 MiB split targets keep scan partitions executor-memory-sized
        # at large SF without over-splitting small files locally.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Runtime bloom-filter pruning: a selective filtered dim side
        # injects a bloom filter into the fact scan of a shuffle join —
        # rows that cannot match die at the scan instead of crossing the
        # exchange. Thresholds are Spark's defaults (10M build side);
        # the local testdata is below them, so the feature is exercised
        # by a dedicated plan test with test-scoped thresholds.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # grouped_cumsum's branches must dedup to ONE range exchange
        # (same sampled splits); see functions/layout.py — the tripwire
        # there fails loudly if this is ever violated
        .config("spark.sql.exchange.reuse", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable conf to an externally-built
    session (the driver hands us one in ``__spark_entry__.entry``)."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        # grouped_cumsum's two branches must dedup to ONE range
        # exchange (same sampled splits); its tripwire turns a
        # violation into a loud failure, this pin prevents one
        ("spark.sql.exchange.reuse", "true"),
    ]:
        spark.conf.set(k, v)
    return spark
