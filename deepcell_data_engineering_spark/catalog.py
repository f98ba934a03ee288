"""Table catalog over the driver-generated parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file (or directory) each under a
scale-factor directory.

``events.ts`` is parquet TIMESTAMP(NANOS); Spark reads it only with
``spark.sql.legacy.parquet.nanosAsLong=true`` (as a nanosecond LONG), which
we normalize to a microsecond TIMESTAMP with integer division (``ts DIV
1000`` — exact; float division would lose precision above 2^53 ns).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already set via builder, or not settable — read will tell


def normalize_event_ts(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the events timestamp column to TimestampType regardless of
    the physical parquet encoding the testdata generator used.

    Shared by the batch reader (load_table) AND the streaming reader
    (streaming.windows.read_events_stream) so a testdata format change can
    never split the two paths again. Handles:

    - LongType: nanosecond epoch (parquet TIMESTAMP(NANOS) read under
      spark.sql.legacy.parquet.nanosAsLong) — exact integer division to
      micros; float division would lose precision above 2^53 ns.
    - TimestampNTZType: micros wall-time. With the session timezone pinned
      to UTC the cast is wall-time == instant, the same epoch DuckDB
      assigns the naive value — and downstream ops (unix_micros,
      session_window, withWatermark) require TimestampType.
    """
    dt = df.schema[ts_col].dataType
    if isinstance(dt, LongType):
        return df.withColumn(
            ts_col, F.expr(f"timestamp_micros({ts_col} DIV 1000)")
        )
    if isinstance(dt, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


# Catalog schema cache: the metastore role for the flat parquet catalog
# (the same metadata a Delta/Iceberg manifest carries — snapshots.py
# records table schemas in its manifests for exactly this reason). A
# bare ``spark.read.parquet`` infers the schema from a footer on EVERY
# call — measured 90-145 ms of driver work per load_table at sf0.1,
# paid on each of the hundreds of query builds per bench pass — while a
# schema-pinned read costs ~40 ms. Keyed by resolved path; the testdata
# (and any generated scale dir) is write-once, the same staleness
# contract a real metastore has. Schema METADATA only — never rows.
_SCHEMA_CACHE: dict[str, object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table, applying per-table normalization."""
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # the nanos conf must be live BEFORE inference: the cached
        # schema records ts as the nanosecond LONG the legacy flag
        # yields, and normalize_event_ts dispatches on that dtype
        _ensure_nanos_conf(spark)
    key = os.path.abspath(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    if name == "events":
        return normalize_event_ts(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view (normalized), so both
    the DataFrame API and ``spark.sql`` see the same relations."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
