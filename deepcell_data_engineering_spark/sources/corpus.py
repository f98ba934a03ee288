"""Text-corpus interchange connectors (JSONL / CSV).

Parquet is the engine's native format (columnar, predicate pushdown,
partition pruning — see catalog.py); JSONL is the lingua franca LLM
corpora actually arrive in, and CSV still carries metadata sidecars.
These wrappers pin the two rules that matter at 100 TB:

- ALWAYS pass an explicit schema on read. Schema inference is a full
  extra pass over the data before the real job starts, and a sampled
  inference can silently widen/narrow types between runs.
- Line-based formats split by newline, so a .jsonl file parallelizes
  across tasks even uncompressed; gzip is NOT splittable (one task per
  file) — prefer many medium files or zstd-in-parquet for the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DOCUMENTS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    """One JSON object per line; files per task (no coalesce(1) — a
    single-file write serializes the whole job through one task)."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str = DOCUMENTS_SCHEMA
) -> DataFrame:
    """Schema-pinned JSONL read; corrupt lines land in a quarantine
    column instead of failing the job (PERMISSIVE + columnNameOfCorrupt
    is the posture for web-scale corpora where some lines are bad)."""
    return (
        spark.read.schema(schema + ", _corrupt STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("escape", '"')
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("escape", '"')
        .csv(path)
    )


def write_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """ORC interchange sink — the other columnar format warehouse
    estates standardize on; like parquet it carries an embedded schema,
    column statistics, and predicate-pushdown support, so reads stay
    scan-pruned. Files per task (never coalesce(1))."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read; the embedded schema makes an explicit one optional
    (unlike JSONL/CSV there is no inference pass to avoid)."""
    return spark.read.orc(path)


def write_corpus_partitioned(
    df: DataFrame, path: str, partition_cols: tuple[str, ...] = ("lang",)
) -> None:
    """The production corpus layout: hive-partitioned parquet keyed by
    the columns pipelines filter on first (language, source, date...).
    A reader filtering on a partition column touches ONLY that
    partition's directories (partition pruning happens at file-listing
    time, before any I/O) — at 100 TB the difference between scanning
    one language and scanning the world."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_corpus_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "doc") -> None:
    """Spark 4's built-in XML sink (one <rowTag> element per row) — the
    interchange format crawl dumps and legacy feeds actually arrive in.
    Files per task, same as the other writers."""
    df.write.mode("overwrite").format("xml").option("rowTag", row_tag).save(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "doc", schema=None
) -> DataFrame:
    """Read XML with the documents schema by default; Spark's native XML
    reader (4.0+) parses inside the executors — no driver-side DOM."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    r = r.schema(schema if schema is not None else DOCUMENTS_SCHEMA)
    return r.load(path)


def layout_report(
    spark: SparkSession,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    small_file_bytes: int = 32 << 20,
) -> DataFrame:
    """Per-partition physical-layout accounting: (partition..., n_files,
    n_rows, total_bytes, n_small_files). Built from the scan's hidden
    ``_metadata`` columns — computed BY the executors reading footers,
    never a driver-side recursive listing (at 100 TB the listing itself
    is a distributed job). The small-file count is the compaction
    trigger: thousands of KB-sized files per partition turn scan
    scheduling and footer I/O into the bottleneck long before data
    volume does."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    per_file = df.groupBy(
        *partition_cols, F.col("_metadata.file_path").alias("__fp")
    ).agg(
        F.count(F.lit(1)).alias("rows"),
        F.first(F.col("_metadata.file_size")).alias("bytes"),
    )
    return per_file.groupBy(*partition_cols).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("rows").alias("n_rows"),
        F.sum("bytes").alias("total_bytes"),
        F.sum((F.col("bytes") < small_file_bytes).cast("int")).alias(
            "n_small_files"
        ),
    )


def compact_corpus(
    spark: SparkSession,
    path: str,
    out_path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    target_file_bytes: int = 128 << 20,
    slot_col: str = "doc_id",
) -> DataFrame:
    """Rewrite a hive-partitioned corpus with right-sized files: per
    partition, ceil(bytes / target_file_bytes) output files. Two
    passes: a footer-only sizing pass (the layout_report plan) builds
    a per-partition file-count plan, then the data pass broadcast-
    joins the plan, assigns each row a deterministic slot hash in
    [0, n_files), and repartitions on (partition_cols..., slot) so
    each partition's rows spread across exactly its planned task
    count (hash collisions between slots can only MERGE two planned
    files — never fragment).

    Writes to ``out_path``, NOT in place: Spark cannot overwrite a
    path it is lazily reading, and object-store "rename" is a copy —
    the atomic swap (pointer flip / directory rename) belongs to the
    catalog layer above. Returns the sizing plan for inspection."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    sizes = (
        df.groupBy(*partition_cols, F.col("_metadata.file_path").alias("__fp"))
        .agg(F.first(F.col("_metadata.file_size")).alias("bytes"))
        .groupBy(*partition_cols)
        .agg(F.sum("bytes").alias("bytes"))
    )
    plan = sizes.withColumn(
        "n_files",
        F.greatest(
            F.lit(1),
            F.ceil(F.col("bytes") / F.lit(float(target_file_bytes))),
        ).cast("int"),
    )
    # null-safe plan attach: a NULL partition value round-trips through
    # the hive layout (__HIVE_DEFAULT_PARTITION__ -> NULL on read) and
    # MUST match its own plan row — a plain equi-join would silently
    # drop every NULL-partition document from the rewrite
    right = F.broadcast(
        plan.select(
            *[F.col(c).alias(f"__pk_{c}") for c in partition_cols], "n_files"
        )
    )
    cond = None
    for c in partition_cols:
        eq = F.col(c).eqNullSafe(F.col(f"__pk_{c}"))
        cond = eq if cond is None else (cond & eq)
    out = (
        df.join(right, cond)
        .drop(*[f"__pk_{c}" for c in partition_cols])
        .withColumn(
            "__slot", F.pmod(F.xxhash64(F.col(slot_col)), F.col("n_files"))
        )
        .repartition(*[F.col(c) for c in partition_cols], F.col("__slot"))
        .drop("n_files", "__slot")
    )
    out.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_path)
    return plan
