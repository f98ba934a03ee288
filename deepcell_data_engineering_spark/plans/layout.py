"""Physical data layout strategies: bucketing and skew salting.

At 100 TB the difference between a co-located join and a shuffled join is
the job. Two tools:

- **Bucketing** (`write_bucketed` / `read_bucketed`): persist both join
  sides bucketed+sorted on the join key; Spark's scan then reports the
  bucket spec and the sort-merge join runs without either side
  re-shuffling (`count_exchanges == 0` — asserted in tests). This is the
  engine's answer to the reference's per-experiment directory layout:
  the hot join keys (fov, exp_id, doc fingerprint) are bucket keys.

- **Salting** (`salted_join`): for skewed keys (one fov with 100x the
  crops, one band hash holding half the corpus), split each hot key into
  ``n_salts`` sub-keys: the big side gets a deterministic salt from a
  hash of a high-cardinality disambiguator column, the small side is
  exploded across all salts. The join stays an equi join on
  (key, salt) — skew spread across n_salts tasks at the cost of
  replicating the small side n_salts times. AQE's skew-join handles the
  moderate cases automatically (enabled in session.py); salting is for
  the pathological ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (+sorted) managed table. Both sides of a
    recurring join written with the same (cols, n_buckets) join without
    any exchange."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def spread(
    df: DataFrame,
    fanout: int = 32,
    min_bytes_per_task: int = 256 * 1024,
) -> DataFrame:
    """Widen a narrow scan before a high-fan-out operator (explode,
    per-row hashing, flatMap-style UDF). A small parquet file arrives as
    ONE input partition; an explode that multiplies work 100-1000x then
    runs on one core. One cheap round-robin shuffle of the PRE-fan-out
    rows spreads the expensive downstream work across the cluster.

    Work-aware: the target task count is estimated from the optimizer's
    size statistics times ``fanout`` (the caller's work multiplier), so a
    40-row verification subset is NOT shuffled into 32 near-empty tasks
    while a full-corpus shingle explode is. No-op when the input is
    already wide enough or the estimated work is below one task's worth."""
    sess = df.sparkSession
    max_tasks = sess.sparkContext.defaultParallelism
    try:
        size_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        size_bytes = min_bytes_per_task * max_tasks  # unknown: assume big
    target = min(max_tasks, max(1, (size_bytes * fanout) // min_bytes_per_task))
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(int(target))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join. ``salt_source`` is a high-cardinality
    column on the big side (e.g. the row's unique id); its hash spreads
    each hot key across ``n_salts`` sub-keys deterministically. The small
    side is replicated across all salts with one explode.

    Only ``inner`` and ``left`` are allowed: the big side carries exactly
    one salt per row so those joins are row-for-row equivalent to the
    unsalted join, while right/full outer would emit one null-extended
    row per salt for unmatched small-side keys (n_salts-fold inflation).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how='inner'/'left', got {how!r}")
    big_salted = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(salt_source)), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        big_salted.join(small_salted, on=[key, "_salt"], how=how).drop("_salt")
    )


def zvalue(cols: list, bits: int = 16) -> F.Column:
    """Morton (Z-order) index of up to ~4 integer columns (names or
    Columns): each value is rank-agnostically clamped into ``bits``
    bits and the bits of all columns are interleaved (bit b of cols[i]
    lands at position b*len(cols)+i), so rows close in EVERY dimension
    get close z-values. Pure bit arithmetic — codegen'd, no UDF. The
    SQL dual lives in functions/layout.py:zorder_sql (one generator
    shared by the x60 and x103 oracles)."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            col = c if not isinstance(c, str) else F.col(c)
            bit = F.shiftright(col.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i).cast("long"))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Multi-dimensional clustering for scan pruning — the layout move
    behind Delta/Iceberg OPTIMIZE ZORDER BY, expressed with vanilla
    Spark: range-partition + sort by the interleaved z-value, then write
    parquet. Every file then covers a tight hyper-rectangle in ALL
    ``cols``, so parquet row-group min/max stats prune a filter on ANY
    of them — a plain sort clusters only the leading column and prunes
    nothing for the second.

    The z column is dropped before writing; it exists only to drive the
    physical row order."""
    zc = zvalue(cols, bits=bits)
    (
        df.withColumn("_z", zc)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction — the operational chore every long-lived
    100 TB table needs: streaming/incremental writers leave thousands of
    KB-sized files per partition, and both the file-listing phase and
    the per-file open cost then dominate scans. Rewrites the dataset
    into ~``target_file_bytes`` files (sized from the ACTUAL on-disk
    bytes, not row counts, so compression ratio is accounted for).
    Returns the output file count."""
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    n_files = max(1, round(total / target_file_bytes))
    df = spark.read.parquet(path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def write_sorted(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int | None = None
) -> None:
    """Range-partition + sort-within-partitions before writing, so each
    parquet file covers a narrow, non-overlapping slice of the sort key
    and every row group's min/max statistics become selective — a point
    or range predicate on the key then prunes whole files (and row
    groups within them) at planning time instead of scanning. The
    single-dimension sibling of zorder_write (use that when two+
    columns need locality at once)."""
    out = df.repartitionByRange(*sort_cols) if n_files is None else df.repartitionByRange(n_files, *sort_cols)
    out.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)
