"""Streaming window operators (SURVEY §2.6).

The reference's slice operator IS a window: ``slice_overlap=0`` is a
tumbling window, overlap > 0 a sliding window (slice_utils.py:56-62); the
engine exposes the real Structured Streaming forms over event-time data.
Every helper here is source-agnostic: pass a batch DataFrame and it runs
as a batch agg; pass a streaming DataFrame (readStream) and the identical
plan runs incrementally — that's the batch/stream parity the tests pin.

Watermarks bound state for late data: the reference's "missing annotation
tolerated as blank" (io_utils.py:215-218) is the batch shadow of a
drop-late policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-(window, event_type) counts and value sums — the tumbling
    analog of the slice operator with slice_overlap=0."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sv"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "cnt",
            "sv",
        )
    )


def sliding_counts(
    df: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding window (slice with overlap = window_len - slide)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_len, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "cnt",
        )
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per key (engine-only addition; the reference has
    no session concept — SURVEY §2.6 last row)."""
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            key_col,
            "cnt",
        )
    )


def dedup_events(
    df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup within the watermark horizon — the streaming
    twin of exact_dup_groups. In batch mode it's dropDuplicates."""
    key_cols = key_cols or ["event_id"]
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)
    return df.dropDuplicates(key_cols)


def read_events_stream(spark, sf_dir: str) -> DataFrame:
    """Open the events table as a file stream (one-file source dir); used
    with trigger(availableNow=True) for deterministic replay in tests.

    events.ts arrives as either nanosecond LONG or TIMESTAMP_NTZ depending
    on the testdata generation; normalize_event_ts (shared with the batch
    reader in catalog.py) converts both to TimestampType so withWatermark
    works on either encoding.
    """
    from deepcell_data_engineering_spark.catalog import (
        _ensure_nanos_conf,
        normalize_event_ts,
    )

    _ensure_nanos_conf(spark)
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the file-stream source requires a directory; point it at sf_dir and
    # glob-filter to the events file
    stream = (
        spark.readStream.schema(batch.schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return normalize_event_ts(stream)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    suffix: str = "_r",
) -> DataFrame:
    """Stream-stream interval join: pair each left event with the right
    events of the same key arriving within (left_ts, left_ts + max_delay]
    — the attribution shape (click -> purchase). Source-agnostic: on
    batch inputs the identical plan is a plain range-predicate join; on
    streams both sides take the watermark and Spark bounds the join
    state to watermark + max_delay per key.

    Scale: the equi-key keeps this a hash join on ``key`` (the range
    predicate is a post-join filter on co-partitioned rows), never a
    cross product.
    """
    if left.isStreaming:
        left = left.withWatermark(left_ts, watermark)
    if right.isStreaming:
        right = right.withWatermark(right_ts, watermark)
    r = right.select(
        F.col(key).alias(f"__k{suffix}"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[
            F.col(c).alias(f"{c}{suffix}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
    cond = (
        (F.col(key) == F.col(f"__k{suffix}"))
        & (F.col(f"{right_ts}{suffix}") > F.col(left_ts))
        & (
            F.col(f"{right_ts}{suffix}")
            <= F.col(left_ts) + F.expr(f"INTERVAL {max_delay}")
        )
    )
    return left.join(r, cond, "inner").drop(f"__k{suffix}")


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    dim_cols: list[str] | None = None,
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to
    each event. The static side re-resolves per micro-batch (so a dim
    table refreshed in place is picked up) and is broadcast — the only
    join strategy that adds zero state and zero shuffle to the stream.
    Source-agnostic like every helper here: on batch inputs the same
    plan is a plain broadcast hash join."""
    cols = dim_cols if dim_cols is not None else [
        c for c in dim.columns if c != key
    ]
    return stream.join(
        F.broadcast(dim.select(key, *cols)), key, "left"
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """State-bounded streaming deduplication: dropDuplicatesWithinWatermark
    keeps a key's state only until the watermark passes it, so the dedup
    state is O(keys per watermark window) instead of O(all keys ever) —
    the production form of stream dedup (plain dropDuplicates grows
    state forever on an unbounded key space). Duplicates arriving within
    the watermark interval of the first occurrence are dropped; on batch
    inputs this degrades to plain dropDuplicates over the keys."""
    if not stream.isStreaming:
        return stream.dropDuplicates(keys)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
