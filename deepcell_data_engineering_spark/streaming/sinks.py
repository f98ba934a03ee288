"""Streaming sinks with exactly-once effect.

Structured Streaming guarantees at-least-once delivery to foreachBatch:
after a crash the last epoch is REPLAYED, so a naive append sink
duplicates it. The standard fix is an idempotent write keyed by the
epoch id — replaying an epoch overwrites exactly its own output and
nothing else. With dynamic partition overwrite the whole property comes
from the file layout; no transaction log, no read-modify-write, and the
sink stays an embarrassingly parallel parquet write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPOCH_COL = "_epoch"


def write_epoch_idempotent(batch_df: DataFrame, epoch_id: int, path: str) -> None:
    """foreachBatch body: land one epoch's rows under its own partition,
    overwriting any previous (partial or replayed) attempt of the SAME
    epoch while leaving every other epoch untouched."""
    (
        batch_df.withColumn(EPOCH_COL, F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(EPOCH_COL)
        .parquet(path)
    )


def start_idempotent_parquet_sink(
    stream: DataFrame, path: str, checkpoint: str, trigger_once: bool = True
):
    """Wire a streaming DataFrame to the idempotent parquet sink.
    ``trigger_once`` drains the available input and stops — the batch
    way to run a streaming pipeline incrementally (cron-driven catch-up
    runs share the checkpoint and never duplicate an epoch)."""
    w = (
        stream.writeStream.foreachBatch(
            lambda df, eid: write_epoch_idempotent(df, eid, path)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def start_incremental_agg(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    aggs: list,
    trigger_once: bool = True,
):
    """Streaming incremental view maintenance: each micro-batch reduces
    to its partial aggregate STATE (tiny — one row per touched group)
    and lands under its epoch partition via the idempotent sink, so the
    history of the stream is stored as additive state deltas, not raw
    events. Crash replays overwrite their own epoch: exactly-once
    maintenance from an at-least-once channel.

    Read the maintained aggregate back with ``maintained_agg`` — a fold
    over the (small) delta states, never over raw history."""

    def land(batch_df: DataFrame, epoch_id: int) -> None:
        delta = batch_df.groupBy(*keys).agg(*aggs)
        write_epoch_idempotent(delta, epoch_id, path)

    w = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def maintained_agg(
    spark, path: str, keys: list[str], sum_cols: list[str]
) -> DataFrame:
    """Current value of an incrementally-maintained aggregate: merge all
    epoch delta states by addition (functions/stats.py posture — states
    of count/sum aggregates are additive)."""
    state = spark.read.parquet(path).drop(EPOCH_COL)
    return state.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )
