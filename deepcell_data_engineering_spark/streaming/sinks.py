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
