"""Snapshot differencing — the CDC/incremental-build primitive.

A training-data pipeline is rebuilt against moving sources; the cheap
way to re-run downstream stages is to diff the new snapshot against the
previous one and propagate only changes. The diff is a single full
outer join on the key with a row-content hash comparison — no
per-column comparison explosion, and the hash is computed beside the
scan so only (key, hash) wide rows shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _row_hash(cols: list[str]) -> F.Column:
    # NUL separator + explicit null marker: concat_ws drops nulls, which
    # would make ('a', NULL) collide with ('a',); md5 over the marked
    # form is collision-safe for change detection.
    marked = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *marked))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key as 'added' / 'removed' / 'changed' between two
    snapshots (unchanged keys are dropped — the common case, so the
    output is small even when the snapshots are huge).

    Scale: both sides reduce to (keys, hash) before the join, so the
    shuffle moves two narrow relations; with bucketed snapshots the
    exchange disappears entirely (plans/layout.py). The join is a full
    outer on the snapshot key — co-partitioned, never broadcast unless
    one side is a small dimension."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, _row_hash(compare_cols).alias("__h_old"))
    n = new.select(*keys, _row_hash(compare_cols).alias("__h_new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*keys, "change_type")
    )


def snapshot_diff_with_payload(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """snapshot_diff plus the NEW row payload for added/changed keys —
    the form a downstream MERGE consumes. 'removed' rows carry NULL
    payload. Still narrow on the old side (keys + hash only); the new
    side's payload rides along because the consumer needs it anyway."""
    if compare_cols is None:
        compare_cols = [c for c in new.columns if c not in keys]
    o = old.select(*keys, _row_hash(compare_cols).alias("__h_old"))
    n = new.select(*keys, *compare_cols, _row_hash(compare_cols).alias("__h_new"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), F.lit("added"))
        .when(F.col("__h_new").isNull(), F.lit("removed"))
        .when(F.col("__h_old") != F.col("__h_new"), F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .where(F.col("change_type").isNotNull())
        .select(*keys, *compare_cols, "change_type")
    )


def apply_changes(
    base: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """MERGE-style upsert/delete: apply a change feed (the output of
    snapshot_diff_with_payload, or any CDC source with a change_type
    column) to a base snapshot. added/changed rows replace or extend the
    base; removed rows disappear. One left anti join (drop superseded/
    deleted keys) + one union — the canonical parquet-era merge; with
    both sides bucketed on the key the anti join is exchange-free.

    Invariant (pinned by the d48 oracle): apply_changes(old,
    snapshot_diff_with_payload(old, new)) == new."""
    payload_cols = [
        c for c in changes.columns if c not in ("change_type",)
    ]
    survivors = base.join(changes.select(*keys), keys, "left_anti")
    upserts = changes.where(F.col("change_type") != "removed").select(
        *[c for c in payload_cols if c in base.columns]
    )
    return survivors.unionByName(upserts)


def snapshot_diff_columns(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Full-outer diff with PER-COLUMN attribution — the audit-report
    companion to :func:`snapshot_diff` (which answers *what changed* as
    a narrow (key, change_type) feed): this one answers *which columns
    changed and by how much*, keeping unchanged keys so class counts
    reconcile to the snapshot sizes.

    Returns one row per key in either snapshot with ``diff_status``
    ('added' | 'removed' | 'changed' | 'unchanged'), one ``chg_<col>``
    boolean per compare column (null-safe: NULL -> value counts as a
    change), and the ``old_<col>`` / ``new_<col>`` values for delta
    arithmetic. Same scale shape as snapshot_diff: one full-outer hash
    join on the key (co-located and shuffle-free when both snapshots
    are bucketed by key) — but the payload columns ride through the
    shuffle, so prefer the hash-based snapshot_diff when the consumer
    only needs the change feed."""
    o = old.select(
        *key_cols,
        F.lit(1).alias("__in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(1).alias("__in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    j = o.join(n, key_cols, "full_outer")
    changed = F.lit(False)
    chg_cols = []
    for c in compare_cols:
        chg = ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        chg_cols.append(chg.alias(f"chg_{c}"))
        changed = changed | chg
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *key_cols,
        status.alias("diff_status"),
        *chg_cols,
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def scd2_apply(
    state: DataFrame | None,
    changes: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Incrementally fold a micro-batch of change events into an SCD
    TYPE-2 version table (the x101 schema plus the raw (ts, seq, value)
    change columns the fold itself needs).

    Per-key locality is the whole trick: only keys PRESENT in the batch
    rebuild their version chain — their state rows replay as change
    events, union the batch, and one partitioned window re-derives
    (version, valid_from, valid_to, is_current); every untouched key's
    rows pass through byte-identical. Work per batch is bounded by
    (touched keys x versions-per-key), never the history size, and
    out-of-order arrivals are absorbed exactly (a late event re-ranks
    its own key's chain only). tests/test_streaming.py pins
    fold-over-micro-batches == x101 batch rebuild."""
    from pyspark.sql import Window

    ev = changes.select(
        key,
        F.col(ts_col).alias("ts"),
        F.col(seq_col).cast("long").alias("seq"),
        F.col(value_col).alias("value"),
    )
    if state is not None:
        touched = ev.select(key).distinct()
        untouched = state.join(F.broadcast(touched), key, "left_anti")
        replay = state.join(F.broadcast(touched), key, "left_semi").select(
            key, "ts", "seq", "value"
        )
        ev = ev.unionByName(replay)
    w = Window.partitionBy(key).orderBy("ts", "seq")
    rebuilt = ev.select(
        key,
        "ts",
        "seq",
        "value",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.unix_micros("ts").cast("bigint").alias("valid_from_us"),
        F.unix_micros(F.lead("ts").over(w)).cast("bigint").alias(
            "valid_to_us"
        ),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
    if state is None:
        return rebuilt
    return untouched.unionByName(rebuilt)
