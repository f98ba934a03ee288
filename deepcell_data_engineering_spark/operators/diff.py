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
