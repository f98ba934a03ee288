"""Manifest-based snapshot versioning over parquet — time travel.

The lakehouse pattern (Delta/Iceberg's core) reduced to its invariant:
a table is a LOG OF MANIFESTS, each a tiny JSON naming the immutable
data directories that make up one version. Writers add data under a
fresh per-commit directory and publish the manifest LAST (write-then-
rename), so a concurrent reader either sees the previous version or
the complete new one — never a half-written table. Readers resolve a
version number to a file list on the driver (the manifest is KB-sized
catalog state, the one thing that SHOULD be driver-side) and scan the
data distributed as usual.

What this buys at 100 TB:
- append = write only the delta's files + one manifest; no rewrite of
  history, no read-modify-write of data.
- time travel = read any retained manifest; reproducing last week's
  training set is a pointer lookup, not a restore.
- compaction commits (op='replace') swap small files for big ones
  WITHOUT changing content: old versions keep referencing the old
  directories, so a long-running job pinned to v3 is undisturbed.
- vacuum deletes only directories unreferenced by every retained
  manifest — physical cleanup decoupled from logical history.

Reference analog: the reference tracks dataset builds by overwriting
NPZ artifacts keyed by filename (caliban_toolbox/build_utils.py's
combined-NPZ convention) — no history, no atomicity; this module is
the warehouse-grade replacement for that pointer-by-filename scheme.

Concurrency: manifests are published with a PUT-IF-ABSENT primitive
(``os.link`` from a fully-written temp file — atomic and fails with
EEXIST if the version was taken). A writer that loses the race
re-reads the new parent and retries against the next version, so no
commit is ever silently overwritten — the Delta/Iceberg optimistic-
concurrency loop. ``SnapshotConflictError`` surfaces only after the
retry budget is exhausted.

Scope: the manifest LOG lives on a driver-visible POSIX filesystem
(the data files go through Spark's Hadoop FS as usual). Schemed table
paths (``hdfs://``, ``s3a://``) are rejected up front — porting the
log to an object store needs a conditional-put primitive this module
deliberately does not fake.

Log compaction: every ``_CHECKPOINT_INTERVAL`` commits a checkpoint
file folds the batch-id dedup set, so exactly-once replay checks read
O(interval) manifests instead of O(versions) — the Delta
``_last_checkpoint`` pattern.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
_CHECKPOINT_INTERVAL = 10
_COMMIT_RETRIES = 64


class SnapshotConflictError(RuntimeError):
    """A concurrent writer kept winning the manifest publish race."""


def _check_local(table_path: str) -> None:
    if "://" in table_path:
        raise ValueError(
            "snapshot tables require a driver-visible POSIX path; got "
            f"{table_path!r} — the manifest log uses local atomic-link "
            "publishes, not an object-store conditional put"
        )


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(
        table_path, _MANIFEST_DIR, f"v{version:06d}.json"
    )


def _checkpoint_path(table_path: str, version: int) -> str:
    # 'ckpt-' prefix keeps checkpoints out of current_version's
    # v*.json listing filter.
    return os.path.join(
        table_path, _MANIFEST_DIR, f"ckpt-v{version:06d}.json"
    )


def _latest_checkpoint(table_path: str, upto: int) -> dict | None:
    """Newest checkpoint at or below ``upto``, or None."""
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    best = -1
    for f in os.listdir(mdir):
        if f.startswith("ckpt-v") and f.endswith(".json"):
            v = int(f[6:12])
            if best < v <= upto:
                best = v
    if best < 0:
        return None
    with open(_checkpoint_path(table_path, best)) as fh:
        return json.load(fh)


def _batch_id_seen(table_path: str, parent: int, batch_id: int) -> int | None:
    """Version whose manifest carries ``batch_id``, scanning backward
    only to the nearest checkpoint (whose folded set covers the rest).
    O(checkpoint interval) manifest reads, not O(versions)."""
    ckpt = _latest_checkpoint(table_path, parent)
    floor = ckpt["version"] + 1 if ckpt else 0
    for v in range(floor, parent + 1):
        path = _manifest_path(table_path, v)
        if os.path.exists(path):
            m = _load_manifest(table_path, v)
            if m.get("batch_id") == batch_id:
                return v
    if ckpt is not None:
        hit = ckpt["batch_ids"].get(str(batch_id))
        if hit is not None:
            return hit
    return None


def _write_checkpoint(table_path: str, version: int) -> None:
    """Fold the batch-id set up to ``version`` into a checkpoint file.

    Best-effort (a lost checkpoint only costs extra manifest reads);
    published via the same link-if-absent primitive so concurrent
    checkpointers of the same version are harmless."""
    prev = _latest_checkpoint(table_path, version)
    batch_ids: dict[str, int] = dict(prev["batch_ids"]) if prev else {}
    start = prev["version"] + 1 if prev else 0
    for v in range(start, version + 1):
        path = _manifest_path(table_path, v)
        if os.path.exists(path):
            m = _load_manifest(table_path, v)
            if "batch_id" in m:
                batch_ids[str(m["batch_id"])] = v
    ckpt = {"version": version, "batch_ids": batch_ids}
    final = _checkpoint_path(table_path, version)
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(ckpt, fh)
    try:
        os.link(tmp, final)
    except FileExistsError:
        pass
    finally:
        os.unlink(tmp)


def current_version(table_path: str) -> int | None:
    """Latest committed version, or None for an empty/absent table."""
    mdir = os.path.join(table_path, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(f[1:7])
        for f in os.listdir(mdir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _load_manifest(table_path: str, version: int) -> dict:
    path = _manifest_path(table_path, version)
    if not os.path.exists(path):
        raise ValueError(
            f"version {version} does not exist (or was vacuumed) at "
            f"{table_path!r}"
        )
    with open(path) as fh:
        return json.load(fh)


def commit(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    batch_id: int | None = None,
) -> int:
    """Write ``df`` as a new table version and return its number.

    ``mode='append'``: the new version references every parent data
    directory plus this commit's. ``mode='overwrite'``: references only
    this commit's (logical truncate-and-load; old data stays on disk
    for time travel until vacuumed). ``mode='replace'``: like
    overwrite, but marks the commit as a content-preserving rewrite
    (compaction) — semantics identical, the op label documents intent
    in the log.

    Data lands under a fresh uuid directory, the manifest is written
    to a temp name and atomically renamed into the log — readers never
    observe a version whose data is incomplete.

    ``batch_id``: the exactly-once hook for streaming foreachBatch
    sinks. A commit whose batch_id already appears in a retained
    manifest is a NO-OP returning that manifest's version — replaying
    a micro-batch after a failed epoch cannot double its rows. (The
    dedup window is the retained manifest log; production systems keep
    the txn log's retention independent of data vacuuming. Checkpoints
    fold the seen set, so the check reads O(interval) manifests.)

    Concurrent writers: the manifest is published link-if-absent; on
    EEXIST the loser re-reads the new parent (re-deriving the append
    dir list and re-running the batch_id dedup against the winner's
    commits) and retries with the next version number. The data
    directory is written once, outside the retry loop.
    """
    if mode not in ("append", "overwrite", "replace"):
        raise ValueError(f"mode must be append|overwrite|replace, got {mode!r}")
    _check_local(table_path)
    parent = current_version(table_path)
    if batch_id is not None and parent is not None:
        seen = _batch_id_seen(table_path, parent, batch_id)
        if seen is not None:
            return seen
    commit_dir = os.path.join(
        table_path, _DATA_DIR, f"c{uuid.uuid4().hex[:12]}"
    )
    df.write.parquet(commit_dir)
    rel_dir = os.path.relpath(commit_dir, table_path)
    os.makedirs(os.path.join(table_path, _MANIFEST_DIR), exist_ok=True)

    for _ in range(_COMMIT_RETRIES):
        version = 0 if parent is None else parent + 1
        dirs = [rel_dir]
        if mode == "append" and parent is not None:
            dirs = _load_manifest(table_path, parent)["dirs"] + dirs
        manifest = {
            "version": version,
            "parent": parent,
            "op": mode,
            "dirs": dirs,
        }
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        final = _manifest_path(table_path, version)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, final)
        except FileExistsError:
            os.unlink(tmp)
            # Lost the race: adopt the winner's commit as parent.
            parent = current_version(table_path)
            if batch_id is not None and parent is not None:
                seen = _batch_id_seen(table_path, parent, batch_id)
                if seen is not None:
                    return seen
            continue
        os.unlink(tmp)
        if (version + 1) % _CHECKPOINT_INTERVAL == 0:
            _write_checkpoint(table_path, version)
        return version
    raise SnapshotConflictError(
        f"could not publish a manifest at {table_path!r} after "
        f"{_COMMIT_RETRIES} attempts — a concurrent writer kept winning"
    )


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """The table as of ``version`` (default: latest). One distributed
    parquet scan over exactly the directories that version's manifest
    names — partition pruning, pushdown and column pruning all apply
    as on any parquet read.

    ``merge_schema=True``: reconcile schema EVOLUTION across commits
    (a column added in a later append reads as NULL for older
    directories) — the footer-union pass costs one footer read per
    file, so leave it off for tables whose schema is known stable."""
    _check_local(table_path)
    if version is None:
        version = current_version(table_path)
        if version is None:
            raise ValueError(f"no committed versions at {table_path!r}")
    m = _load_manifest(table_path, version)
    if not m["dirs"]:
        raise ValueError(f"version {version} references no data")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(
        *[os.path.join(table_path, d) for d in m["dirs"]]
    )


def optimize_table(
    spark: SparkSession,
    table_path: str,
    target_file_bytes: int = 128 << 20,
) -> int:
    """OPTIMIZE as a snapshot operation: rewrite the current version
    with right-sized files and publish it as a ``replace`` commit.
    Returns the new version (or the current one if the table already
    has no more files than the byte target warrants).

    This is the atomic swap ``corpus.compact_corpus`` explicitly
    punts to "the catalog layer": readers resolve manifests, so they
    see pre- or post-compaction state atomically; time travel to the
    pre-compaction version keeps reading the old directories; vacuum
    later reclaims them once unreferenced. A crash between the data
    write and the manifest publish leaves an orphan directory the next
    vacuum removes — the old version stays intact (manifest-written-
    last).

    Sizing mirrors compact_corpus: a footer-only pass (the hidden
    ``_metadata`` columns, computed by the executors) totals bytes and
    files; the rewrite repartitions to ceil(bytes / target) tasks.
    Only the two scalar totals hit the driver."""
    _check_local(table_path)
    if current_version(table_path) is None:
        raise ValueError(f"no committed versions at {table_path!r}")
    df = read_snapshot(spark, table_path)
    n_files, total_bytes = (
        df.groupBy(F.col("_metadata.file_path").alias("fp"))
        .agg(F.first(F.col("_metadata.file_size")).alias("sz"))
        .agg(
            F.count(F.lit(1)).cast("long"),
            F.coalesce(F.sum("sz"), F.lit(0)).cast("long"),
        )
        .collect()[0]
    )
    n_target = max(1, -(-int(total_bytes) // int(target_file_bytes)))
    if n_target >= n_files:
        return current_version(table_path)
    return commit(
        spark, df.repartition(n_target), table_path, mode="replace"
    )


def history(table_path: str) -> list[dict]:
    """The commit log, oldest first: version, parent, op, n_dirs."""
    latest = current_version(table_path)
    if latest is None:
        return []
    out = []
    for v in range(latest + 1):
        path = _manifest_path(table_path, v)
        if not os.path.exists(path):
            out.append({"version": v, "vacuumed": True})
            continue
        m = _load_manifest(table_path, v)
        out.append(
            {
                "version": v,
                "parent": m["parent"],
                "op": m["op"],
                "n_dirs": len(m["dirs"]),
            }
        )
    return out


def vacuum(table_path: str, keep_last: int = 1) -> list[str]:
    """Physically delete data directories unreferenced by the newest
    ``keep_last`` manifests, and drop the older manifests. Returns the
    deleted directory names. Time travel to vacuumed versions raises;
    retained versions are untouched — the deletion set is computed
    from what the RETAINED manifests reference, never from age or
    naming conventions."""
    import shutil

    _check_local(table_path)
    latest = current_version(table_path)
    if latest is None:
        return []
    keep_versions = [
        v
        for v in range(max(0, latest - keep_last + 1), latest + 1)
        if os.path.exists(_manifest_path(table_path, v))
    ]
    referenced: set[str] = set()
    for v in keep_versions:
        referenced.update(_load_manifest(table_path, v)["dirs"])
    data_root = os.path.join(table_path, _DATA_DIR)
    removed = []
    for d in sorted(os.listdir(data_root)):
        rel = os.path.join(_DATA_DIR, d)
        if rel not in referenced:
            shutil.rmtree(os.path.join(data_root, d))
            removed.append(rel)
    for v in range(0, keep_versions[0] if keep_versions else 0):
        path = _manifest_path(table_path, v)
        if os.path.exists(path):
            os.remove(path)
    return removed
