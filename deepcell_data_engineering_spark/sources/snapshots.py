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
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_path(table_path: str, version: int) -> str:
    return os.path.join(
        table_path, _MANIFEST_DIR, f"v{version:06d}.json"
    )


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
    the txn log's retention independent of data vacuuming.)
    """
    if mode not in ("append", "overwrite", "replace"):
        raise ValueError(f"mode must be append|overwrite|replace, got {mode!r}")
    parent = current_version(table_path)
    if batch_id is not None and parent is not None:
        for v in range(parent + 1):
            path = _manifest_path(table_path, v)
            if os.path.exists(path):
                m = _load_manifest(table_path, v)
                if m.get("batch_id") == batch_id:
                    return v
    version = 0 if parent is None else parent + 1
    commit_dir = os.path.join(
        table_path, _DATA_DIR, f"c{version:06d}-{uuid.uuid4().hex[:8]}"
    )
    df.write.parquet(commit_dir)

    dirs = [os.path.relpath(commit_dir, table_path)]
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
    os.makedirs(os.path.join(table_path, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(table_path, version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, _manifest_path(table_path, version))
    return version


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
