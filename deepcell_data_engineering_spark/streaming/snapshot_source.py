"""Structured Streaming SOURCE over the snapshot log — stream a
lakehouse table's commits as micro-batches (Delta's streaming-source
surface: ``spark.readStream.format("delta")``), built on the Spark 4
Python DataSource streaming API.

Offsets ARE manifest versions: the reader's offset {"version": N}
means "commits < N consumed", ``latestOffset`` is one KB-sized log
listing, and ``partitions(start, end)`` plans ONE input partition per
data file of each commit's INSERT delta — so executors read parquet in
parallel (pyarrow, no driver fan-in; this is the partitioned
``DataSourceStreamReader``, not the driver-side simple reader) and a
checkpoint restore replays exactly the same [start, end) slice from
the immutable manifests, which is the exactly-once recovery contract.

Per-commit delta semantics mirror :func:`...sources.snapshots
.read_changes`'s insert side (what a downstream APPEND consumer
ingests):

- ``append``  -> the commit's new directories' rows
- ``merge`` / ``update`` -> the persisted change set's INSERT rows
  (update postimages + new keys; preimages/deletes are not emitted —
  this source streams arrivals, a fold consumer uses read_changes)
- ``delete`` -> nothing
- ``overwrite`` / ``restore`` / ``clone`` / ``replace`` -> ERROR by
  default (a truncate-and-reload cannot be represented as appends —
  Delta's streaming source fails the same way); pass
  ``ignore_changes=true`` to skip them (Delta's ignoreDeletes/
  ignoreChanges posture).

Every emitted row carries ``_commit_version`` (BIGINT) provenance.

Options: ``path`` (table root, driver-visible POSIX — the manifest
plane of object-store tables streams through a mounted path),
``starting_version`` (default 0 — stream history then tail),
``ignore_changes`` (default false).

Reference analog: the reference's pipelines re-list job directories to
find new artifacts (caliban_toolbox/log_file_creation.py's manifest
polling); this replaces polling with log-offset streaming.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_DIR = "_manifests"

_ARROW_DDL = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32[day]": "date",
}


def _manifest(path: str, version: int) -> dict:
    with open(
        os.path.join(path, _MANIFEST_DIR, f"v{version:06d}.json"), "rb"
    ) as fh:
        return json.loads(fh.read())


def _current_version(path: str) -> int | None:
    try:
        names = os.listdir(os.path.join(path, _MANIFEST_DIR))
    except FileNotFoundError:
        return None
    versions = [
        int(f[1:7])
        for f in names
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _parquet_files(dirpath: str) -> list[str]:
    return sorted(
        os.path.join(dirpath, f)
        for f in os.listdir(dirpath)
        if f.endswith(".parquet")
    )


def _insert_files(path: str, version: int, ignore_changes: bool):
    """(kind, files) for one commit's INSERT delta: kind 'data' reads
    every column, 'changes' filters _change_type == 'insert' and drops
    the change columns."""
    m = _manifest(path, version)
    op = m["op"]
    if op == "append":
        parent = (
            set(_manifest(path, m["parent"])["dirs"])
            if m["parent"] is not None
            else set()
        )
        files = [
            f
            for d in m["dirs"]
            if d not in parent
            for f in _parquet_files(os.path.join(path, d))
        ]
        return "data", files
    if op in ("merge", "update"):
        return "changes", _parquet_files(
            os.path.join(path, m["change_dir"])
        )
    if op == "delete":
        return "data", []
    if ignore_changes:
        return "data", []
    raise ValueError(
        f"snapshot stream at {path!r} hit a non-append commit "
        f"(version {version}, op {op!r}) — a truncate-and-reload "
        "cannot stream as appends; pass ignore_changes=true to skip "
        "such commits, or consume read_changes for a fold"
    )


class _FilePartition(InputPartition):
    def __init__(self, file: str, kind: str, version: int) -> None:
        self.file = file
        self.kind = kind
        self.version = version


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]
        self.start_version = int(options.get("starting_version", "0"))
        self.ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )
        self.fields = _data_fields(self.path)

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        cur = _current_version(self.path)
        nxt = self.start_version if cur is None else cur + 1
        return {"version": max(nxt, self.start_version)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        parts: list[_FilePartition] = []
        for v in range(int(start["version"]), int(end["version"])):
            kind, files = _insert_files(self.path, v, self.ignore_changes)
            parts.extend(_FilePartition(f, kind, v) for f in files)
        return parts

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        names = [n for n, _ in self.fields]
        pf = pq.ParquetFile(partition.file)
        have = set(pf.schema_arrow.names)
        want = [n for n in names if n in have]
        extra = (
            ["_change_type"]
            if partition.kind == "changes" and "_change_type" in have
            else []
        )
        for batch in pf.iter_batches(columns=want + extra):
            cols = {n: batch.column(i).to_pylist() for i, n in enumerate(want + extra)}
            keep = (
                [t == "insert" for t in cols["_change_type"]]
                if extra
                else [True] * batch.num_rows
            )
            for i in range(batch.num_rows):
                if keep[i]:
                    # NULL-pad columns this file predates (schema
                    # evolution), exactly like read_changes
                    yield tuple(
                        cols[n][i] if n in cols else None for n in names
                    ) + (partition.version,)

    def commit(self, end: dict) -> None:
        # offsets are durable manifest versions; nothing to clean up
        pass


def _data_fields(path: str) -> list[tuple[str, str]]:
    """(name, ddl_type) for the table's CURRENT schema, from the
    newest commit's parquet footers (one footer read — KB)."""
    import pyarrow.parquet as pq

    cur = _current_version(path)
    if cur is None:
        raise ValueError(f"no committed versions at {path!r}")
    m = _manifest(path, cur)
    fields: dict[str, str] = {}
    for d in m["dirs"]:
        files = _parquet_files(os.path.join(path, d))
        if not files:
            continue
        schema = pq.ParquetFile(files[0]).schema_arrow
        for f in schema:
            t = str(f.type)
            if t.startswith("timestamp"):
                ddl = "timestamp"
            elif t.startswith("decimal"):
                ddl = t.replace("decimal128", "decimal")
            else:
                ddl = _ARROW_DDL.get(t)
            if ddl is None:
                raise ValueError(
                    f"snapshot stream cannot map parquet type {t!r} "
                    f"of column {f.name!r} to DDL"
                )
            fields.setdefault(f.name, ddl)
    return list(fields.items())


class SnapshotStreamDataSource(DataSource):
    """``spark.readStream.format("snapshot_stream").option("path", t)``
    — micro-batches are the table's commits (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_stream"

    def schema(self) -> str:
        fields = _data_fields(self.options["path"])
        return ", ".join(
            [f"{n} {t}" for n, t in fields] + ["_commit_version bigint"]
        )

    def streamReader(self, schema) -> SnapshotStreamReader:
        return SnapshotStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration; by-value pickling because the source
    is instantiated in a separate Python process that may not have
    this package on sys.path (the x97/pydatasource rule)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SnapshotStreamDataSource)
