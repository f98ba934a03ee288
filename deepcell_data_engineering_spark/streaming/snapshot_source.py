"""Structured Streaming SOURCE over the snapshot log — stream a
lakehouse table's commits as micro-batches (Delta's streaming-source
surface: ``spark.readStream.format("delta")``), built on the Spark 4
Python DataSource streaming API.

Offsets are (manifest version, file index): the offset
``{"version": N, "index": K}`` means "commits < N fully consumed, plus
the first K files of commit N's sorted INSERT-delta file list".
``latestOffset`` is one KB-sized log listing, and
``partitions(start, end)`` plans ONE input partition per data file in
the offset range — so executors read parquet in parallel (pyarrow, no
driver fan-in; this is the partitioned ``DataSourceStreamReader``, not
the driver-side simple reader) and a checkpoint restore replays
exactly the same [start, end) slice from the immutable manifests,
which is the exactly-once recovery contract. (Offsets written by the
index-free r12 format, ``{"version": N}``, read as index 0.)

Rate control: ``max_files_per_batch`` bounds how many data files one
micro-batch admits (Delta's ``maxFilesPerTrigger``) — a huge backfill
commit drains as several bounded batches instead of one giant one,
splitting MID-COMMIT at file granularity. Use it with a processing-
time trigger (the continuous-tail production pattern); under
``trigger(availableNow=True)`` the engine fixes its target from the
FIRST bounded offset, so each availableNow run drains at most one
batch's budget then terminates (re-running continues from the
checkpoint — usable as an incremental batch job, but not a full
drain). The Python streaming API has
no admission-control hook (``latestOffset()`` takes no start), so the
reader self-tracks its position; restart safety comes from a LEARNED
committed floor: positions observed from the engine's own
``partitions(start, ...)``/``commit(end)`` calls establish a floor
below which files are never re-planned, while a fresh reader (floor
unset) replays a checkpointed range verbatim. A restarted rate-limited
query may plan one empty catch-up batch before resuming — never a
duplicate or dropped row.

Per-commit delta semantics mirror :func:`...sources.snapshots
.read_changes`'s insert side (what a downstream APPEND consumer
ingests):

- ``append``  -> the commit's new directories' rows
- any op whose ``parent`` is None -> ALL the commit's rows (the
  initial load: a table created by ``overwrite`` / ``clone`` is a
  starting snapshot, not a change — Delta's starting-snapshot batch)
- ``merge`` / ``update`` -> the persisted change set's INSERT rows
  (update postimages + new keys; preimages/deletes are not emitted —
  this source streams arrivals, a fold consumer uses read_changes)
- ``delete`` and metadata-only commits (``add_constraint`` /
  ``drop_constraint``) -> nothing
- later ``overwrite`` / ``restore`` / ``clone`` / ``replace`` -> ERROR
  by default (a truncate-and-reload cannot be represented as appends —
  Delta's streaming source fails the same way); pass
  ``ignore_changes=true`` to skip them (Delta's ignoreDeletes/
  ignoreChanges posture).

Every emitted row carries ``_commit_version`` (BIGINT) provenance.

Options: ``path`` (table root, driver-visible POSIX — the manifest
plane of object-store tables streams through a mounted path) OR
``table_name`` + ``catalog_root`` (resolve the root through the
:mod:`...sources.table_catalog` log by NAME — the streaming twin of
the batch read/scan/changes-by-name surface; a rename re-points the
name to the same path, so a running stream keeps its position),
``starting_version`` (default 0 — stream history then tail),
``starting_timestamp`` (epoch seconds or ISO-8601; resolved to the
EARLIEST retained commit at-or-after it — Delta's streaming boundary
rule, the opposite direction from batch TIMESTAMP AS OF; mutually
exclusive with ``starting_version``), ``ignore_changes`` (default
false), ``max_files_per_batch`` (default unbounded).

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
_CATALOG_DIR = "_catalog"


def _manifest(path: str, version: int) -> dict:
    with open(
        os.path.join(path, _MANIFEST_DIR, f"v{version:06d}.json"), "rb"
    ) as fh:
        return json.loads(fh.read())


def _latest_json_version(dirpath: str) -> int | None:
    try:
        names = os.listdir(dirpath)
    except FileNotFoundError:
        return None
    versions = [
        int(f[1:7])
        for f in names
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _current_version(path: str) -> int | None:
    return _latest_json_version(os.path.join(path, _MANIFEST_DIR))


def _version_at_or_after(path: str, ts_us: int) -> int:
    """Delta's ``startingTimestamp`` rule for STREAMS (note: the
    opposite boundary from batch TIMESTAMP AS OF): the EARLIEST
    retained commit whose stamp is at or after the timestamp — "give
    me every change from this moment on". A timestamp past the head
    raises (nothing to stream yet is indistinguishable from a clock
    error); vacuumed manifests are skipped."""
    latest = _current_version(path)
    if latest is None:
        raise ValueError(f"no committed versions at {path!r}")
    for v in range(latest + 1):
        try:
            m = _manifest(path, v)
        except FileNotFoundError:
            continue
        if m.get("ts_us", 0) >= ts_us:
            return v
    raise ValueError(
        f"starting_timestamp is after the latest commit at {path!r}"
    )


def _parse_ts_us(raw: str) -> int:
    """Option strings: epoch seconds ('1700000000.5') or ISO-8601
    ('2026-08-16T12:00:00'; naive = UTC)."""
    import datetime as _dt

    try:
        return int(float(raw) * 1_000_000)
    except ValueError:
        pass
    d = _dt.datetime.fromisoformat(raw)
    if d.tzinfo is None:
        d = d.replace(tzinfo=_dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


def _resolve_path(options: dict) -> str:
    """Table root from options: ``path`` directly, or ``table_name``
    resolved through the catalog log at ``catalog_root`` (read as raw
    JSON so the executor-side worker needs no package import)."""
    if "path" in options:
        return options["path"]
    name = options.get("table_name")
    root = options.get("catalog_root")
    if not name or not root:
        raise ValueError(
            "snapshot_stream needs option 'path', or options "
            "'table_name' + 'catalog_root'"
        )
    cat_dir = os.path.join(root, _CATALOG_DIR)
    head = _latest_json_version(cat_dir)
    if head is None:
        raise ValueError(f"no catalog log at {cat_dir!r}")
    with open(os.path.join(cat_dir, f"v{head:06d}.json"), "rb") as fh:
        tables = json.loads(fh.read())["tables"]
    if name not in tables:
        known = ", ".join(sorted(tables)) or "<empty catalog>"
        raise ValueError(f"no table named {name!r} (have: {known})")
    return tables[name]


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
    if m.get("parent") is None:
        # the table's first commit is a starting snapshot whatever its
        # op label — overwrite/clone-created tables stream their
        # initial load instead of erroring (Delta's starting snapshot)
        return "data", [
            f
            for d in m["dirs"]
            for f in _parquet_files(os.path.join(path, d))
        ]
    if op == "append":
        parent = set(_manifest(path, m["parent"])["dirs"])
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
    if op in ("delete", "add_constraint", "drop_constraint"):
        return "data", []
    if ignore_changes:
        return "data", []
    raise ValueError(
        f"snapshot stream at {path!r} hit a non-append commit "
        f"(version {version}, op {op!r}) — a truncate-and-reload "
        "cannot stream as appends; pass ignore_changes=true to skip "
        "such commits, or consume read_changes for a fold"
    )


def _pos(offset: dict) -> tuple[int, int]:
    """Total order over offsets; r12's index-free form reads as 0."""
    return int(offset["version"]), int(offset.get("index", 0))


class _FilePartition(InputPartition):
    def __init__(self, file: str, kind: str, version: int) -> None:
        self.file = file
        self.kind = kind
        self.version = version


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, field_names: list[str]) -> None:
        self.path = _resolve_path(options)
        if "starting_timestamp" in options:
            if "starting_version" in options:
                raise ValueError(
                    "pass either starting_version or "
                    "starting_timestamp, not both"
                )
            self.start_version = _version_at_or_after(
                self.path, _parse_ts_us(options["starting_timestamp"])
            )
        else:
            self.start_version = int(options.get("starting_version", "0"))
        self.ignore_changes = (
            str(options.get("ignore_changes", "false")).lower() == "true"
        )
        mfb = options.get("max_files_per_batch")
        self.max_files = int(mfb) if mfb is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("max_files_per_batch must be >= 1")
        # field order is PINNED by the resolved query schema the engine
        # hands streamReader() — never re-derived from the log, so a
        # schema-evolving commit racing between schema() and reader
        # construction cannot skew tuple order (r12 ADVICE)
        self.fields = list(field_names)
        # self-tracked scan position (the Python API's latestOffset
        # has no start argument); see module docstring
        self._scan: tuple[int, int] = (self.start_version, 0)
        # committed floor LEARNED from engine calls; None until the
        # engine tells us anything — a fresh reader replays verbatim
        self._floor: tuple[int, int] | None = None
        # version -> (kind, files) plan cache, pruned by commit()
        self._plans: dict[int, tuple[str, list[str]]] = {}

    # -- plumbing ---------------------------------------------------------
    def _plan(self, version: int) -> tuple[str, list[str]]:
        got = self._plans.get(version)
        if got is None:
            got = _insert_files(self.path, version, self.ignore_changes)
            self._plans[version] = got
        return got

    def _learn(self, *positions: tuple[int, int]) -> None:
        best = max(positions)
        if self._floor is None or best > self._floor:
            self._floor = best
        if best > self._scan:
            self._scan = best

    # -- DataSourceStreamReader protocol ----------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.start_version, "index": 0}

    def latestOffset(self) -> dict:
        cur = _current_version(self.path)
        v, i = self._scan
        if cur is None or v > cur:
            end = (v, i)
        elif self.max_files is None:
            end = (cur + 1, 0)
        else:
            # admit up to max_files files, splitting mid-commit
            budget = self.max_files
            while v <= cur and budget > 0:
                files = self._plan(v)[1]
                remaining = len(files) - i
                if remaining <= budget:
                    budget -= remaining
                    v, i = v + 1, 0
                else:
                    i += budget
                    budget = 0
            end = (v, i)
        self._scan = max(self._scan, end)
        return {"version": end[0], "index": end[1]}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        s, e = _pos(start), _pos(end)
        if e <= s:
            # a restarted rate-limited reader can emit one stale
            # (backward) latestOffset before learning the committed
            # position from this very call — plan nothing, learn
            self._learn(s)
            return []
        floor = self._floor
        self._learn(s)
        parts: list[_FilePartition] = []
        for v in range(s[0], e[0] + 1):
            if v == e[0] and e[1] == 0:
                break
            kind, files = self._plan(v)
            lo = s[1] if v == s[0] else 0
            hi = e[1] if v == e[0] else len(files)
            if floor is not None:
                # never re-plan below the engine-confirmed floor (the
                # backward-then-forward restart batch); a fresh reader
                # (floor None) replays a checkpointed range verbatim
                if v < floor[0]:
                    continue
                if v == floor[0]:
                    lo = max(lo, floor[1])
            parts.extend(
                _FilePartition(f, kind, v) for f in files[lo:hi]
            )
        return parts

    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        names = self.fields
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
        """The engine durably committed everything below ``end``:
        raise the learned floor and prune the per-version plan cache —
        a long-running tail holds O(in-flight) bookkeeping, not
        O(history)."""
        e = _pos(end)
        self._learn(e)
        drop = [v for v in self._plans if v < e[0]]
        for v in drop:
            del self._plans[v]


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
    (or ``.option("table_name", n).option("catalog_root", r)``) —
    micro-batches are the table's commits (see module docstring)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_stream"

    def schema(self) -> str:
        fields = _data_fields(_resolve_path(self.options))
        return ", ".join(
            [f"{n} {t}" for n, t in fields] + ["_commit_version bigint"]
        )

    def streamReader(self, schema) -> SnapshotStreamReader:
        # the engine hands back the RESOLVED schema — pin the reader's
        # field order to it instead of re-reading the log (r12 ADVICE:
        # a schema-evolving commit landing between schema() and here
        # must not skew tuple order vs the declared schema)
        names = [f.name for f in schema.fields if f.name != "_commit_version"]
        return SnapshotStreamReader(self.options, names)


def register(spark) -> None:
    """Idempotent registration; by-value pickling because the source
    is instantiated in a separate Python process that may not have
    this package on sys.path (the x97/pydatasource rule)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(SnapshotStreamDataSource)
