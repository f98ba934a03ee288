"""Name -> path catalog over snapshot tables — the ergonomic layer
that lets the relational tier (and plain ``spark.sql``) address
lakehouse tables BY NAME instead of threading raw paths everywhere.

The catalog is itself a tiny versioned log: each mutation publishes the
FULL name->path mapping (catalogs are KB-sized — the whole point is
that this driver-side state stays tiny while the data it names is TB-
sized) as the next ``_catalog/v*.json`` through the same put-if-absent
``ManifestStore`` primitive the snapshot log uses, so concurrent
CREATEs linearize exactly like concurrent commits: the loser re-reads
the winner's state and retries, and a name collision raises instead of
silently re-pointing. That also gives catalog time travel for free
(what did ``training_docs`` point to last week?).

Reference analog: the reference addresses dataset artifacts by
FILENAME CONVENTION (caliban_toolbox/build_utils.py's combined-NPZ
naming); this is the warehouse-grade replacement — names resolve
through a log, not a glob.

Usage::

    cat = SnapshotCatalog(root)
    cat.create_table("docs", table_path)
    df = cat.read(spark, "docs")                  # latest snapshot
    cat.register_temp_view(spark, "docs")
    spark.sql("SELECT count(*) FROM docs")
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from deepcell_data_engineering_spark.sources import snapshots as _snap

_CATALOG_DIR = "_catalog"
_RETRIES = 64


class CatalogConflictError(RuntimeError):
    """A concurrent catalog writer kept winning the publish race."""


class SnapshotCatalog:
    """A named registry of snapshot tables rooted at ``root``.

    All state I/O goes through a :class:`~.snapshots.ManifestStore`
    (POSIX by default), so the catalog works on the same substrates as
    the snapshot log itself — including the object-store conditional-
    put stores."""

    def __init__(
        self, root: str, store: _snap.ManifestStore | None = None
    ) -> None:
        self._root = root
        self._store = _snap._store(store)
        self._store.check_path(root)

    # -- log plumbing ---------------------------------------------------
    def _path(self, version: int) -> str:
        return os.path.join(
            self._root, _CATALOG_DIR, f"v{version:06d}.json"
        )

    def current_version(self) -> int | None:
        versions = [
            int(f[1:7])
            for f in self._store.listdir(
                os.path.join(self._root, _CATALOG_DIR)
            )
            if f.startswith("v") and f.endswith(".json")
        ]
        return max(versions) if versions else None

    def tables(self, version: int | None = None) -> dict[str, str]:
        """The full name -> table_path mapping as of ``version``
        (default: latest); {} for an empty catalog."""
        if version is None:
            version = self.current_version()
            if version is None:
                return {}
        raw = self._store.get(self._path(version))
        if raw is None:
            raise ValueError(
                f"catalog version {version} does not exist at "
                f"{self._root!r}"
            )
        return json.loads(raw)["tables"]

    def _publish(self, mutate) -> dict[str, str]:
        """Optimistic-concurrency loop: read head, apply ``mutate`` to
        a copy, publish put-if-absent; on conflict re-read and retry —
        ``mutate`` re-validates against the winner's state each time
        (so e.g. a duplicate-name check cannot be raced around)."""
        for _ in range(_RETRIES):
            head = self.current_version()
            tables = dict(self.tables(head)) if head is not None else {}
            tables = mutate(tables)
            version = 0 if head is None else head + 1
            payload = json.dumps(
                {"version": version, "tables": tables}, sort_keys=True
            ).encode()
            if self._store.put_if_absent(self._path(version), payload):
                return tables
        raise CatalogConflictError(
            f"could not publish catalog state at {self._root!r} after "
            f"{_RETRIES} attempts"
        )

    # -- DDL ------------------------------------------------------------
    def create_table(
        self, name: str, table_path: str, replace: bool = False
    ) -> None:
        """Register ``name`` -> ``table_path``. An existing name raises
        unless ``replace=True`` (re-pointing a name is an explicit act,
        never a side effect of a duplicate CREATE)."""

        def mutate(tables: dict[str, str]) -> dict[str, str]:
            if name in tables and not replace:
                raise ValueError(
                    f"table {name!r} already registered at "
                    f"{tables[name]!r}; pass replace=True to re-point"
                )
            tables[name] = table_path
            return tables

        self._publish(mutate)

    def drop_table(self, name: str) -> None:
        """Unregister ``name`` (the snapshot data is untouched — a
        catalog drop is a pointer delete, vacuum handles bytes)."""

        def mutate(tables: dict[str, str]) -> dict[str, str]:
            if name not in tables:
                raise ValueError(f"no table named {name!r}")
            del tables[name]
            return tables

        self._publish(mutate)

    def lookup(self, name: str) -> str:
        tables = self.tables()
        if name not in tables:
            known = ", ".join(sorted(tables)) or "<empty catalog>"
            raise ValueError(f"no table named {name!r} (have: {known})")
        return tables[name]

    # -- reads ------------------------------------------------------------
    def read(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """``read_snapshot`` by name. ``version`` is the named TABLE's
        snapshot version (time travel), not the catalog's."""
        return _snap.read_snapshot(
            spark,
            self.lookup(name),
            version,
            merge_schema=merge_schema,
            store=self._store,
        )

    def scan(
        self,
        spark: SparkSession,
        name: str,
        ranges: dict[str, tuple],
        version: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        """``scan_snapshot`` (stats-pruned read) by name."""
        return _snap.scan_snapshot(
            spark,
            self.lookup(name),
            ranges,
            version=version,
            merge_schema=merge_schema,
            store=self._store,
        )

    def changes(
        self,
        spark: SparkSession,
        name: str,
        from_version: int,
        to_version: int | None = None,
        merge_schema: bool = False,
        ranges: dict[str, tuple] | None = None,
    ) -> DataFrame:
        """``read_changes`` (CDC feed) by name, with the same optional
        ``ranges`` stats pruning."""
        return _snap.read_changes(
            spark,
            self.lookup(name),
            from_version,
            to_version,
            merge_schema=merge_schema,
            ranges=ranges,
            store=self._store,
        )

    def register_temp_view(
        self,
        spark: SparkSession,
        name: str,
        version: int | None = None,
        view_name: str | None = None,
        merge_schema: bool = False,
    ) -> str:
        """Expose a cataloged table to ``spark.sql`` as a temp view
        (default view name = catalog name). The view captures the
        RESOLVED snapshot version's directory list — a later commit to
        the table does not shift the view mid-query; re-register to
        advance (exactly the read-isolation the manifest log exists to
        provide)."""
        view = view_name or name
        self.read(
            spark, name, version=version, merge_schema=merge_schema
        ).createOrReplaceTempView(view)
        return view
