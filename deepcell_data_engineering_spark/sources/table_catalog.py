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

    def _state(self, version: int | None = None) -> dict:
        """Full catalog state as of ``version`` (default: latest):
        ``{"tables": name->path, "properties": name->{k: v}}``.
        Logs written before the properties field read as {} — forward-
        compatible with every committed catalog."""
        if version is None:
            version = self.current_version()
            if version is None:
                return {"tables": {}, "properties": {}}
        raw = self._store.get(self._path(version))
        if raw is None:
            raise ValueError(
                f"catalog version {version} does not exist at "
                f"{self._root!r}"
            )
        doc = json.loads(raw)
        return {
            "tables": doc["tables"],
            "properties": doc.get("properties", {}),
        }

    def tables(self, version: int | None = None) -> dict[str, str]:
        """The full name -> table_path mapping as of ``version``
        (default: latest); {} for an empty catalog."""
        return self._state(version)["tables"]

    def _publish(self, mutate) -> dict:
        """Optimistic-concurrency loop: read head, apply ``mutate`` to
        a copy of the full state, publish put-if-absent; on conflict
        re-read and retry — ``mutate`` re-validates against the
        winner's state each time (so e.g. a duplicate-name check
        cannot be raced around)."""
        for _ in range(_RETRIES):
            head = self.current_version()
            state = self._state(head)
            state = {
                "tables": dict(state["tables"]),
                "properties": {
                    k: dict(v) for k, v in state["properties"].items()
                },
            }
            state = mutate(state)
            version = 0 if head is None else head + 1
            payload = json.dumps(
                {"version": version, **state}, sort_keys=True
            ).encode()
            if self._store.put_if_absent(self._path(version), payload):
                return state
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
        never a side effect of a duplicate CREATE).

        Cataloged tables must share the catalog's manifest SUBSTRATE:
        read/scan/changes resolve the named table's snapshot log
        through this catalog's store, so ``table_path`` is validated
        via ``store.check_path`` here — a POSIX-backed catalog refuses
        a ``scheme://`` table at CREATE time instead of failing
        opaquely at first read."""
        self._store.check_path(table_path)

        def mutate(state: dict) -> dict:
            tables = state["tables"]
            if name in tables and not replace:
                raise ValueError(
                    f"table {name!r} already registered at "
                    f"{tables[name]!r}; pass replace=True to re-point"
                )
            tables[name] = table_path
            return state

        self._publish(mutate)

    def drop_table(self, name: str, purge: bool = False) -> None:
        """Unregister ``name``. By default the snapshot data is
        untouched — a catalog drop is a pointer delete; re-CREATE the
        name to get the table back. ``purge=True`` additionally deletes
        the table's bytes (data root, change sets, manifest log) —
        ``DROP TABLE ... PURGE``. Purge requires a local data root
        (same contract as :func:`~.snapshots.vacuum`), refuses while
        another cataloged table's retained manifests still reference
        the table's directories (a shallow clone would go dark),
        refuses while another catalog NAME resolves to the same data
        root (create_table allows aliasing one path under two names;
        purging one name would leave the other pointing at deleted
        data — the alias check re-validates inside the publish loop,
        so a concurrent CREATE of an alias cannot race around it), and
        runs AFTER the unregister publish: a crash between the two
        leaves a dangling directory for a later purge, never a catalog
        entry pointing at deleted data."""
        import shutil

        path = self.lookup(name) if purge else None
        if purge:
            if "://" in path:
                raise ValueError(
                    "drop_table(purge=True) requires a local data "
                    f"root; got {path!r}"
                )
            protected = _snap._catalog_protected_dirs(
                path, self, self._store
            )
            if protected:
                raise ValueError(
                    f"cannot purge {name!r} at {path!r}: directories "
                    f"{sorted(protected)} are still referenced by "
                    "another cataloged table (a shallow clone?) — "
                    "drop or deep-copy the referencing table first"
                )

        def mutate(state: dict) -> dict:
            if name not in state["tables"]:
                raise ValueError(f"no table named {name!r}")
            if purge:
                me = os.path.abspath(state["tables"][name])
                aliases = sorted(
                    n
                    for n, p in state["tables"].items()
                    if n != name and os.path.abspath(p) == me
                )
                if aliases:
                    raise ValueError(
                        f"cannot purge {name!r}: names {aliases} also "
                        f"resolve to {me!r} — drop the aliases first "
                        "(or drop this name without purge)"
                    )
            del state["tables"][name]
            state["properties"].pop(name, None)
            return state

        self._publish(mutate)
        if purge:
            for sub in (
                _snap._DATA_DIR,
                _snap._CHANGES_DIR,
                _snap._MANIFEST_DIR,
            ):
                shutil.rmtree(os.path.join(path, sub), ignore_errors=True)

    def rename_table(self, name: str, new_name: str) -> None:
        """RENAME: atomically re-point ``name`` to ``new_name`` in one
        catalog publish — readers resolve either the old or the new
        state, never a half-renamed catalog. The table's path, data
        and history are untouched (a rename is a catalog edit, exactly
        Delta/Iceberg RENAME semantics). Properties travel with the
        name."""

        def mutate(state: dict) -> dict:
            tables = state["tables"]
            if name not in tables:
                raise ValueError(f"no table named {name!r}")
            if new_name in tables:
                raise ValueError(
                    f"table {new_name!r} already registered at "
                    f"{tables[new_name]!r}"
                )
            tables[new_name] = tables.pop(name)
            if name in state["properties"]:
                state["properties"][new_name] = state["properties"].pop(
                    name
                )
            return state

        self._publish(mutate)

    # -- properties -------------------------------------------------------
    def set_properties(self, name: str, props: dict[str, str]) -> None:
        """Upsert table properties (comment, owner, retention policy —
        the ``ALTER TABLE ... SET TBLPROPERTIES`` surface). Merged
        key-by-key into the existing map in one catalog publish."""

        def mutate(state: dict) -> dict:
            if name not in state["tables"]:
                raise ValueError(f"no table named {name!r}")
            state["properties"].setdefault(name, {}).update(props)
            return state

        self._publish(mutate)

    def unset_properties(self, name: str, keys: list[str]) -> None:
        """Remove property ``keys`` (missing keys are a no-op — the
        UNSET TBLPROPERTIES IF EXISTS behavior)."""

        def mutate(state: dict) -> dict:
            if name not in state["tables"]:
                raise ValueError(f"no table named {name!r}")
            held = state["properties"].get(name, {})
            for k in keys:
                held.pop(k, None)
            return state

        self._publish(mutate)

    def properties(
        self, name: str, version: int | None = None
    ) -> dict[str, str]:
        """The table's property map as of catalog ``version`` (default
        latest); {} when none set. Unknown names raise."""
        state = self._state(version)
        if name not in state["tables"]:
            raise ValueError(f"no table named {name!r}")
        return dict(state["properties"].get(name, {}))

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
