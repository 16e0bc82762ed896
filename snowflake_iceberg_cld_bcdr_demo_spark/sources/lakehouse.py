"""Parquet lakehouse catalog with Iceberg-style snapshot semantics.

The reference's storage model is Iceberg tables in S3 discovered through
AWS Glue, with **two access paths to the same data** — manually-declared
external tables (`scripts/10_external_tables.sql:45-88`) and an
auto-discovered catalog-linked database
(`scripts/11_catalog_linked_database.sql:50-55`) — plus snapshot appends
(`scripts/05_append_campaigns.py:112-123`) and metadata-only replication
for DR (`scripts/20_failover_groups_primary.sql:109-172`).

No Iceberg runtime jar ships in this environment (offline), so this module
provides the same *semantics* over parquet + JSON manifests, pure PySpark:

- a **table** is a directory of immutable snapshot data dirs plus a
  ``_manifest.json`` listing snapshots (id, timestamp, operation, row
  count, data dirs) — append = write a new dir + manifest entry, exactly
  Iceberg's append-only metadata model;
- **reads** union the data dirs visible at a snapshot → time travel =
  ``load(..., snapshot_id=N)`` (Iceberg ``VERSION AS OF``);
- **catalogs** are views over one shared warehouse: the namespace listing
  IS the catalog (CLD-style auto-discovery), while :class:`ExternalTables`
  holds an explicit name→table registry (EXT-style manual registration);
- **replication** copies only view/table *definitions* between catalogs
  (`docs/TALK_TRACK.md:201-218` zero-copy insight): data files are shared,
  so RPO=0 for data by construction.

Scale: data dirs are written by ``df.write.parquet`` with optional
``partitionBy`` (the reference partitions facts by ``date_key``,
`scripts/03_load_iceberg_aws.py:87,106,127`), so partition pruning works
through the normal Spark file-source path; the manifest holds only
directory names (O(snapshots), never O(files)).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


@dataclass(frozen=True)
class Snapshot:
    snapshot_id: int
    committed_at: float
    operation: str
    row_count: int
    data_dirs: tuple[str, ...]


class LakehouseCatalog:
    """One catalog over a shared warehouse directory.

    Namespaces are first-level dirs, tables second-level; every catalog
    instance pointed at the same warehouse sees the same tables (the
    CLD shared-storage model).
    """

    def __init__(self, spark: SparkSession, warehouse: str, name: str = "cld") -> None:
        self.spark = spark
        self.warehouse = warehouse
        self.name = name
        os.makedirs(warehouse, exist_ok=True)
        # Partition values keep their declared type (the reference stores
        # date_key as STRING, `03:59-60`); without this Spark would
        # re-infer "2024-01-03" partition dirs as DATE on read.
        spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")

    # -- paths -----------------------------------------------------------
    def _table_path(self, namespace: str, table: str) -> str:
        return os.path.join(self.warehouse, namespace, table)

    def _manifest_path(self, namespace: str, table: str) -> str:
        return os.path.join(self._table_path(namespace, table), MANIFEST)

    def _read_manifest(self, namespace: str, table: str) -> dict:
        with open(self._manifest_path(namespace, table)) as f:
            return json.load(f)

    def _write_manifest(self, namespace: str, table: str, manifest: dict) -> None:
        path = self._manifest_path(namespace, table)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, path)  # atomic commit, Iceberg-metadata style

    # -- namespace / table listing (S7, S9) ------------------------------
    def create_namespace(self, namespace: str) -> None:
        os.makedirs(os.path.join(self.warehouse, namespace), exist_ok=True)

    def list_namespaces(self) -> list[str]:
        return sorted(
            d
            for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d)) and not d.startswith("_")
        )

    def list_tables(self, namespace: str) -> list[str]:
        ns_path = os.path.join(self.warehouse, namespace)
        if not os.path.isdir(ns_path):
            return []
        return sorted(
            t
            for t in os.listdir(ns_path)
            if os.path.isfile(os.path.join(ns_path, t, MANIFEST))
        )

    def table_exists(self, namespace: str, table: str) -> bool:
        return os.path.isfile(self._manifest_path(namespace, table))

    # -- DDL / DML (S5, S6) ----------------------------------------------
    def create_table(
        self,
        namespace: str,
        table: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        mode: str = "error",
    ) -> Snapshot:
        """Create (or replace with ``mode='overwrite'``) a table from a
        DataFrame — the S5 `CREATE TABLE … USING iceberg PARTITIONED BY`
        analog (`03_load_iceberg_aws.py:201-260`)."""
        if self.table_exists(namespace, table):
            if mode == "error":
                raise FileExistsError(f"{namespace}.{table} exists")
            if mode == "ignore":
                return self.current_snapshot(namespace, table)
        self.create_namespace(namespace)
        os.makedirs(self._table_path(namespace, table), exist_ok=True)
        manifest = {
            "table": f"{namespace}.{table}",
            "partition_by": partition_by or [],
            "columns": list(df.columns),
            "snapshots": [],
        }
        return self._commit(namespace, table, manifest, df, "create")

    def append(self, namespace: str, table: str, df: DataFrame) -> Snapshot:
        """Append a new snapshot — `05_append_campaigns.py:119-123`."""
        manifest = self._read_manifest(namespace, table)
        return self._commit(namespace, table, manifest, df, "append")

    def _commit(
        self, namespace: str, table: str, manifest: dict, df: DataFrame, op: str
    ) -> Snapshot:
        sid = len(manifest["snapshots"]) + 1
        data_dir = f"data-{sid:05d}"
        out = os.path.join(self._table_path(namespace, table), data_dir)
        writer = df.write.mode("overwrite")
        if manifest["partition_by"]:
            writer = writer.partitionBy(*manifest["partition_by"])
        writer.parquet(out)
        rows = self.spark.read.parquet(out).count()
        prev_dirs = (
            manifest["snapshots"][-1]["data_dirs"] if op == "append" and manifest["snapshots"] else []
        )
        snap = {
            "snapshot_id": sid,
            "committed_at": time.time(),
            "operation": op,
            "row_count": rows,
            "data_dirs": [*prev_dirs, data_dir] if op == "append" else [data_dir],
        }
        manifest["snapshots"].append(snap)
        self._write_manifest(namespace, table, manifest)
        return Snapshot(
            sid, snap["committed_at"], op, rows, tuple(snap["data_dirs"])
        )

    def drop_table(self, namespace: str, table: str) -> None:
        import shutil

        shutil.rmtree(self._table_path(namespace, table), ignore_errors=True)

    # -- reads (S8/S9 scans, time travel) --------------------------------
    def load(
        self, namespace: str, table: str, snapshot_id: int | None = None
    ) -> DataFrame:
        """Read a table at the current (or a historical) snapshot."""
        manifest = self._read_manifest(namespace, table)
        snaps = manifest["snapshots"]
        if not snaps:
            raise ValueError(f"{namespace}.{table} has no snapshots")
        snap = snaps[-1] if snapshot_id is None else snaps[snapshot_id - 1]
        paths = [
            os.path.join(self._table_path(namespace, table), d) for d in snap["data_dirs"]
        ]
        # One multi-path read (not a unionAll chain): Spark builds a single
        # file index, so partition pruning/pushdown span all snapshots.
        df = self.spark.read.option("basePath", self._table_path(namespace, table)).parquet(
            *paths
        )
        # partitionBy moves partition columns to the end on read; restore
        # the declared column order so readers see the created schema.
        cols = manifest.get("columns")
        if cols and set(cols) == set(df.columns):
            df = df.select(*cols)
        return df

    def snapshots(self, namespace: str, table: str) -> list[Snapshot]:
        """Snapshot history — the `table.snapshots()` metadata view
        (`05_append_campaigns.py:115,131-137`)."""
        manifest = self._read_manifest(namespace, table)
        return [
            Snapshot(
                s["snapshot_id"],
                s["committed_at"],
                s["operation"],
                s["row_count"],
                tuple(s["data_dirs"]),
            )
            for s in manifest["snapshots"]
        ]

    def partition_spec(self, namespace: str, table: str) -> list[str]:
        return list(self._read_manifest(namespace, table)["partition_by"])

    # -- health (S10) -----------------------------------------------------
    def link_status(self, namespace: str) -> dict:
        """`SYSTEM$CATALOG_LINK_STATUS` analog
        (`11_catalog_linked_database.sql:71,130`): probe listing + one
        table read; structured status dict."""
        try:
            tables = self.list_tables(namespace)
            probe: str | None = None
            if tables:
                probe = tables[0]
                self.load(namespace, probe).schema  # cheap metadata read
            return {
                "catalog": self.name,
                "namespace": namespace,
                "status": "LINK_ACTIVE",
                "table_count": len(tables),
                "probe_table": probe,
                "failure_details": None,
            }
        except Exception as exc:  # noqa: BLE001 — health probe reports, never raises
            return {
                "catalog": self.name,
                "namespace": namespace,
                "status": "LINK_FAILED",
                "table_count": 0,
                "probe_table": None,
                "failure_details": str(exc),
            }

    def refresh(self, namespace: str) -> list[str]:
        """`ALTER DATABASE … REFRESH` analog (`11:127-130`) — shared
        storage means re-listing IS the refresh."""
        return self.list_tables(namespace)


class ExternalTables:
    """EXT-style manual registration (`10_external_tables.sql:45-88`):
    an explicit registry of EXT_NAME → (namespace, table) bindings over a
    :class:`LakehouseCatalog` — the second access path to the same data."""

    def __init__(self, catalog: LakehouseCatalog, registry_name: str = "ext") -> None:
        self.catalog = catalog
        self._path = os.path.join(catalog.warehouse, f"_registry_{registry_name}.json")

    def _read(self) -> dict[str, list[str]]:
        if not os.path.isfile(self._path):
            return {}
        with open(self._path) as f:
            return json.load(f)

    def _write(self, reg: dict[str, list[str]]) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(reg, f, indent=1)
        os.replace(tmp, self._path)

    def register(self, ext_name: str, namespace: str, table: str) -> None:
        if not self.catalog.table_exists(namespace, table):
            raise KeyError(f"catalog table {namespace}.{table} not found")
        reg = self._read()
        reg[ext_name] = [namespace, table]
        self._write(reg)

    def names(self) -> list[str]:
        return sorted(self._read())

    def load(self, ext_name: str) -> DataFrame:
        namespace, table = self._read()[ext_name]
        return self.catalog.load(namespace, table)

    def unregister(self, ext_name: str) -> None:
        reg = self._read()
        reg.pop(ext_name, None)
        self._write(reg)


class ViewRegistry:
    """Persisted SQL view definitions for a logical database — the PROD
    view layer (`15_create_prod_database.sql:53-242`) and the unit of
    metadata-only replication/drift detection (`33_schema_sync_task.sql`).

    Definitions are stored as SQL text in one JSON file per (catalog,
    database); :meth:`apply` replays them as temp views each session —
    exactly how the reference's sync task re-creates PROD views
    (`16_sync_task_primary.sql:190-215`)."""

    def __init__(self, warehouse: str, database: str) -> None:
        self.database = database
        self._path = os.path.join(warehouse, f"_views_{database}.json")

    def _read(self) -> dict[str, str]:
        if not os.path.isfile(self._path):
            return {}
        with open(self._path) as f:
            return json.load(f)

    def _write(self, views: dict[str, str]) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(views, f, indent=1)
        os.replace(tmp, self._path)

    def create_or_replace(self, name: str, sql: str) -> None:
        views = self._read()
        views[name] = sql
        self._write(views)

    def drop(self, name: str) -> None:
        views = self._read()
        views.pop(name, None)
        self._write(views)

    def definitions(self) -> dict[str, str]:
        return self._read()

    def definition_hashes(self, spark: SparkSession) -> DataFrame:
        """(object_name, object_definition, object_hash) with sha2-256 —
        the drift-detection export (`33:87,105`)."""
        views = self._read()
        if not views:
            return spark.createDataFrame(
                [], "object_name string, object_definition string, object_hash string"
            )
        df = spark.createDataFrame(
            [(k, v) for k, v in sorted(views.items())],
            "object_name string, object_definition string",
        )
        return df.withColumn("object_hash", F.sha2(F.col("object_definition"), 256))

    def apply(self, spark: SparkSession, prefix: str | None = None) -> list[str]:
        """Replay every definition as `{prefix}_{name}` temp views."""
        created = []
        for name, sql in sorted(self._read().items()):
            view_name = f"{prefix}_{name}" if prefix else name
            spark.sql(f"CREATE OR REPLACE TEMP VIEW {view_name} AS {sql}")
            created.append(view_name)
        return created
