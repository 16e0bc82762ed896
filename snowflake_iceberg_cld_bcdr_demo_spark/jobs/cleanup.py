"""Ordered demo-stack teardown — the `99_cleanup.sql` analog.

The reference tears the whole demo down in strict dependency order
(`/root/reference/scripts/99_cleanup.sql`): failover groups first (so no
replication job recreates what follows), then databases (PROD, EXT, CLDs),
then external volumes/integrations/warehouses, finally roles — each drop
``IF EXISTS``, followed by a ``SHOW``-sweep verifying nothing remains.

The Spark-side object model maps onto warehouse-directory artifacts:

| reference object        | here                                         |
|-------------------------|----------------------------------------------|
| scheduled TASKs         | :class:`..jobs.scheduler.Scheduler` entries  |
| failover-group refresh  | (a scheduled task — removed with the rest)   |
| ICEBERG_PROD database   | ``_views_{db}.json`` view registries         |
| ICEBERG_DEMO_EXT        | ``_registry_{name}.json`` EXT registries     |
| CLD databases           | namespace dirs of Iceberg-emulated tables    |
| MV layer                | the ``mv`` namespace + ``.cursors.json``     |
| roles / grants          | ``_grants_{name}.json`` registries           |
| monitoring logs         | the ``monitoring`` namespace (retainable)    |

``teardown_stack`` drops in that order and returns the verification sweep
as a DataFrame of (object_type, object_name, action, status) — the
machine-checkable version of the script's closing ``SHOW`` block.
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import LakehouseCatalog
from .logs import MONITORING_NS
from .mv import MV_NS
from .scheduler import Scheduler

# Monitoring tables that survive a retaining teardown — the audit trail a
# post-mortem needs (sync/migration history, heartbeats, drift findings).
AUDIT_TABLES = frozenset(
    {"sync_log", "secondary_heartbeat_log", "grant_audit_log", "schema_drift_log"}
)


def _registry_files(warehouse: str, prefix: str) -> list[str]:
    return sorted(_glob.glob(os.path.join(warehouse, f"_{prefix}_*.json")))


def teardown_stack(
    spark: SparkSession,
    warehouse: str,
    scheduler: Scheduler | None = None,
    retain_audit_logs: bool = True,
) -> DataFrame:
    """Tear down everything the demo stack created under ``warehouse`` in
    dependency order; returns the verification sweep.

    With ``retain_audit_logs=True`` (the default) the ``monitoring``
    namespace keeps its audit tables (:data:`AUDIT_TABLES`) — everything
    else, including non-audit monitoring tables, is removed.  Driver-side
    file ops only (this is DDL, not a data job): the row count of work
    here is O(objects), never O(rows)."""
    cat = LakehouseCatalog(spark, warehouse, name="teardown")
    actions: list[tuple[str, str, str, str]] = []

    # 1. Scheduled tasks — suspend + remove so nothing recreates objects
    #    mid-teardown (`99`: failover groups / task drops come first).
    if scheduler is not None:
        for name in sorted(scheduler.tasks):
            scheduler.suspend(name)
            actions.append(("TASK", name, "DROP", "DROPPED"))
        scheduler.tasks.clear()

    # 2. PROD view databases (`DROP DATABASE ICEBERG_PROD`).
    for path in _registry_files(warehouse, "views"):
        db = os.path.basename(path)[len("_views_") : -len(".json")]
        os.unlink(path)
        actions.append(("VIEW_DATABASE", db, "DROP", "DROPPED"))

    # 3. EXT registries (`DROP DATABASE ICEBERG_DEMO_EXT`).
    for path in _registry_files(warehouse, "registry"):
        name = os.path.basename(path)[len("_registry_") : -len(".json")]
        os.unlink(path)
        actions.append(("EXT_DATABASE", name, "DROP", "DROPPED"))

    # 4. MV layer before the base namespaces (MVs derive from them).
    for tbl in cat.list_tables(MV_NS):
        cat.drop_table(MV_NS, tbl)
        actions.append(("MATERIALIZED_VIEW", f"{MV_NS}.{tbl}", "DROP", "DROPPED"))
    mv_dir = os.path.join(warehouse, MV_NS)
    if os.path.isdir(mv_dir):
        shutil.rmtree(mv_dir, ignore_errors=True)  # includes *.cursors.json
        actions.append(("NAMESPACE", MV_NS, "DROP", "DROPPED"))

    # 5. Data namespaces (`DROP DATABASE ICEBERG_DEMO_CLD*`), monitoring last.
    for ns in cat.list_namespaces():
        if ns == MONITORING_NS:
            continue
        for tbl in cat.list_tables(ns):
            cat.drop_table(ns, tbl)
            actions.append(("TABLE", f"{ns}.{tbl}", "DROP", "DROPPED"))
        shutil.rmtree(os.path.join(warehouse, ns), ignore_errors=True)
        actions.append(("NAMESPACE", ns, "DROP", "DROPPED"))

    # 6. Monitoring namespace: retain only the audit trail (or drop all).
    for tbl in cat.list_tables(MONITORING_NS):
        if retain_audit_logs and tbl in AUDIT_TABLES:
            actions.append(("TABLE", f"{MONITORING_NS}.{tbl}", "RETAIN", "RETAINED"))
            continue
        cat.drop_table(MONITORING_NS, tbl)
        actions.append(("TABLE", f"{MONITORING_NS}.{tbl}", "DROP", "DROPPED"))
    if not retain_audit_logs and os.path.isdir(os.path.join(warehouse, MONITORING_NS)):
        shutil.rmtree(os.path.join(warehouse, MONITORING_NS), ignore_errors=True)
        actions.append(("NAMESPACE", MONITORING_NS, "DROP", "DROPPED"))

    # 7. Roles/grants last (`DROP ROLE ICEBERG_*` after everything else).
    for path in _registry_files(warehouse, "grants"):
        name = os.path.basename(path)[len("_grants_") : -len(".json")]
        os.unlink(path)
        actions.append(("GRANT_REGISTRY", name, "DROP", "DROPPED"))

    # 8. The closing SHOW sweep: anything still present is a finding.
    for leftover in sorted(os.listdir(warehouse)):
        full = os.path.join(warehouse, leftover)
        if retain_audit_logs and leftover == MONITORING_NS:
            continue
        kind = "NAMESPACE" if os.path.isdir(full) else "FILE"
        actions.append((kind, leftover, "CHECK", "REMAINS"))

    return spark.createDataFrame(
        actions, "object_type string, object_name string, action string, status string"
    )


def table_maintenance(
    cat: LakehouseCatalog,
    namespace: str,
    compact_above_dirs: int = 8,
    keep_snapshots: int = 5,
    orphan_grace_s: float = 3600.0,
    cluster_by: dict[str, list[str]] | None = None,
) -> list[dict]:
    """Routine lakehouse upkeep for every table in a namespace — the
    Iceberg maintenance trio (`rewrite_data_files` + `expire_snapshots` +
    `remove_orphan_files`) as one schedulable job:

    1. compact when the head snapshot references more than
       ``compact_above_dirs`` data dirs (small-file accumulation from
       streaming appends),
    2. expire all but the newest ``keep_snapshots`` snapshots (branch/tag
       pinned snapshots survive — ref-aware expiry),
    3. sweep orphan dirs older than the grace period.

    ``cluster_by`` maps table name → Z-order columns: those tables'
    threshold compactions run as clustered rewrites (sorted layout +
    per-file bounds), so scheduled maintenance keeps restoring the
    data-skipping layout as streaming appends fragment it.

    Returns one report dict per table.  Scale: compaction is the only
    data-moving step and runs per table only when fragmentation crossed
    the threshold; expiry and the orphan sweep are metadata + unlink."""
    report = []
    for tbl in cat.list_tables(namespace):
        entry: dict = {"table": f"{namespace}.{tbl}", "compacted": False}
        head = cat.current_snapshot(namespace, tbl)
        if len(head.data_dirs) > compact_above_dirs:
            cols = (cluster_by or {}).get(tbl)
            cat.compact(namespace, tbl, cluster_by=cols)
            entry["compacted"] = True
            entry["clustered_by"] = cols
        exp = cat.expire_snapshots(namespace, tbl, keep_last=keep_snapshots)
        orph = cat.remove_orphan_files(namespace, tbl, older_than_s=orphan_grace_s)
        entry["expired_snapshots"] = len(exp["expired_snapshots"])
        entry["deleted_dirs"] = len(exp["deleted_dirs"])
        entry["orphans_deleted"] = len(orph["deleted"])
        report.append(entry)
    return report
