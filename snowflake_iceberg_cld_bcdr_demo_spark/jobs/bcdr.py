"""BCDR simulation: two logical "accounts" over one shared warehouse —
metadata-only replication, failover promote, post-failover validation.

The reference replicates only *definitions* (roles/integrations/one EXT
database) via failover groups every 10 minutes
(`20_failover_groups_primary.sql:109-172`); Iceberg data and the Glue
catalog are shared storage, so data RPO = 0 by construction
(`docs/ARCHITECTURE.md:429-439`, `docs/TALK_TRACK.md:201-218`).  CLDs are
explicitly NOT replicated — the secondary builds its own over the same
catalog (`20:96-101`, `30_cld_secondary_setup.sql:171-176`).  Promote
flips the replica to primary (`21_failover_groups_secondary.sql:253-264`);
the secondary stays read-only until promoted (`21:209`).

Here an :class:`Account` = a name + its EXT registry + PROD view registry
over the shared :class:`LakehouseCatalog`.  ``replicate_definitions``
copies EXT bindings + view SQL (never data files); ``promote`` executes
the failover state machine; ``validate_consistency`` ports the
`90_validation_queries.sql:149-168` MATCH/MISMATCH count reconciliation.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..sources.lakehouse import ExternalTables, LakehouseCatalog, ViewRegistry


@dataclass
class Account:
    """One logical Snowflake-account analog."""

    name: str
    catalog: LakehouseCatalog
    ext: ExternalTables
    prod: ViewRegistry
    role: str = "primary"  # or "replica"
    promoted_at: float | None = None
    history: list[str] = field(default_factory=list)

    @property
    def is_writable(self) -> bool:
        return self.role == "primary"


def make_account(
    spark: SparkSession, warehouse: str, name: str, role: str = "primary"
) -> Account:
    cat = LakehouseCatalog(spark, warehouse, name=name)
    return Account(
        name=name,
        catalog=cat,
        ext=ExternalTables(cat, registry_name=f"ext_{name}"),
        prod=ViewRegistry(warehouse, database=f"prod_{name}"),
        role=role,
    )


def replicate_definitions(primary: Account, secondary: Account) -> dict:
    """Metadata-only replication (`20:109-172` semantics): copy EXT
    bindings and PROD view SQL from primary to secondary.  No data files
    move — both accounts read the same warehouse (zero-copy DR)."""
    if not primary.is_writable:
        raise PermissionError(f"{primary.name} is not primary")
    copied_ext = 0
    for ext_name in primary.ext.names():
        ns_tbl = primary.ext._read()[ext_name]
        secondary.ext.register(ext_name, *ns_tbl)
        copied_ext += 1
    copied_views = 0
    for name, sql in primary.prod.definitions().items():
        secondary.prod.create_or_replace(name, sql)
        copied_views += 1
    secondary.history.append(f"replicated from {primary.name}")
    return {
        "ext_tables_replicated": copied_ext,
        "views_replicated": copied_views,
        "data_files_copied": 0,  # the zero-copy invariant
    }


def promote(secondary: Account, old_primary: Account | None = None) -> dict:
    """Failover: replica → primary (`21:253-264`); optional demotion of
    the old primary (planned failover / failback `21:286-300`)."""
    if secondary.role == "primary":
        return {"status": "NOOP", "detail": f"{secondary.name} already primary"}
    secondary.role = "primary"
    secondary.promoted_at = time.time()
    secondary.history.append("promoted to primary")
    if old_primary is not None and old_primary.role == "primary":
        old_primary.role = "replica"
        old_primary.history.append(f"demoted; {secondary.name} promoted")
    return {"status": "PROMOTED", "account": secondary.name}


def migrate_prod_independent(
    spark: SparkSession,
    secondary: Account,
    namespace: str,
    monitoring: LakehouseCatalog | None = None,
    old_source_prefix: str = "cld",
    new_source_prefix: str | None = None,
) -> dict:
    """ONE-TIME migration making the secondary's PROD database independent
    — port of `32_migrate_prod_db_independent.sql:185-210` (drop the
    replica's view definitions, recreate them against the LOCAL CLD) and
    `32:318-364` (recreate the DR monitoring tables), with the step-11
    count validation (`32:449-459`) run before AND after so the rebind is
    provably lossless.

    The replicated definitions reference the primary's CLD source prefix;
    after migration every view reads ``{new_source_prefix}_{table}`` —
    the secondary's own catalog binding over the same shared storage, so
    counts must be identical (the zero-copy invariant).  Appends one
    ``PROD_MIGRATION`` row per view plus a completion row to ``sync_log``.
    """
    from . import sync as _sync
    from ..adtech.schemas import (
        GRANT_AUDIT_LOG_SCHEMA,
        HEARTBEAT_LOG_SCHEMA,
        SCHEMA_DRIFT_LOG_SCHEMA,
        SYNC_LOG_SCHEMA,
    )
    from .logs import append_rows, ensure_log_table

    if not secondary.is_writable:
        raise PermissionError(
            f"{secondary.name} is a replica — promote before migrating (`32` step 3)"
        )
    old_defs = secondary.prod.definitions()
    if not old_defs:
        raise ValueError(f"{secondary.name} has no replicated PROD views to migrate")

    t0 = time.time()
    monitoring = monitoring or secondary.catalog
    new_prefix = new_source_prefix or f"cld_{secondary.name}"

    # Step 5 capture: pre-migration counts through the REPLICATED defs
    # (resolved against the old/primary prefix — shared storage).
    _sync.register_catalog_tables(spark, secondary.catalog, namespace, old_source_prefix)
    pre_counts = {name: spark.sql(sql).count() for name, sql in sorted(old_defs.items())}

    # Step 5 drop + steps 7-8 recreate: fresh definitions bound to the
    # secondary's OWN CLD prefix (sync re-renders passthrough + agg views).
    for name in old_defs:
        secondary.prod.drop(name)
    report = _sync.sync_prod_database(
        spark,
        secondary.catalog,
        namespace,
        secondary.prod,
        monitoring=monitoring,
        source_prefix=new_prefix,
    )

    # Step 9: independent DR monitoring tables.
    for table, schema in (
        ("secondary_heartbeat_log", HEARTBEAT_LOG_SCHEMA),
        ("grant_audit_log", GRANT_AUDIT_LOG_SCHEMA),
        ("schema_drift_log", SCHEMA_DRIFT_LOG_SCHEMA),
    ):
        ensure_log_table(monitoring, table, schema)

    # Step 11 verification: identical counts through the NEW definitions.
    new_defs = secondary.prod.definitions()
    post_counts = {name: spark.sql(sql).count() for name, sql in sorted(new_defs.items())}
    validation = [
        {
            "view": name,
            "pre_count": pre_counts.get(name),
            "post_count": post_counts.get(name),
            "verdict": "MATCH" if pre_counts.get(name) == post_counts.get(name) else "MISMATCH",
        }
        for name in sorted(set(old_defs) | set(new_defs))
    ]
    mismatches = [v for v in validation if v["verdict"] != "MATCH"]

    log_rows = [
        dict(
            sync_type="PROD_MIGRATION",
            source_database=secondary.catalog.name,
            source_schema=namespace,
            object_type="VIEW",
            object_name=v["view"],
            action="REBIND_TO_LOCAL_CLD",
            status=v["verdict"],
            row_count=v["post_count"],
        )
        for v in validation
    ]
    log_rows.append(
        dict(
            sync_type="PROD_MIGRATION",
            source_database=secondary.catalog.name,
            source_schema=namespace,
            object_type="DATABASE",
            object_name=secondary.prod.database,
            action="MIGRATE_INDEPENDENT",
            status="SUCCESS" if not mismatches and not report["views_failed"] else "FAILED",
            row_count=len(new_defs),
            execution_time_ms=int((time.time() - t0) * 1000),
        )
    )
    append_rows(spark, monitoring, "sync_log", SYNC_LOG_SCHEMA, log_rows, id_field="sync_id")
    secondary.history.append(f"prod migrated independent (source prefix {new_prefix})")
    return {
        "status": "SUCCESS" if not mismatches and not report["views_failed"] else "FAILED",
        "views_migrated": report["views_created"],
        "views_failed": report["views_failed"],
        "source_prefix": new_prefix,
        "validation": validation,
        "mismatches": len(mismatches),
        "execution_time_ms": int((time.time() - t0) * 1000),
    }


def object_inventory(
    spark: SparkSession,
    account: Account,
    namespace: str,
    grant_registry=None,
) -> DataFrame:
    """Object-existence inventory — the `SHOW ROLES/DATABASES/TABLES/
    VIEWS` sweep of `90_validation_queries.sql:47-94,222-224` as one
    DataFrame: (object_type, object_name, status).  Everything the demo
    expects to exist is probed; EXISTS/MISSING verdicts instead of the
    manual eyeball."""
    rows: list[tuple[str, str, str]] = []
    for ns in account.catalog.list_namespaces():
        rows.append(("NAMESPACE", ns, "EXISTS"))
    for tbl in account.catalog.list_tables(namespace):
        rows.append(("TABLE", f"{namespace}.{tbl}", "EXISTS"))
    for ext_name in account.ext.names():
        ns_tbl = account.ext._read()[ext_name]
        ok = account.catalog.table_exists(*ns_tbl)
        rows.append(("EXTERNAL_TABLE", ext_name, "EXISTS" if ok else "BROKEN_BINDING"))
    for view in sorted(account.prod.definitions()):
        rows.append(("VIEW", f"prod.{view}", "EXISTS"))
    if grant_registry is not None:
        for role in sorted(grant_registry.roles()):
            rows.append(("ROLE", role, "EXISTS"))
    link = account.catalog.link_status(namespace)
    rows.append(("CATALOG_LINK", namespace, link["status"]))
    return spark.createDataFrame(
        sorted(rows), "object_type string, object_name string, status string"
    )


def data_summary(spark: SparkSession, account: Account, namespace: str) -> DataFrame:
    """The one-row scalar-subquery data summary
    (`90_validation_queries.sql:289-294`): one count column per table,
    computed from snapshot metadata (total-records), so the summary is a
    manifest read — no table scans at any scale."""
    counts = {
        tbl: account.catalog.current_snapshot(namespace, tbl).row_count
        for tbl in account.catalog.list_tables(namespace)
    }
    row = [("Data Summary", *[counts[t] for t in sorted(counts)])]
    schema = "category string, " + ", ".join(f"n_{t} long" for t in sorted(counts))
    return spark.createDataFrame(row, schema)


def validate_consistency(
    spark: SparkSession, a: Account, b: Account, namespace: str
) -> list[dict]:
    """Two-path count reconciliation with MATCH/MISMATCH verdicts —
    the `90_validation_queries.sql:149-168` port (U2+J8).  Compares every
    table visible to both accounts."""
    results = []
    tables = sorted(set(a.catalog.list_tables(namespace)) & set(b.catalog.list_tables(namespace)))
    for tbl in tables:
        ca = a.catalog.load(namespace, tbl).count()
        cb = b.catalog.load(namespace, tbl).count()
        results.append(
            {
                "table": tbl,
                f"{a.name}_count": ca,
                f"{b.name}_count": cb,
                "verdict": "MATCH" if ca == cb else "MISMATCH",
            }
        )
    return results
