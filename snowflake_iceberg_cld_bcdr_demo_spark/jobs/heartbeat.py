"""Secondary heartbeat/validation job — port of
``SECONDARY_RESILIENT_HEARTBEAT()`` (F2, `31_sync_task_secondary.sql:104-525`).

The reference's proc runs up to 10 checks every 5 minutes on the DR side:
CLD link status (`31:144-171`), grant ensure/audit (`31:197-287`, via the
config-driven ACL registry in :mod:`.grants`), per-table count validation
(`31:289-305`), PROD-view-vs-CLD-table coverage (set difference,
`31:378-450`), resume of suspended tasks (`31:328-376`, via the scheduler),
and a DR-readiness rollup over the last 24h of heartbeats (`31:663-682`,
A15).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..adtech.schemas import HEARTBEAT_LOG_SCHEMA
from ..sources.lakehouse import LakehouseCatalog, ViewRegistry
from .logs import MONITORING_NS, append_rows, ensure_log_table


def secondary_heartbeat(
    spark: SparkSession,
    cld: LakehouseCatalog,
    namespace: str,
    prod: ViewRegistry,
    monitoring: LakehouseCatalog | None = None,
    grant_registry=None,
    expected_grants: list[dict] | None = None,
    scheduler=None,
) -> dict:
    """One heartbeat cycle; returns the check report dict.

    ``grant_registry``/``expected_grants`` enable the real grant audit
    (a :class:`.grants.GrantRegistry` + declarative expected set);
    ``scheduler`` enables the task-resume pass.  Without them the
    corresponding checks record SKIPPED, keeping the log shape."""
    t0 = time.time()
    monitoring = monitoring or cld
    checks: list[dict] = []

    # 1. CLD link status (`31:144-171`)
    status = cld.link_status(namespace)
    checks.append(
        dict(
            check_type="CLD_LINK_STATUS",
            status="SUCCESS" if status["status"] == "LINK_ACTIVE" else "FAILED",
            details=str(status),
            cld_table_count=status["table_count"],
        )
    )

    # 2. CLD data validation: per-table row counts (`31:289-305`)
    tables = cld.list_tables(namespace)
    counts = {}
    try:
        # ONE union-of-counts job instead of a sequential per-table driver
        # loop: Spark runs the per-table aggregate branches concurrently,
        # so a namespace with hundreds of tables validates in parallel
        # (the reference loops table-by-table, `31:289-305` — same
        # numbers, better schedule).
        if tables:
            from functools import reduce

            import pyspark.sql.functions as F

            branches = [
                cld.load(namespace, t)
                .agg(F.count(F.lit(1)).alias("n"))
                .select(F.lit(t).alias("t"), "n")
                for t in tables
            ]
            counts = {
                r.t: r.n
                for r in reduce(lambda a, b: a.unionAll(b), branches).collect()
            }
        empty = [t for t, n in counts.items() if n == 0]
        checks.append(
            dict(
                check_type="CLD_DATA_VALIDATION",
                status="SUCCESS" if not empty else "WARNING",
                details=f"counts={counts}",
                cld_table_count=len(tables),
            )
        )
    except Exception as exc:  # noqa: BLE001
        checks.append(
            dict(
                check_type="CLD_DATA_VALIDATION",
                status="FAILED",
                error_msg=str(exc)[:500],
            )
        )

    # 3. PROD view coverage vs CLD tables (`31:378-450`): set difference
    prod_views = set(prod.definitions())
    missing = sorted(set(tables) - prod_views)
    checks.append(
        dict(
            check_type="PROD_VIEW_VALIDATION",
            status="SUCCESS" if not missing else "FAILED",
            details=f"missing_views={missing}" if missing else "all CLD tables covered",
            cld_table_count=len(tables),
            prod_view_count=len(prod_views),
        )
    )

    # 4. grant ensure + audit (`31:197-287`): re-assert the declarative
    # grant set (the reference's idempotent re-GRANT loops), then diff
    # expected vs actual so drift shows up as findings
    if grant_registry is not None and expected_grants is not None:
        from . import grants as G

        try:
            ensured = G.ensure_grants(spark, grant_registry, expected_grants, monitoring)
            audit = G.audit_grants(spark, grant_registry, expected_grants, monitoring)
            checks.append(
                dict(
                    check_type="GRANT_AUDIT",
                    status=audit["status"],
                    details=(
                        f"granted={ensured['granted']} "
                        f"already={ensured['already_present']} "
                        f"missing={audit['missing']} unexpected={audit['unexpected']}"
                    ),
                )
            )
        except Exception as exc:  # noqa: BLE001
            checks.append(
                dict(check_type="GRANT_AUDIT", status="FAILED", error_msg=str(exc)[:500])
            )
    else:
        checks.append(
            dict(
                check_type="GRANT_AUDIT",
                status="SKIPPED",
                details="no grant registry configured",
            )
        )

    # 5. resume suspended tasks (`31:328-376`): failover-group replication
    # lands tasks suspended on the secondary; the heartbeat resumes them
    if scheduler is not None:
        try:
            resumed = scheduler.resume_all()
            checks.append(
                dict(
                    check_type="TASK_RESUME",
                    status="SUCCESS",
                    details=f"resumed={resumed}" if resumed else "no suspended tasks",
                )
            )
        except Exception as exc:  # noqa: BLE001
            checks.append(
                dict(check_type="TASK_RESUME", status="FAILED", error_msg=str(exc)[:500])
            )
    else:
        checks.append(
            dict(
                check_type="TASK_RESUME",
                status="SKIPPED",
                details="no scheduler attached",
            )
        )

    append_rows(
        spark,
        monitoring,
        "secondary_heartbeat_log",
        HEARTBEAT_LOG_SCHEMA,
        checks,
        id_field="heartbeat_id",
    )

    failed = [c["check_type"] for c in checks if c["status"] == "FAILED"]
    return {
        "status": "FAILED" if failed else "SUCCESS",
        "checks_run": len(checks),
        "failed_checks": failed,
        "table_counts": counts,
        "execution_time_ms": int((time.time() - t0) * 1000),
    }


def dr_readiness(spark: SparkSession, monitoring: LakehouseCatalog) -> dict:
    """DR-readiness rollup (`31:663-682`): latest-24h MAX(CASE) per check
    type over the heartbeat log + most recent heartbeat timestamp (A15)."""
    ensure_log_table(monitoring, "secondary_heartbeat_log", HEARTBEAT_LOG_SCHEMA)
    log = monitoring.load(MONITORING_NS, "secondary_heartbeat_log")
    recent = log.filter(
        F.col("heartbeat_timestamp")
        > F.current_timestamp() - F.expr("INTERVAL 24 HOURS")
    )
    row = recent.agg(
        F.max(
            F.when(
                (F.col("check_type") == "CLD_LINK_STATUS") & (F.col("status") == "SUCCESS"),
                True,
            ).otherwise(False)
        ).alias("cld_ready"),
        F.max(
            F.when(
                (F.col("check_type") == "PROD_VIEW_VALIDATION")
                & (F.col("status") == "SUCCESS"),
                True,
            ).otherwise(False)
        ).alias("prod_ready"),
        F.max("heartbeat_timestamp").alias("last_heartbeat"),
        F.count(F.lit(1)).alias("heartbeats_24h"),
    ).collect()[0]
    ready = bool(row.cld_ready and row.prod_ready)
    return {
        "dr_ready": ready,
        "cld_ready": bool(row.cld_ready),
        "prod_ready": bool(row.prod_ready),
        "last_heartbeat": str(row.last_heartbeat),
        "heartbeats_24h": row.heartbeats_24h,
    }
