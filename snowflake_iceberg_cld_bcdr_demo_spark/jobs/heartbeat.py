"""Secondary heartbeat/validation job — port of
``SECONDARY_RESILIENT_HEARTBEAT()`` (F2, `31_sync_task_secondary.sql:104-525`).

The reference's proc runs up to 10 checks every 5 minutes on the DR side:
CLD link status (`31:144-171`), per-table count validation (`31:289-305`),
PROD-view-vs-CLD-table coverage (set difference, `31:378-450`), and a
DR-readiness rollup over the last 24h of heartbeats (`31:663-682`, A15).
Grant-audit checks (`31:197-287`) are Snowflake RBAC — out of engine scope
(SURVEY.md §1.1), recorded as a SKIPPED check so the log shape matches.
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
) -> dict:
    """One heartbeat cycle; returns the check report dict."""
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
        for tbl in tables:
            counts[tbl] = cld.load(namespace, tbl).count()
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

    # 4. grant audit — RBAC is out of engine scope; explicit skip record
    checks.append(
        dict(
            check_type="GRANT_AUDIT",
            status="SKIPPED",
            details="RBAC grants are platform-level; not modeled (SURVEY §1.1)",
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
