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
    streams: list | None = None,
    max_live_snapshots: int = 50,
    max_data_dirs: int = 64,
) -> dict:
    """One heartbeat cycle; returns the check report dict.

    ``grant_registry``/``expected_grants`` enable the real grant audit
    (a :class:`.grants.GrantRegistry` + declarative expected set);
    ``scheduler`` enables the task-resume pass; ``streams`` (running
    Structured Streaming queries) enables the ingest-stall check.
    Without them the corresponding checks record SKIPPED, keeping the
    log shape.

    Beyond the reference's count validation (`31:289-305`) the cycle
    also audits TABLE LIFECYCLE health from ``describe_table``'s
    metadata-only counters: pending MoR deletes (reads pay a merge tax
    until compacted), live-snapshot pileup > ``max_live_snapshots``
    (expire_snapshots overdue), and data-dir pileup > ``max_data_dirs``
    (small-file compaction overdue) — the maintenance debt that slowly
    kills scan performance at 100 TB if nobody is alerted."""
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

    # 5. table lifecycle audit: metadata-only describe_table counters
    # per CLD table — pending MoR deletes, snapshot pileup, dir pileup
    try:
        findings: list[str] = []
        lifecycle: dict[str, dict] = {}
        for t in tables:
            d = cld.describe_table(namespace, t)
            live_snaps = d["n_snapshots"] - d["n_expired"]
            lifecycle[t] = {
                "pending_mor_deletes": d["pending_mor_deletes"],
                "live_snapshots": live_snaps,
                "n_data_dirs": d["n_data_dirs"],
                "size_bytes": d["size_bytes"],
                "n_purges": d["n_purges"],
            }
            if d["pending_mor_deletes"]:
                findings.append(f"{t}: {d['pending_mor_deletes']} MoR delete dirs pending compaction")
            if live_snaps > max_live_snapshots:
                findings.append(f"{t}: {live_snaps} live snapshots (expire overdue)")
            if d["n_data_dirs"] > max_data_dirs:
                findings.append(f"{t}: {d['n_data_dirs']} data dirs (compaction overdue)")
        checks.append(
            dict(
                check_type="TABLE_LIFECYCLE",
                status="SUCCESS" if not findings else "WARNING",
                details="; ".join(findings) if findings else f"lifecycle={lifecycle}",
                cld_table_count=len(tables),
            )
        )
    except Exception as exc:  # noqa: BLE001
        checks.append(
            dict(check_type="TABLE_LIFECYCLE", status="FAILED", error_msg=str(exc)[:500])
        )

    # 6. streaming ingest progress: stalls surface exactly like sync lag
    if streams is not None:
        from ..streaming.events import query_progress_frame

        try:
            stalled: list[str] = []
            for q in streams:
                frame = query_progress_frame(spark, q).collect()
                if not q.isActive:
                    stalled.append(f"{q.id}: not active")
                elif frame and all(r.num_input_rows == 0 for r in frame[-3:]):
                    stalled.append(f"{q.id}: no input rows in last {min(len(frame), 3)} batches")
            checks.append(
                dict(
                    check_type="STREAM_PROGRESS",
                    status="SUCCESS" if not stalled else "WARNING",
                    details="; ".join(stalled) if stalled else f"{len(streams)} streams healthy",
                )
            )
        except Exception as exc:  # noqa: BLE001
            checks.append(
                dict(check_type="STREAM_PROGRESS", status="FAILED", error_msg=str(exc)[:500])
            )
    else:
        checks.append(
            dict(
                check_type="STREAM_PROGRESS",
                status="SKIPPED",
                details="no streaming queries attached",
            )
        )

    # 7. resume suspended tasks (`31:328-376`): failover-group replication
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
    type over the heartbeat log + most recent heartbeat timestamp (A15).

    Lifecycle and streaming checks roll up alongside the reference's
    link/view checks: ``lifecycle_clean`` / ``streams_clean`` are True
    when the newest 24h saw at least one SUCCESS (or only SKIPPED) of
    the corresponding check — maintenance debt and ingest stalls gate
    DR readiness in ``maintenance_ready``, reported separately from the
    reference's ``dr_ready`` contract (which keeps its original
    link+view meaning)."""

    def ok(check: str):
        return F.max(
            F.when(
                (F.col("check_type") == check) & (F.col("status") == "SUCCESS"),
                True,
            ).otherwise(False)
        )

    def seen(check: str):
        # the check produced a non-SKIPPED row at all in the window
        return F.max(
            F.when(
                (F.col("check_type") == check) & (F.col("status") != "SKIPPED"),
                True,
            ).otherwise(False)
        )

    ensure_log_table(monitoring, "secondary_heartbeat_log", HEARTBEAT_LOG_SCHEMA)
    log = monitoring.load(MONITORING_NS, "secondary_heartbeat_log")
    recent = log.filter(
        F.col("heartbeat_timestamp")
        > F.current_timestamp() - F.expr("INTERVAL 24 HOURS")
    )
    row = recent.agg(
        ok("CLD_LINK_STATUS").alias("cld_ready"),
        ok("PROD_VIEW_VALIDATION").alias("prod_ready"),
        ok("TABLE_LIFECYCLE").alias("lifecycle_ok"),
        seen("TABLE_LIFECYCLE").alias("lifecycle_seen"),
        ok("STREAM_PROGRESS").alias("streams_ok"),
        seen("STREAM_PROGRESS").alias("streams_seen"),
        F.max("heartbeat_timestamp").alias("last_heartbeat"),
        F.count(F.lit(1)).alias("heartbeats_24h"),
    ).collect()[0]
    ready = bool(row.cld_ready and row.prod_ready)
    lifecycle_clean = bool(row.lifecycle_ok) or not bool(row.lifecycle_seen)
    streams_clean = bool(row.streams_ok) or not bool(row.streams_seen)
    return {
        "dr_ready": ready,
        "cld_ready": bool(row.cld_ready),
        "prod_ready": bool(row.prod_ready),
        "lifecycle_clean": lifecycle_clean,
        "streams_clean": streams_clean,
        "maintenance_ready": ready and lifecycle_clean and streams_clean,
        "last_heartbeat": str(row.last_heartbeat),
        "heartbeats_24h": row.heartbeats_24h,
    }
