"""Primary sync job — port of the ``SYNC_PROD_DATABASE()`` stored
procedure (F1, `16_sync_task_primary.sql:93-476`).

Every 5 minutes the reference introspects the CLD for tables, (re)creates
``SELECT *`` PROD passthrough views for each, replays the five aggregate
views (the "MV downgrade" layer, `16:269-302`), logs every action to
``SYNC_LOG``, and returns a VARIANT report (`16:424-475`).  Here:

- table discovery = :meth:`LakehouseCatalog.list_tables` (the
  INFORMATION_SCHEMA query at `16:121-132`),
- view creation = rendering the SQL templates in :mod:`..adtech.views`
  against the CLD-prefixed temp-view names (the EXT→CLD rewrite of
  `16:245-252` by parameterization) and persisting them in the PROD
  :class:`ViewRegistry`,
- the COUNT(*) probe per view (`16:206-207`) validates each definition,
- log rows append to the ``monitoring.sync_log`` lakehouse table (S11).
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession

from ..adtech import views as V
from ..adtech.schemas import SYNC_LOG_SCHEMA
from ..sources.lakehouse import LakehouseCatalog, ViewRegistry
from .logs import append_rows


def register_catalog_tables(
    spark: SparkSession, cat: LakehouseCatalog, namespace: str, prefix: str
) -> dict[str, str]:
    """Expose every catalog table as a `{prefix}_{table}` temp view;
    returns table → temp-view-name (the view templates' source map)."""
    out = {}
    for tbl in cat.list_tables(namespace):
        name = f"{prefix}_{tbl}"
        cat.load(namespace, tbl).createOrReplaceTempView(name)
        out[tbl] = name
    return out


def sync_prod_database(
    spark: SparkSession,
    cld: LakehouseCatalog,
    namespace: str,
    prod: ViewRegistry,
    monitoring: LakehouseCatalog | None = None,
    source_prefix: str = "cld",
) -> dict:
    """One sync cycle; returns the report dict the proc returned as
    VARIANT (`16:427-433,474-475`)."""
    t0 = time.time()
    report = {
        "status": "SUCCESS",
        "views_created": 0,
        "views_failed": 0,
        "tables_found": 0,
        "errors": [],
    }
    log_rows: list[dict] = []
    monitoring = monitoring or cld

    sources = register_catalog_tables(spark, cld, namespace, source_prefix)
    report["tables_found"] = len(sources)

    # 1. passthrough view per discovered table (`16:190-215`)
    for tbl, src in sorted(sources.items()):
        t_view = time.time()
        try:
            sql = f"SELECT * FROM {src}"
            row_count = spark.sql(sql).count()  # the COUNT(*) probe `16:206-207`
            prod.create_or_replace(tbl, sql)
            report["views_created"] += 1
            log_rows.append(
                dict(
                    sync_type="TABLE_SYNC",
                    source_database=cld.name,
                    source_schema=namespace,
                    object_type="VIEW",
                    object_name=tbl,
                    action="CREATE_OR_REPLACE",
                    status="SUCCESS",
                    row_count=row_count,
                    execution_time_ms=int((time.time() - t_view) * 1000),
                )
            )
        except Exception as exc:  # noqa: BLE001 — per-object isolation like the proc
            report["views_failed"] += 1
            report["errors"].append(f"{tbl}: {exc}")
            log_rows.append(
                dict(
                    sync_type="TABLE_SYNC",
                    source_database=cld.name,
                    source_schema=namespace,
                    object_type="VIEW",
                    object_name=tbl,
                    action="CREATE_OR_REPLACE",
                    status="FAILED",
                    error_message=str(exc)[:500],
                    execution_time_ms=int((time.time() - t_view) * 1000),
                )
            )

    # 2. aggregate views (`16:304-422`) — only when all 4 base tables exist
    if all(t in sources for t in V.BASE_TABLES):
        for view in V.AGGREGATE_VIEWS:
            t_view = time.time()
            try:
                sql = V.render(view, sources)
                row_count = spark.sql(sql).count()
                prod.create_or_replace(view, sql)
                report["views_created"] += 1
                log_rows.append(
                    dict(
                        sync_type="AGG_VIEW_SYNC",
                        source_database=cld.name,
                        source_schema=namespace,
                        object_type="VIEW",
                        object_name=view,
                        action="CREATE_OR_REPLACE",
                        status="SUCCESS",
                        row_count=row_count,
                        execution_time_ms=int((time.time() - t_view) * 1000),
                    )
                )
            except Exception as exc:  # noqa: BLE001
                report["views_failed"] += 1
                report["errors"].append(f"{view}: {exc}")
                log_rows.append(
                    dict(
                        sync_type="AGG_VIEW_SYNC",
                        source_database=cld.name,
                        source_schema=namespace,
                        object_type="VIEW",
                        object_name=view,
                        action="CREATE_OR_REPLACE",
                        status="FAILED",
                        error_message=str(exc)[:500],
                        execution_time_ms=int((time.time() - t_view) * 1000),
                    )
                )
    else:
        report["status"] = "PARTIAL"
        report["errors"].append("base tables incomplete; aggregate views skipped")

    # 3. heartbeat row (`16:451-454`)
    log_rows.append(
        dict(
            sync_type="HEARTBEAT",
            source_database=cld.name,
            source_schema=namespace,
            object_type="TASK",
            object_name="sync_prod_database",
            action="COMPLETE",
            status=report["status"] if not report["views_failed"] else "PARTIAL",
            row_count=report["views_created"],
            execution_time_ms=int((time.time() - t0) * 1000),
        )
    )
    append_rows(spark, monitoring, "sync_log", SYNC_LOG_SCHEMA, log_rows, id_field="sync_id")
    if report["views_failed"]:
        report["status"] = "PARTIAL"
    report["execution_time_ms"] = int((time.time() - t0) * 1000)
    return report
