"""Materialized-view emulation — the reference's 5 MVs
(`12_materialized_views.sql:38-228`) as persisted lakehouse result tables
with an explicit refresh job.

Spark has no auto-maintained MVs (SURVEY.md §4).  The reference itself
downgrades MVs to plain views in PROD (`16_sync_task_primary.sql:269-302`
"Convert materialized view to regular view"), so the view layer in
:mod:`..adtech.views` is the faithful baseline; this module adds the
performance option: each aggregate view materialized into a lakehouse
table (one `create`/`overwrite` snapshot per refresh — refresh history IS
the snapshot log), a staleness probe comparing MV snapshot time against
source-table snapshot times, and `read_or_build` routing for consumers.

Scale: a refresh is one batch aggregation job per MV — partial-agg +
single shuffle plans (see PLANS.md) — writing results partitioned the same
way the sources are (`date_key` where present), so MV readers keep
partition pruning.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession

from ..adtech import views as V
from ..sources.lakehouse import LakehouseCatalog

MV_NS = "mv"

#: aggregate views that materialize with a date_key column → partitioned
_PARTITIONED = {
    "v_impressions_daily": ["date_key"],
    "v_clicks_daily": ["date_key"],
    "v_conversions_daily": ["date_key"],
    "v_campaign_performance": ["date_key"],
    "v_campaigns_summary": None,
}


def refresh_mv(
    spark: SparkSession,
    cat: LakehouseCatalog,
    namespace: str,
    view: str,
    source_prefix: str = "cld",
) -> dict:
    """Recompute one MV from current source snapshots (the auto-refresh
    the reference gets from Snowflake, here on demand / on schedule)."""
    from .sync import register_catalog_tables

    t0 = time.time()
    sources = register_catalog_tables(spark, cat, namespace, source_prefix)
    df = spark.sql(V.render(view, sources))
    cat.create_table(MV_NS, view, df, partition_by=_PARTITIONED.get(view), mode="overwrite")
    rows = cat.snapshots(MV_NS, view)[-1].row_count
    return {
        "mv": view,
        "rows": rows,
        "refreshed_at": cat.snapshots(MV_NS, view)[-1].committed_at,
        "execution_time_ms": int((time.time() - t0) * 1000),
    }


def refresh_all(
    spark: SparkSession, cat: LakehouseCatalog, namespace: str
) -> list[dict]:
    """Refresh the full MV set (`12:38-228` — the five MVs)."""
    return [refresh_mv(spark, cat, namespace, v) for v in V.AGGREGATE_VIEWS]


def is_stale(cat: LakehouseCatalog, namespace: str, view: str) -> bool:
    """An MV is stale when any source table committed a snapshot after the
    MV's last refresh (the staleness signal Snowflake tracks internally)."""
    if not cat.table_exists(MV_NS, view):
        return True
    mv_time = cat.snapshots(MV_NS, view)[-1].committed_at
    for tbl in V.BASE_TABLES:
        if cat.table_exists(namespace, tbl):
            if cat.snapshots(namespace, tbl)[-1].committed_at > mv_time:
                return True
    return False


def read_or_build(
    spark: SparkSession,
    cat: LakehouseCatalog,
    namespace: str,
    view: str,
    allow_stale: bool = False,
) -> DataFrame:
    """Serve the MV: fresh materialization if available, else refresh
    first (or serve stale when explicitly allowed — the reader's
    freshness/latency dial)."""
    if is_stale(cat, namespace, view) and not (
        allow_stale and cat.table_exists(MV_NS, view)
    ):
        refresh_mv(spark, cat, namespace, view)
    return cat.load(MV_NS, view)
