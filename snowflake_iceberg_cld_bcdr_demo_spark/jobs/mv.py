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


# -- incremental refresh ----------------------------------------------

#: date_key-carrying fact sources per MV.  ``campaigns`` is a dimension:
#: a campaign change fans out to every date that campaign served, so any
#: campaigns delta forces a full refresh instead of a partition patch.
_FACT_SOURCES: dict[str, list[str]] = {
    "v_impressions_daily": ["impressions"],
    "v_clicks_daily": ["clicks"],
    "v_conversions_daily": ["conversions"],
    "v_campaign_performance": ["impressions", "clicks", "conversions"],
    # v_campaigns_summary is dim-rooted → always full.
}


def _cursor_path(cat: LakehouseCatalog, view: str) -> str:
    import os

    return os.path.join(cat.warehouse, MV_NS, f"_{view}.cursors.json")


def _read_cursors(cat: LakehouseCatalog, view: str) -> dict | None:
    import json
    import os

    p = _cursor_path(cat, view)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _capture_cursors(cat: LakehouseCatalog, namespace: str) -> dict:
    """Snapshot-id + uuid per base table, captured BEFORE a refresh runs.
    If a source append lands while the refresh executes, the stale cursor
    makes the NEXT cycle re-patch those dates (idempotent) instead of
    silently skipping them — cursors must never run ahead of what the
    refresh actually read."""
    return {
        tbl: {
            "snapshot_id": cat.snapshots(namespace, tbl)[-1].snapshot_id,
            "table_uuid": cat.table_uuid(namespace, tbl),
        }
        for tbl in V.BASE_TABLES
        if cat.table_exists(namespace, tbl)
    }


def _write_cursors(cat: LakehouseCatalog, view: str, cursors: dict) -> None:
    """Persist captured cursors (atomic rename, like the manifest)."""
    import json
    import os

    p = _cursor_path(cat, view)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cursors, f)
    os.replace(tmp, p)


def refresh_incremental(
    spark: SparkSession,
    cat: LakehouseCatalog,
    namespace: str,
    view: str,
    source_prefix: str = "cld",
) -> dict:
    """Refresh an MV by recomputing ONLY the ``date_key`` partitions its
    fact-source deltas touched (exact for every aggregate — AVG and
    COUNT DISTINCT included — because changed partitions are recomputed
    from scratch, not merged).

    Decision ladder per refresh:
    - no previous cursor / dim (campaigns) delta / source lineage reset →
      full refresh (safe fallback),
    - fact deltas only → changed dates = union of ``date_key`` values in
      the deltas (driver-sized: dates, not rows); the view SQL re-runs
      with ``date_key IN (changed)`` — partition-pruned at the fact scan —
      and `replace_partitions` swaps the results in,
    - no deltas at all → no-op.

    At 100 TB this is the difference between re-aggregating the full fact
    history every cycle and touching yesterday's partitions: compute is
    proportional to new data, like Snowflake's own MV maintenance."""
    from ..streaming.events import incremental_snapshot_read
    from .sync import register_catalog_tables

    t0 = time.time()
    facts = _FACT_SOURCES.get(view)
    cursors = _read_cursors(cat, view)
    # Capture cursors BEFORE any read/refresh: a concurrent append during
    # the refresh then leaves the cursor behind (next cycle re-patches,
    # idempotent) rather than ahead (data silently skipped).
    pre = _capture_cursors(cat, namespace)
    if facts is None or cursors is None or not cat.table_exists(MV_NS, view):
        out = refresh_mv(spark, cat, namespace, view)
        _write_cursors(cat, view, pre)
        return {**out, "mode": "full", "changed_partitions": None}

    # Dim drift or lineage reset → full.
    for tbl in V.BASE_TABLES:
        cur = cursors.get(tbl)
        if cur is None or cat.table_uuid(namespace, tbl) != cur["table_uuid"]:
            out = refresh_mv(spark, cat, namespace, view)
            _write_cursors(cat, view, pre)
            return {**out, "mode": "full", "changed_partitions": None}
    if facts and "campaigns" not in facts:
        camp_delta, _ = incremental_snapshot_read(
            cat, namespace, "campaigns", cursors["campaigns"]["snapshot_id"]
        )
        if camp_delta is not None:
            out = refresh_mv(spark, cat, namespace, view)
            _write_cursors(cat, view, pre)
            return {**out, "mode": "full", "changed_partitions": None}

    changed: set[str] = set()
    read_up_to: dict = dict(cursors)
    for tbl in facts:
        delta, latest = incremental_snapshot_read(
            cat, namespace, tbl, cursors[tbl]["snapshot_id"]
        )
        read_up_to[tbl] = {
            "snapshot_id": latest,
            "table_uuid": cursors[tbl]["table_uuid"],
        }
        if delta is not None:
            changed.update(r.date_key for r in delta.select("date_key").distinct().collect())
    if not changed:
        # Still advance cursors past zero-row deltas (e.g. an empty
        # append), else every later cycle re-reads the same empty dirs.
        if read_up_to != cursors:
            _write_cursors(cat, view, read_up_to)
        return {
            "mv": view,
            "mode": "noop",
            "rows": cat.snapshots(MV_NS, view)[-1].row_count,
            "changed_partitions": 0,
            "execution_time_ms": int((time.time() - t0) * 1000),
        }

    from pyspark.sql import functions as F

    sources = register_catalog_tables(spark, cat, namespace, source_prefix)
    patch = spark.sql(V.render(view, sources)).filter(F.col("date_key").isin(sorted(changed)))
    cat.replace_partitions(MV_NS, view, patch, "date_key", sorted(changed))
    # advance fact cursors only to the snapshots the deltas actually
    # covered; dims keep their pre-captured position
    _write_cursors(cat, view, read_up_to)
    return {
        "mv": view,
        "mode": "incremental",
        "rows": cat.snapshots(MV_NS, view)[-1].row_count,
        "changed_partitions": len(changed),
        "execution_time_ms": int((time.time() - t0) * 1000),
    }
