"""Append-only monitoring log sinks (S11).

The reference's log tables use ``NUMBER AUTOINCREMENT`` surrogate keys
(`16_sync_task_primary.sql:48-62`).  Spark has no autoincrement (SURVEY.md
§7 hard parts / W6): ids here are ``base + row_number-within-batch`` where
``base`` is the table's current row count — unique and increasing for the
single-writer scheduler the reference also assumes
(`ALLOW_OVERLAPPING_EXECUTION = FALSE`, `16:486`), contiguity not
guaranteed and not required.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..sources.lakehouse import LakehouseCatalog

MONITORING_NS = "monitoring"


def _now() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)


def ensure_log_table(
    cat: LakehouseCatalog, table: str, schema: T.StructType
) -> None:
    if not cat.table_exists(MONITORING_NS, table):
        empty = cat.spark.createDataFrame([], schema)
        cat.create_table(MONITORING_NS, table, empty, mode="ignore")


def next_id(cat: LakehouseCatalog, table: str) -> int:
    snaps = cat.snapshots(MONITORING_NS, table)
    return (snaps[-1].row_count if snaps else 0) + 1


def append_rows(
    spark: SparkSession,
    cat: LakehouseCatalog,
    table: str,
    schema: T.StructType,
    rows: list[dict],
    id_field: str | None = None,
) -> int:
    """Append dict rows to a monitoring table, assigning surrogate ids
    and a UTC timestamp default for any missing timestamp field."""
    ensure_log_table(cat, table, schema)
    base = next_id(cat, table)
    now = _now()
    out = []
    for i, row in enumerate(rows):
        r = dict(row)
        if id_field and id_field not in r:
            r[id_field] = base + i
        for f in schema.fields:
            if isinstance(f.dataType, T.TimestampType) and r.get(f.name) is None:
                if f.name.endswith("_timestamp") or f.name == "export_timestamp":
                    r[f.name] = now
            r.setdefault(f.name, None)
        out.append(r)
    df = spark.createDataFrame(out, schema)
    cat.append(MONITORING_NS, table, df)
    return len(out)
