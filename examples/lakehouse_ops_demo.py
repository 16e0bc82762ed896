#!/usr/bin/env python
"""Lakehouse table-lifecycle demo: every maintenance operation the
catalog supports, end to end on one table — create (hidden-partitioned) →
append → schema evolution → time travel (id + timestamp) → MERGE upsert →
compaction → rollback → snapshot expiry → orphan cleanup → metadata
tables → data-skipping reads.

Run: ``python examples/lakehouse_ops_demo.py [warehouse_dir]``
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (  # noqa: E402
    LakehouseCatalog,
)


def main() -> None:
    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lakehouse-ops-")
    spark = build_session(app_name="lakehouse-ops-demo")
    spark.sparkContext.setLogLevel("ERROR")
    cat = LakehouseCatalog(spark, wh)
    report: dict = {"warehouse": wh}

    def frame(n: int, start: int = 0, extra_col: bool = False):
        df = spark.range(start, start + n).select(
            F.col("id"),
            F.concat(F.lit("2024-0"), (F.col("id") % 3 + 1).cast("string"), F.lit("-15")
                     ).alias("event_date"),
            (F.col("id") % 100).cast("double").alias("amount"),
        )
        return df.withColumn("channel", F.lit("web")) if extra_col else df

    # 1. create with hidden partitioning (months + bucket)
    cat.create_table("ops", "tx", frame(100),
                     partition_by=["months(event_date)", "bucket(4, id)"])
    t_v1 = time.time()

    # 2. append + schema evolution (new column arrives)
    cat.append("ops", "tx", frame(50, start=1000, extra_col=True))
    report["schema_history"] = cat.schema_history("ops", "tx")

    # 3. time travel both ways
    report["rows_now"] = cat.load("ops", "tx").count()
    report["rows_at_v1"] = cat.load("ops", "tx", snapshot_id=1).count()
    report["rows_as_of_ts"] = cat.load("ops", "tx", as_of_timestamp=t_v1).count()

    # 4. MERGE upsert (update 10 rows, insert 5 new)
    updates = frame(15, start=95, extra_col=True).withColumn("amount", F.lit(999.0))
    cat.merge_upsert("ops", "tx", updates, key_cols=["id"])
    report["rows_after_merge"] = cat.load("ops", "tx").count()

    # 5. compact the accumulated dirs, then roll back the compaction
    cat.compact("ops", "tx", target_file_partitions=4)
    pre_rollback = cat.current_snapshot("ops", "tx").snapshot_id
    cat.rollback_to_snapshot("ops", "tx", pre_rollback - 1)
    report["head_after_rollback"] = cat.current_snapshot("ops", "tx").snapshot_id

    # 6. expire everything but the newest two snapshots + drop orphans
    report["expire"] = cat.expire_snapshots("ops", "tx", keep_last=2)
    report["orphans"] = cat.remove_orphan_files("ops", "tx", older_than_s=0.0)

    # 7. metadata tables + data-skipping read
    report["snapshots"] = [
        (r.snapshot_id, r.operation, r.total_rows, r.expired)
        for r in cat.metadata_table("ops", "tx", "snapshots").collect()
    ]
    report["partition_spec"] = [
        (r.field, r.transform) for r in cat.metadata_table("ops", "tx", "partitions").collect()
    ]
    pruned = cat.load("ops", "tx", filters=[("event_date", ">=", "2024-03-01")])
    report["march_rows"] = pruned.count()

    # 8. round-3 scale features on a second table: Z-order clustering,
    # Bloom point-lookup skipping, metadata-only counts, spec evolution
    pts = spark.range(4000).select(
        F.col("id"),
        F.pmod(F.col("id") * 2654435761, F.lit(9973)).alias("x"),
        F.pmod(F.col("id") * 40503 + 17, F.lit(9973)).alias("y"),
    )
    cat.create_table("ops", "pts", pts, bloom_filter_cols=["id"])
    cat.append("ops", "pts", pts.select((F.col("id") + 10000).alias("id"), "x", "y"))
    cat.compact("ops", "pts", target_file_partitions=16, cluster_by=["x", "y"])
    pv = cat.prune_preview("ops", "pts", [("x", "<", 500)])
    report["zorder_files_skipped"] = sum(len(v) for v in pv["skipped_files"].values())
    report["zorder_files_kept"] = sum(len(v) for v in pv["kept_files"].values())
    report["count_where"] = cat.count_where("ops", "pts", [("x", ">=", 0)])["count"]
    cat.alter_partition_spec("ops", "pts", ["bucket(8, id)"])
    cat.append("ops", "pts", pts.select((F.col("id") + 20000).alias("id"), "x", "y"))
    report["rows_after_spec_evolution"] = cat.load("ops", "pts").count()

    print(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
