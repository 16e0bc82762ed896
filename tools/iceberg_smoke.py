#!/usr/bin/env python
"""Real-Iceberg smoke leg for the S5/S6 components (SURVEY.md §2.1).

The engine's session factory wires real ``ext``/``cld`` Iceberg
catalogs the moment an ``iceberg-spark-runtime`` jar is on the
classpath (``session.py``); until then the pure-PySpark lakehouse
emulation provides the same semantics.  This script exercises the REAL
runtime path end to end — create with partition spec, snapshot append,
snapshot listing, time travel, dual-catalog shared-warehouse read —
and asserts parity with the emulation's answers on the same data, so
the two ``partial`` components (S5/S6) flip to ``done`` the day an
environment has the jar.

Reference intent: ``scripts/03_load_iceberg_aws.py:227-231`` (Glue
Iceberg create, partitioned), ``scripts/05_append_campaigns.py:112-123``
(append grows the snapshot list), ``scripts/11_catalog_linked_database
.sql:50-55`` (two access paths, one warehouse).

Run (documented in OPERATIONS.md):

    python tools/iceberg_smoke.py

Exit 0 with ``SKIP`` when no jar is present (offline sandboxes); exit
0 with ``PASS`` when every check holds; nonzero assertion otherwise.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from snowflake_iceberg_cld_bcdr_demo_spark.session import (
        _iceberg_jar_present,
        build_session,
    )

    if not _iceberg_jar_present():
        print(
            "SKIP: no iceberg-spark-runtime jar on the PySpark classpath.\n"
            "Install one (e.g. drop the "
            "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13 jar into "
            "$SPARK_HOME/jars) and rerun."
        )
        return 0

    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    wh = tempfile.mkdtemp(prefix="iceberg-smoke-")
    try:
        spark = build_session(app_name="iceberg-smoke", warehouse=wh)
        emu = LakehouseCatalog(spark, wh + "-emu", name="emu")

        def campaigns(start: int, n: int, dk: str):
            return spark.range(start, start + n).select(
                F.concat(F.lit("CMP-"), F.format_string("%06d", F.col("id"))).alias(
                    "campaign_id"
                ),
                F.lit(dk).alias("date_key"),
                (F.col("id") * 1.5).alias("budget_usd"),
            )

        d1 = campaigns(0, 10, "2024-01-01")
        d2 = campaigns(10, 5, "2024-01-02")

        # S5: create with identity partition spec — real catalog + emulation
        spark.sql("CREATE NAMESPACE IF NOT EXISTS cld.advertising")
        spark.sql("DROP TABLE IF EXISTS cld.advertising.campaigns")
        d1.writeTo("cld.advertising.campaigns").partitionedBy(
            "date_key"
        ).createOrReplace()
        emu.create_table(
            "advertising", "campaigns", d1, partition_by=["date_key"], mode="overwrite"
        )

        # S6: append creates a new snapshot on both sides
        d2.writeTo("cld.advertising.campaigns").append()
        emu.append("advertising", "campaigns", d2)

        real = spark.table("cld.advertising.campaigns")
        emu_df = emu.load("advertising", "campaigns")
        assert real.count() == emu_df.count() == 15, "row count parity"
        assert (
            real.filter(F.col("date_key") == "2024-01-02").count()
            == emu_df.filter(F.col("date_key") == "2024-01-02").count()
            == 5
        ), "partition filter parity"

        # snapshot listing: both sides see create + append
        snaps = spark.sql(
            "SELECT snapshot_id FROM cld.advertising.campaigns.snapshots "
            "ORDER BY committed_at"
        ).collect()
        emu_snaps = emu.snapshots("advertising", "campaigns")
        assert len(snaps) == len(emu_snaps) == 2, (
            f"snapshot count parity: real={len(snaps)} emu={len(emu_snaps)}"
        )

        # time travel to the pre-append snapshot
        first_id = snaps[0].snapshot_id
        tt = spark.read.option("snapshot-id", str(first_id)).table(
            "cld.advertising.campaigns"
        )
        emu_tt = emu.load(
            "advertising", "campaigns", snapshot_id=emu_snaps[0].snapshot_id
        )
        assert tt.count() == emu_tt.count() == 10, "time-travel parity"

        # dual catalog over ONE warehouse (EXT vs CLD access paths)
        assert spark.table("ext.advertising.campaigns").count() == 15, (
            "shared-warehouse dual-catalog read"
        )

        print(
            "PASS: real Iceberg runtime parity — create+partition spec, "
            "append snapshot, snapshot listing (2), time travel (10 rows "
            "pre-append), dual-catalog shared warehouse (15 rows)."
        )
        return 0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(wh + "-emu", ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
