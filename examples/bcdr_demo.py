#!/usr/bin/env python
"""End-to-end BCDR lifecycle demo (the reference's README runbook,
compressed): generate → ingest to the lakehouse → dual-catalog access →
sync PROD views → heartbeat → snapshot append → drift check → failover.

Run: ``python examples/bcdr_demo.py [warehouse_dir]``
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from snowflake_iceberg_cld_bcdr_demo_spark.adtech.generate import (  # noqa: E402
    GeneratorConfig,
    generate_all,
)
from snowflake_iceberg_cld_bcdr_demo_spark.jobs import bcdr, drift, heartbeat, sync  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session  # noqa: E402


def main() -> None:
    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="lakehouse-")
    spark = build_session(app_name="bcdr-demo")
    spark.sparkContext.setLogLevel("ERROR")
    ns = "advertising"

    print(f"== warehouse: {wh}")

    # 1. generate + ingest (scripts/02 + 03 analog)
    primary = bcdr.make_account(spark, wh, "primary", role="primary")
    data = generate_all(spark, GeneratorConfig(num_campaigns=20, impressions_per_campaign=500))
    for name, df in data.items():
        parts = ["date_key"] if name != "campaigns" else None
        primary.catalog.create_table(ns, name, df, partition_by=parts, mode="overwrite")
    print("== ingested:", {t: primary.catalog.load(ns, t).count() for t in primary.catalog.list_tables(ns)})

    # 2. EXT registration (scripts/10) + sync PROD views (scripts/16)
    for t in primary.catalog.list_tables(ns):
        primary.ext.register(f"EXT_{t.upper()}", ns, t)
    print("== sync:", json.dumps(sync.sync_prod_database(spark, primary.catalog, ns, primary.prod)))

    # 3. heartbeat (scripts/31)
    print("== heartbeat:", json.dumps(heartbeat.secondary_heartbeat(spark, primary.catalog, ns, primary.prod)))

    # 4. snapshot append (scripts/05): 10 new campaigns
    extra = generate_all(spark, GeneratorConfig(num_campaigns=10, impressions_per_campaign=1, seed=43))
    before = len(primary.catalog.snapshots(ns, "campaigns"))
    primary.catalog.append(ns, "campaigns", extra["campaigns"])
    after = len(primary.catalog.snapshots(ns, "campaigns"))
    print(f"== append: snapshots {before} -> {after}, rows now "
          f"{primary.catalog.load(ns, 'campaigns').count()}")

    # 5. replicate definitions to the DR account (scripts/20/21, zero-copy)
    secondary = bcdr.make_account(spark, wh, "secondary", role="replica")
    print("== replicate:", json.dumps(bcdr.replicate_definitions(primary, secondary)))
    print("== consistency:", json.dumps(bcdr.validate_consistency(spark, primary, secondary, ns)))

    # 6. drift check (scripts/33)
    drift.export_schema_metadata(spark, "primary", "prod", {"prod": primary.prod}, primary.catalog, "meta_p")
    drift.export_schema_metadata(spark, "secondary", "prod", {"prod": secondary.prod}, primary.catalog, "meta_s")
    report = drift.detect_schema_drift(
        spark,
        primary.catalog.load("monitoring", "meta_p"),
        primary.catalog.load("monitoring", "meta_s"),
        primary.catalog,
    )
    print("== drift:", json.dumps(report))

    # 7. failover (scripts/21): promote the secondary, query through it
    print("== failover:", json.dumps(bcdr.promote(secondary, old_primary=primary)))
    secondary.prod.apply(spark, prefix="dr")
    top = (
        spark.table("dr_v_campaign_performance")
        .orderBy("campaign_id", "date_key")
        .limit(3)
        .collect()
    )
    print("== post-failover query rows:", len(top), "first:", top[0].campaign_id if top else None)
    print("== DONE")


if __name__ == "__main__":
    main()
