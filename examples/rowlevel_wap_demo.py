#!/usr/bin/env python
"""Round-3 lakehouse features, end to end: row-level DELETE / UPDATE /
MERGE INTO (file-level copy-on-write), write-audit-publish with a
data-quality gate, streaming CDC apply, SCD2 dimension versioning, and
the snapshot changelog.

Run: ``python examples/rowlevel_wap_demo.py [warehouse_dir]``
"""

from __future__ import annotations

import datetime as dt
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from snowflake_iceberg_cld_bcdr_demo_spark.jobs import scd  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.operators import quality as Q  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session  # noqa: E402
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (  # noqa: E402
    LakehouseCatalog,
)


def main() -> None:
    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="rowlevel-wap-")
    spark = build_session(app_name="rowlevel-wap-demo")
    spark.sparkContext.setLogLevel("ERROR")
    cat = LakehouseCatalog(spark, wh)
    report: dict = {"warehouse": wh}

    def accounts(lo, hi, status="ok"):
        return spark.range(lo, hi).select(
            F.col("id"),
            F.lit(status).alias("status"),
            (F.col("id") * 1.5).alias("balance"),
        )

    # 1. row-level ops with copy-on-write dir pruning ----------------------
    cat.create_table("bank", "accounts", accounts(0, 1000))
    cat.append("bank", "accounts", accounts(1000, 2000))
    before = cat.current_snapshot("bank", "accounts")
    snap = cat.delete_where("bank", "accounts", [("id", ">=", 1900)])
    report["delete"] = {
        "rows_after": snap.row_count,
        "dirs_carried_untouched": sum(d in before.data_dirs for d in snap.data_dirs),
    }
    cat.update_where(
        "bank", "accounts", {"status": F.lit("vip")}, [("id", "<", 10)]
    )
    cat.merge_into(
        "bank", "accounts",
        spark.createDataFrame(
            [(5, "frozen", 0.0), (5000, "new", 9.0)],
            "id long, status string, balance double",
        ),
        on=["id"],
        when_matched_update={"status": "s.status", "balance": "s.balance"},
        when_not_matched_insert=True,
    )
    report["after_merge_rows"] = cat.load("bank", "accounts").count()

    # 2. write-audit-publish with the quality gate -------------------------
    rules = [Q.not_null("status"), Q.in_range("balance", lo=0.0), Q.unique(["id"])]
    bad = spark.createDataFrame([(7000, None, -3.0)], "id long, status string, balance double")
    cat.append("bank", "accounts", bad, branch="incoming")
    try:
        Q.enforce(cat.load("bank", "accounts", ref="incoming"), rules)
        raise AssertionError("gate should have failed")
    except ValueError as e:
        report["wap_rejected"] = str(e)[:80]
        cat.drop_ref("bank", "accounts", "incoming")
    good = spark.createDataFrame([(7000, "ok", 3.0)], "id long, status string, balance double")
    cat.append("bank", "accounts", good, branch="incoming")
    Q.enforce(cat.load("bank", "accounts", ref="incoming"), rules)
    head = cat.publish_branch("bank", "accounts", "incoming")
    cat.create_tag("bank", "accounts", "post-publish")
    report["wap_published_rows"] = head.row_count

    # 3. changelog since the pre-delete snapshot ---------------------------
    cl = cat.changelog("bank", "accounts", before.snapshot_id)
    report["changelog"] = {
        r._change_type: r.n
        for r in cl.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }

    # 4. SCD2 dimension ----------------------------------------------------
    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "cust_id long, segment string"
    )
    scd.scd2_init(cat, "bank", "customer_dim", dim, t0)
    scd.scd2_apply(
        cat, "bank", "customer_dim",
        spark.createDataFrame([(1, "platinum"), (2, "silver"), (3, "bronze")],
                              "cust_id long, segment string"),
        key_cols=["cust_id"], tracked_cols=["segment"], effective=t1,
    )
    report["scd2"] = {
        "current": scd.scd2_current(cat, "bank", "customer_dim").count(),
        "as_of_feb": scd.scd2_as_of(
            cat, "bank", "customer_dim", dt.datetime(2024, 2, 1)
        ).count(),
        "history_rows": cat.load("bank", "customer_dim").count(),
    }

    # 5. refs metadata -----------------------------------------------------
    report["refs"] = [
        (r.name, r.type, r.snapshot_id)
        for r in cat.metadata_table("bank", "accounts", "refs").collect()
    ]

    print(json.dumps(report, indent=2, default=str))


if __name__ == "__main__":
    main()
