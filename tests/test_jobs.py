"""Job-layer tests: sync, heartbeat, drift, BCDR failover, scheduler —
the reference's F1-F5 procedures and its embedded validation suite
(SURVEY.md §5)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.adtech.generate import (
    GeneratorConfig,
    generate_all,
)
from snowflake_iceberg_cld_bcdr_demo_spark.jobs import bcdr, drift, heartbeat, sync
from snowflake_iceberg_cld_bcdr_demo_spark.jobs.logs import MONITORING_NS
from snowflake_iceberg_cld_bcdr_demo_spark.jobs.scheduler import Scheduler
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
    LakehouseCatalog,
    ViewRegistry,
)


@pytest.fixture(scope="module")
def stack(spark, tmp_path_factory):
    """Warehouse seeded with the 4 advertising tables (small config)."""
    wh = str(tmp_path_factory.mktemp("wh"))
    cat = LakehouseCatalog(spark, wh, name="cld")
    cfg = GeneratorConfig(num_campaigns=8, impressions_per_campaign=150)
    data = generate_all(spark, cfg)
    ns = "advertising"
    for name, df in data.items():
        parts = ["date_key"] if name != "campaigns" else None
        cat.create_table(ns, name, df, partition_by=parts)
    return {"wh": wh, "cat": cat, "ns": ns, "cfg": cfg}


def test_sync_creates_views_and_logs(spark, stack):
    prod = ViewRegistry(stack["wh"], "prod")
    report = sync.sync_prod_database(spark, stack["cat"], stack["ns"], prod)
    assert report["status"] == "SUCCESS"
    assert report["tables_found"] == 4
    # 4 passthrough + 5 aggregate views (`16:190-215,304-422`)
    assert report["views_created"] == 9
    assert set(prod.definitions()) >= {
        "campaigns",
        "impressions",
        "clicks",
        "conversions",
        "v_campaign_performance",
    }
    log = stack["cat"].load(MONITORING_NS, "sync_log")
    assert log.filter(F.col("status") == "SUCCESS").count() >= 9
    assert log.filter(F.col("sync_type") == "HEARTBEAT").count() == 1
    # ids unique (W6 surrogate key)
    assert log.select("sync_id").distinct().count() == log.count()

    # idempotent re-run appends a second batch of log rows
    report2 = sync.sync_prod_database(spark, stack["cat"], stack["ns"], prod)
    assert report2["views_created"] == 9
    log2 = stack["cat"].load(MONITORING_NS, "sync_log")
    assert log2.count() == log.count() * 2
    assert log2.select("sync_id").distinct().count() == log2.count()


def test_prod_views_query_correctly(spark, stack):
    prod = ViewRegistry(stack["wh"], "prod")
    sync.sync_prod_database(spark, stack["cat"], stack["ns"], prod)
    created = prod.apply(spark, prefix="prod")
    assert "prod_v_campaign_performance" in created
    perf = spark.table("prod_v_campaign_performance")
    assert perf.count() > 0
    tot = perf.agg(
        F.sum("impressions").alias("i"), F.sum("clicks").alias("c")
    ).collect()[0]
    assert tot.i == stack["cat"].load(stack["ns"], "impressions").count()
    assert tot.c == stack["cat"].load(stack["ns"], "clicks").count()


def test_heartbeat_checks(spark, stack):
    prod = ViewRegistry(stack["wh"], "prod")
    sync.sync_prod_database(spark, stack["cat"], stack["ns"], prod)
    report = heartbeat.secondary_heartbeat(spark, stack["cat"], stack["ns"], prod)
    assert report["status"] == "SUCCESS"
    assert report["failed_checks"] == []
    assert report["table_counts"]["campaigns"] == 8

    # drop a prod view → coverage check fails (`31:378-450`)
    prod.drop("clicks")
    report2 = heartbeat.secondary_heartbeat(spark, stack["cat"], stack["ns"], prod)
    assert "PROD_VIEW_VALIDATION" in report2["failed_checks"]
    sync.sync_prod_database(spark, stack["cat"], stack["ns"], prod)  # restore

    ready = heartbeat.dr_readiness(spark, stack["cat"])
    assert ready["cld_ready"] is True
    assert ready["heartbeats_24h"] >= 8  # two runs × 4 checks
    # lifecycle counters rolled in (all tables healthy here); streams
    # never attached -> SKIPPED counts as clean, maintenance_ready holds
    assert ready["lifecycle_clean"] is True
    assert ready["streams_clean"] is True
    assert ready["maintenance_ready"] is (ready["dr_ready"] and True)


def test_heartbeat_lifecycle_flags_maintenance_debt(spark, tmp_path):
    """TABLE_LIFECYCLE warns (not fails) on pending MoR deletes, and the
    counters land in the heartbeat log for trend queries."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh_lc"), name="cld")
    ns = "lc"
    cat.create_table(ns, "t", spark.range(20).select(F.col("id")))
    prod = ViewRegistry(str(tmp_path / "wh_lc"), "prod_lc")
    sync.sync_prod_database(spark, cat, ns, prod)
    # leave an uncompacted MoR delete
    cat.delete_where_mor(ns, "t", [("id", "=", 1)])

    report = heartbeat.secondary_heartbeat(spark, cat, ns, prod)
    assert report["status"] == "SUCCESS"  # WARNING does not fail the cycle
    log = cat.load(MONITORING_NS, "secondary_heartbeat_log")
    lc = log.filter(F.col("check_type") == "TABLE_LIFECYCLE").orderBy(
        F.col("heartbeat_id").desc()
    ).collect()
    assert lc and lc[0].status == "WARNING"
    assert "MoR delete dirs pending compaction" in lc[0].details

    # compacting clears the debt: next cycle reports SUCCESS w/ counters
    cat.compact(ns, "t")
    heartbeat.secondary_heartbeat(spark, cat, ns, prod)
    lc2 = cat.load(MONITORING_NS, "secondary_heartbeat_log").filter(
        F.col("check_type") == "TABLE_LIFECYCLE"
    ).orderBy(F.col("heartbeat_id").desc()).collect()
    assert lc2[0].status == "SUCCESS"
    assert "live_snapshots" in lc2[0].details


def test_drift_detection_and_resync(spark, stack):
    wh = stack["wh"]
    p_reg = ViewRegistry(wh, "prodA")
    s_reg = ViewRegistry(wh, "prodB")
    sync.sync_prod_database(spark, stack["cat"], stack["ns"], p_reg)
    sync.sync_prod_database(spark, stack["cat"], stack["ns"], s_reg)

    # inject drift: mutate one definition, drop another, add an extra
    s_reg.create_or_replace("v_clicks_daily", "SELECT 1 AS tampered")
    s_reg.drop("campaigns")
    s_reg.create_or_replace("only_on_secondary", "SELECT 2 AS extra")

    mon = stack["cat"]
    drift.export_schema_metadata(spark, "acctA", "prod", {"prod": p_reg}, mon, "meta_a")
    drift.export_schema_metadata(spark, "acctB", "prod", {"prod": s_reg}, mon, "meta_b")
    pm = mon.load(MONITORING_NS, "meta_a")
    sm = mon.load(MONITORING_NS, "meta_b")

    report = drift.detect_schema_drift(spark, pm, sm, mon)
    assert report["status"] == "DRIFT_DETECTED"
    assert report["missing_on_secondary"] == 1  # campaigns
    assert report["missing_on_primary"] == 1  # only_on_secondary
    assert report["definition_mismatch"] == 1  # v_clicks_daily
    assert report["truncated"] is False
    log = mon.load(MONITORING_NS, "schema_drift_log")
    assert log.filter(F.col("status") == "DETECTED").count() == 3

    # the driver-OOM guard: a pathological cap caps each category and
    # reports the truncation so an operator re-runs scoped
    capped = drift.detect_schema_drift(spark, pm, sm, mon, max_findings=0)
    assert capped["truncated"] is True
    assert (
        capped["missing_on_secondary"]
        == capped["missing_on_primary"]
        == capped["definition_mismatch"]
        == 0
    )

    # auto-resync copies primary definitions over (`33:450-497`)
    report2 = drift.detect_schema_drift(spark, pm, sm, mon, auto_resync_into=s_reg)
    assert report2["resynced"] == 2
    drift.export_schema_metadata(spark, "acctB", "prod", {"prod": s_reg}, mon, "meta_b2")
    report3 = drift.detect_schema_drift(
        spark, pm, mon.load(MONITORING_NS, "meta_b2"), mon
    )
    # only the secondary-extra object remains (resync never deletes)
    assert report3["missing_on_secondary"] == 0
    assert report3["definition_mismatch"] == 0
    assert report3["missing_on_primary"] == 1


def test_bcdr_failover_lifecycle(spark, stack):
    wh = stack["wh"]
    primary = bcdr.make_account(spark, wh, "primary_acct", role="primary")
    secondary = bcdr.make_account(spark, wh, "secondary_acct", role="replica")
    ns = stack["ns"]

    # primary registers EXT tables + PROD views
    for t in primary.catalog.list_tables(ns):
        primary.ext.register(f"EXT_{t.upper()}", ns, t)
    sync.sync_prod_database(spark, primary.catalog, ns, primary.prod)

    rep = bcdr.replicate_definitions(primary, secondary)
    assert rep["data_files_copied"] == 0  # zero-copy DR
    assert rep["ext_tables_replicated"] == 4
    assert rep["views_replicated"] == 9

    # shared storage: both accounts see identical counts (RPO=0)
    results = bcdr.validate_consistency(spark, primary, secondary, ns)
    assert all(r["verdict"] == "MATCH" for r in results)
    assert len(results) == 4

    # replica is read-only until promoted (`21:209`)
    assert not secondary.is_writable
    with pytest.raises(PermissionError):
        bcdr.replicate_definitions(secondary, primary)

    out = bcdr.promote(secondary, old_primary=primary)
    assert out["status"] == "PROMOTED"
    assert secondary.is_writable and not primary.is_writable
    # promoted account serves the replicated views
    created = secondary.prod.apply(spark, prefix="dr")
    assert "dr_v_campaign_performance" in created
    assert spark.table("dr_v_campaign_performance").count() > 0
    # failback
    bcdr.promote(primary, old_primary=secondary)
    assert primary.is_writable and not secondary.is_writable


def test_prod_independence_migration(spark, stack):
    """Failover → migrate → failback (`32_migrate_prod_db_independent.sql`):
    the secondary's PROD views rebind from the replicated definitions to
    its own CLD with provably identical results."""
    wh = stack["wh"]
    ns = stack["ns"]
    primary = bcdr.make_account(spark, wh, "mig_primary", role="primary")
    secondary = bcdr.make_account(spark, wh, "mig_secondary", role="replica")
    sync.sync_prod_database(spark, primary.catalog, ns, primary.prod)
    bcdr.replicate_definitions(primary, secondary)

    # pre-migration view results through the replicated definitions
    secondary.prod.apply(spark, prefix="premig")
    before = sorted(
        spark.table("premig_v_campaign_performance").collect(),
        key=lambda r: (r.campaign_id, r.date_key),
    )

    # migration requires promotion first (`32` step 3)
    with pytest.raises(PermissionError):
        bcdr.migrate_prod_independent(spark, secondary, ns)

    bcdr.promote(secondary, old_primary=primary)
    out = bcdr.migrate_prod_independent(spark, secondary, ns)
    assert out["status"] == "SUCCESS"
    assert out["mismatches"] == 0
    assert out["views_migrated"] == 9
    assert all(v["verdict"] == "MATCH" for v in out["validation"])
    assert out["source_prefix"] == "cld_mig_secondary"

    # every definition now reads the secondary's OWN CLD prefix
    for name, sql in secondary.prod.definitions().items():
        assert "cld_mig_secondary_" in sql, name

    # identical results through the new definitions
    secondary.prod.apply(spark, prefix="postmig")
    after = sorted(
        spark.table("postmig_v_campaign_performance").collect(),
        key=lambda r: (r.campaign_id, r.date_key),
    )
    assert before == after

    # DR monitoring tables recreated independent (`32:318-364`)
    for table in ("secondary_heartbeat_log", "grant_audit_log", "schema_drift_log"):
        assert secondary.catalog.table_exists(MONITORING_NS, table)

    # migration audit trail in sync_log
    log = secondary.catalog.load(MONITORING_NS, "sync_log")
    mig = log.filter(F.col("sync_type") == "PROD_MIGRATION")
    assert mig.filter(
        (F.col("object_type") == "DATABASE") & (F.col("status") == "SUCCESS")
    ).count() == 1
    assert mig.filter(F.col("status") == "MATCH").count() == 9

    # failback: the old primary keeps serving its own (untouched) views
    bcdr.promote(primary, old_primary=secondary)
    assert primary.is_writable
    primary.prod.apply(spark, prefix="failback")
    failback = sorted(
        spark.table("failback_v_campaign_performance").collect(),
        key=lambda r: (r.campaign_id, r.date_key),
    )
    assert failback == before


def test_teardown_stack(spark, tmp_path):
    """Build the full demo stack, tear it down (`99_cleanup.sql` order),
    assert the warehouse is empty except retained audit logs."""
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs import cleanup, mv
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs.grants import GrantRegistry

    wh = str(tmp_path / "wh")
    cat = LakehouseCatalog(spark, wh, name="cld")
    ns = "advertising"
    data = generate_all(spark, GeneratorConfig(num_campaigns=4, impressions_per_campaign=40))
    for name, df in data.items():
        cat.create_table(ns, name, df)

    prod = ViewRegistry(wh, "prod")
    sync.sync_prod_database(spark, cat, ns, prod)  # views + sync_log
    account = bcdr.make_account(spark, wh, "acct")
    for t in cat.list_tables(ns):
        account.ext.register(f"EXT_{t.upper()}", ns, t)
    grants = GrantRegistry(wh, "acct")
    grants.create_role("iceberg_admin")
    mv.refresh_mv(spark, cat, ns, "v_impressions_daily")
    sched = Scheduler()
    sched.add("sync", lambda: None, interval_s=300)

    report = cleanup.teardown_stack(spark, wh, scheduler=sched).cache()
    rows = {(r.object_type, r.object_name): (r.action, r.status) for r in report.collect()}
    assert rows[("TASK", "sync")] == ("DROP", "DROPPED")
    assert rows[("VIEW_DATABASE", "prod")] == ("DROP", "DROPPED")
    assert ("EXT_DATABASE", "ext_acct") in rows
    assert rows[("NAMESPACE", ns)] == ("DROP", "DROPPED")
    assert rows[("MATERIALIZED_VIEW", "mv.v_impressions_daily")] == ("DROP", "DROPPED")
    assert rows[("GRANT_REGISTRY", "acct")] == ("DROP", "DROPPED")
    assert rows[("TABLE", "monitoring.sync_log")] == ("RETAIN", "RETAINED")
    # nothing remains but the retained monitoring namespace
    assert not [k for k, v in rows.items() if v[1] == "REMAINS"]
    assert sorted(os.listdir(wh)) == ["monitoring"]
    assert not sched.tasks
    # the audit trail is still queryable after teardown
    assert cat.load("monitoring", "sync_log").count() > 0

    # full teardown (no retention) leaves an empty warehouse
    cleanup.teardown_stack(spark, wh, retain_audit_logs=False)
    assert os.listdir(wh) == []


def test_scheduler_semantics():
    sched = Scheduler()
    runs = {"a": 0}

    def job():
        runs["a"] += 1
        return runs["a"]

    sched.add("sync", job, interval_s=300)
    assert sched.tick(now=1000.0) == ["sync"]
    assert sched.tick(now=1100.0) == []  # not due
    assert sched.tick(now=1300.0) == ["sync"]  # due again
    assert runs["a"] == 2

    sched.suspend("sync")
    assert sched.tick(now=2000.0) == []
    assert sched.resume_all() == ["sync"]
    assert sched.tick(now=2000.0) == ["sync"]

    # failures recorded, not raised
    def boom():
        raise RuntimeError("x")

    sched.add("bad", boom, interval_s=1)
    sched.tick(now=3000.0)
    assert sched.tasks["bad"].failures == 1
    assert sched.tasks["bad"].last_error == "x"


def test_grant_registry_hierarchy_wildcards_and_audit(spark, stack):
    """Config-driven ACL layer (`00_prereqs_rbac.sql:22-44`,
    `31:197-287`): hierarchy inheritance, future-grant wildcards,
    idempotent ensure, and drift detection via set-difference audit."""
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs import grants as G

    reg = G.GrantRegistry(stack["wh"])
    G.ensure_roles(reg)
    expected = G.reference_expected_grants()
    rep = G.ensure_grants(spark, reg, expected, stack["cat"])
    assert rep["granted"] == len(expected)
    # re-run is a no-op (the reference's re-GRANT loops are idempotent)
    assert G.ensure_grants(spark, reg, expected, stack["cat"])["granted"] == 0

    # hierarchy: ADMIN inherits ENGINEER inherits ANALYST
    assert reg.has_privilege("iceberg_admin", "DATABASE", "cld", "USAGE")
    # future-grant wildcard covers objects created later
    assert reg.has_privilege("iceberg_analyst", "TABLE/VIEW", "cld.new_table", "SELECT")
    # admin-only integration is invisible to analyst
    assert not reg.has_privilege("iceberg_analyst", "INTEGRATION", "rest_glue_catalog_int", "USAGE")
    assert reg.has_privilege("iceberg_admin", "INTEGRATION", "rest_glue_catalog_int", "USAGE")

    # drift: a revoked grant is a real finding, logged like view drift
    reg.revoke("DATABASE", "cld", "iceberg_analyst", "USAGE")
    audit = G.audit_grants(spark, reg, expected, stack["cat"])
    assert audit["status"] == "FAILED"
    assert audit["missing"] == ["DATABASE cld iceberg_analyst USAGE"]
    log = stack["cat"].load(MONITORING_NS, "grant_audit_log")
    assert log.filter(
        (F.col("action") == "MISSING") & (F.col("status") == "DETECTED")
    ).count() == 1
    assert log.select("audit_id").distinct().count() == log.count()


def test_heartbeat_wires_grant_audit_and_task_resume(spark, stack):
    """F2 completion: the heartbeat runs the real grant audit (repairing
    and reporting) and resumes suspended tasks (`31:328-376`) instead of
    recording SKIPPED."""
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs import grants as G

    prod = ViewRegistry(stack["wh"], "prod")
    sync.sync_prod_database(spark, stack["cat"], stack["ns"], prod)
    reg = G.GrantRegistry(stack["wh"], name="hb")
    G.ensure_roles(reg)
    sched = Scheduler()
    sched.add("sync_task", lambda: None, 300)
    sched.suspend("sync_task")

    report = heartbeat.secondary_heartbeat(
        spark,
        stack["cat"],
        stack["ns"],
        prod,
        grant_registry=reg,
        expected_grants=G.reference_expected_grants(),
        scheduler=sched,
    )
    assert report["status"] == "SUCCESS"
    assert report["checks_run"] == 7
    # the replicated-suspended task is running again (DR readiness)
    assert sched.tasks["sync_task"].suspended is False
    log = stack["cat"].load(MONITORING_NS, "secondary_heartbeat_log")
    resume_rows = log.filter(F.col("check_type") == "TASK_RESUME").collect()
    assert any("sync_task" in (r.details or "") for r in resume_rows)
    assert log.filter(
        (F.col("check_type") == "GRANT_AUDIT") & (F.col("status") == "SUCCESS")
    ).count() >= 1


def test_object_inventory_and_data_summary(spark, stack):
    """`90_validation_queries.sql:47-94,222-224` object-existence sweep
    and the `90:289-294` one-row scalar summary as named jobs."""
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs import grants as G

    acct = bcdr.make_account(spark, stack["wh"], "primary_a")
    acct.ext.register("EXT_CAMPAIGNS", stack["ns"], "campaigns")
    sync.sync_prod_database(spark, acct.catalog, stack["ns"], acct.prod)
    reg = G.GrantRegistry(stack["wh"], name="inv")
    G.ensure_roles(reg)

    inv = bcdr.object_inventory(spark, acct, stack["ns"], grant_registry=reg)
    rows = {(r.object_type, r.object_name): r.status for r in inv.collect()}
    assert rows[("TABLE", f"{stack['ns']}.campaigns")] == "EXISTS"
    assert rows[("EXTERNAL_TABLE", "EXT_CAMPAIGNS")] == "EXISTS"
    assert rows[("VIEW", "prod.v_campaign_performance")] == "EXISTS"
    assert rows[("ROLE", "iceberg_analyst")] == "EXISTS"
    assert rows[("CATALOG_LINK", stack["ns"])] == "LINK_ACTIVE"

    summary = bcdr.data_summary(spark, acct, stack["ns"]).collect()[0]
    assert summary.category == "Data Summary"
    assert summary.n_campaigns == 8
    # metadata-only: counts come from snapshot manifests, and they match a scan
    assert summary.n_impressions == acct.catalog.load(stack["ns"], "impressions").count()


def test_table_maintenance_compacts_expires_and_sweeps(spark, tmp_path):
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs.cleanup import table_maintenance
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    df = spark.range(20).withColumnRenamed("id", "k")
    cat.create_table("db", "frag", df)
    for i in range(10):  # fragment: 11 dirs
        cat.append("db", "frag", spark.range(i, i + 2).withColumnRenamed("id", "k"))
    cat.create_table("db", "tidy", df)
    cat.create_tag("db", "frag", "pin")  # pinned snapshot must survive expiry

    report = {r["table"]: r for r in table_maintenance(cat, "db", keep_snapshots=2,
                                                      orphan_grace_s=0.0)}
    assert report["db.frag"]["compacted"] is True
    assert report["db.tidy"]["compacted"] is False
    assert report["db.frag"]["expired_snapshots"] > 0
    # logical content intact after the whole sweep; pinned tag readable
    assert cat.load("db", "frag").count() == 40
    assert len(cat.current_snapshot("db", "frag").data_dirs) == 1
    assert cat.load("db", "frag", ref="pin").count() == 40


def test_table_maintenance_clustered_compaction(spark, tmp_path):
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs.cleanup import table_maintenance
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    df = spark.range(2000).select(
        F.col("id"), F.pmod(F.col("id") * 2654435761, F.lit(9973)).alias("x")
    )
    cat.create_table("db", "zfrag", df)
    for i in range(9):
        cat.append("db", "zfrag", df.filter(F.col("id") % 9 == i).limit(50))

    report = {r["table"]: r for r in table_maintenance(
        cat, "db", cluster_by={"zfrag": ["x"]}, orphan_grace_s=0.0
    )}
    assert report["db.zfrag"]["compacted"] and report["db.zfrag"]["clustered_by"] == ["x"]
    # the clustered rewrite recorded per-file bounds → file-level skipping
    pv = cat.prune_preview("db", "zfrag", [("x", "<", 400)])
    (d,) = pv["kept"]
    assert pv["skipped_files"][d]
    assert cat.load("db", "zfrag").count() == 2450


def test_lineage_pin_and_snapshot_psi(spark, tmp_path):
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs import lineage
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    base = spark.range(1000).select(F.col("id"), (F.col("id") % 100).alias("score"))
    cat.create_table("db", "corpus", base)
    pin = lineage.pin_inputs(cat, [("db", "corpus")])
    assert pin["inputs"]["db.corpus"] == {
        "snapshot_id": 1,
        "table_uuid": cat.table_uuid("db", "corpus"),
        "row_count": 1000,
    }

    # later ingest shifts the distribution; the pinned read is unchanged
    shifted = spark.range(4000).select(
        F.col("id") + 10000, (F.col("id") % 20 + 80).alias("score")
    ).toDF("id", "score")
    cat.append("db", "corpus", shifted)
    assert lineage.load_pinned(cat, pin, "db", "corpus").count() == 1000
    assert cat.load("db", "corpus").count() == 5000

    drift = lineage.snapshot_psi(cat, "db", "corpus", "score", 1)
    assert drift["drifted"] and drift["psi"] > 0.2
    assert drift["baseline_rows"] == 1000 and drift["current_rows"] == 5000
    same = lineage.snapshot_psi(cat, "db", "corpus", "score", 1, 1)
    assert same["psi"] == 0.0 and not same["drifted"]

    # re-created table: pinned reads refuse (uuid mismatch)
    cat.create_table("db", "corpus", base, mode="overwrite")
    with pytest.raises(ValueError, match="re-created"):
        lineage.load_pinned(cat, pin, "db", "corpus")
    with pytest.raises(KeyError):
        lineage.load_pinned(cat, pin, "db", "other")
