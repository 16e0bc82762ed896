"""MV refresh + reference-cadence runbook tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.adtech import views as V
from snowflake_iceberg_cld_bcdr_demo_spark.adtech.generate import (
    GeneratorConfig,
    generate_all,
)
from snowflake_iceberg_cld_bcdr_demo_spark.jobs import bcdr, mv, runbook
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import LakehouseCatalog


@pytest.fixture(scope="module")
def stack(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    cat = LakehouseCatalog(spark, wh, name="cld")
    data = generate_all(spark, GeneratorConfig(num_campaigns=6, impressions_per_campaign=120))
    for name, df in data.items():
        parts = ["date_key"] if name != "campaigns" else None
        cat.create_table("advertising", name, df, partition_by=parts)
    return {"wh": wh, "cat": cat, "data": data}


def test_mv_refresh_matches_view(spark, stack):
    cat = stack["cat"]
    out = mv.refresh_mv(spark, cat, "advertising", "v_campaign_performance")
    assert out["rows"] > 0
    mv_df = cat.load(mv.MV_NS, "v_campaign_performance")
    live = V.build(spark, "v_campaign_performance", stack["data"])
    # materialization is value-identical to the live view
    assert sorted(map(tuple, mv_df.collect())) == sorted(map(tuple, live.collect()))
    # partitioned on date_key → pruning-capable layout
    assert cat.partition_spec(mv.MV_NS, "v_campaign_performance") == ["date_key"]


def test_mv_staleness_lifecycle(spark, stack):
    cat = stack["cat"]
    assert mv.is_stale(cat, "advertising", "v_campaigns_summary")  # never built
    mv.refresh_mv(spark, cat, "advertising", "v_campaigns_summary")
    assert not mv.is_stale(cat, "advertising", "v_campaigns_summary")
    # source append → stale again; read_or_build self-heals
    extra = generate_all(spark, GeneratorConfig(num_campaigns=3, impressions_per_campaign=1, seed=7))
    cat.append("advertising", "campaigns", extra["campaigns"])
    assert mv.is_stale(cat, "advertising", "v_campaigns_summary")
    fresh = mv.read_or_build(spark, cat, "advertising", "v_campaigns_summary")
    assert fresh.count() == 9  # 6 + 3 appended
    assert not mv.is_stale(cat, "advertising", "v_campaigns_summary")
    # allow_stale serves the old materialization without refreshing
    cat.append("advertising", "campaigns", extra["campaigns"].limit(1))
    stale = mv.read_or_build(spark, cat, "advertising", "v_campaigns_summary", allow_stale=True)
    assert stale.count() == 9
    assert mv.is_stale(cat, "advertising", "v_campaigns_summary")


def test_refresh_all_builds_five(spark, stack):
    results = mv.refresh_all(spark, stack["cat"], "advertising")
    assert {r["mv"] for r in results} == set(V.AGGREGATE_VIEWS)
    assert all(r["rows"] >= 0 for r in results)


def test_runbook_reference_schedule(spark, stack):
    wh = stack["wh"]
    primary = bcdr.make_account(spark, wh, "p1", role="primary")
    secondary = bcdr.make_account(spark, wh, "s1", role="replica")
    sched = runbook.build_reference_schedule(
        spark, primary, secondary, "advertising", with_mv_refresh=False
    )
    assert set(sched.tasks) == {
        "sync_prod",
        "secondary_heartbeat",
        "replicate_definitions",
        "schema_drift_check",
    }
    # cadences match the reference (BASELINE.md)
    assert sched.tasks["sync_prod"].interval_s == 300
    assert sched.tasks["replicate_definitions"].interval_s == 600
    assert sched.tasks["schema_drift_check"].interval_s == 86400

    ran = sched.tick(now=0.0)
    assert set(ran) == set(sched.tasks)  # all due at t0
    assert all(t.last_error is None for t in sched.tasks.values()), {
        n: t.last_error for n, t in sched.tasks.items()
    }
    # after one full cycle the DR side is consistent + drift-free
    assert sched.tasks["schema_drift_check"].last_result["status"] in (
        "NO_DRIFT",
        "DRIFT_DETECTED",  # first run may resync; second must be clean
    )
    sched.tick(now=90_000.0)
    assert sched.tasks["schema_drift_check"].last_result["status"] == "NO_DRIFT"
    results = bcdr.validate_consistency(spark, primary, secondary, "advertising")
    assert all(r["verdict"] == "MATCH" for r in results)


def test_incremental_refresh_patches_changed_dates(spark, stack):
    cat = stack["cat"]
    view = "v_impressions_daily"
    out = mv.refresh_incremental(spark, cat, "advertising", view)
    assert out["mode"] == "full"  # first call seeds cursors

    out = mv.refresh_incremental(spark, cat, "advertising", view)
    assert out["mode"] == "noop" and out["changed_partitions"] == 0

    # append new impressions for exactly one date → one patched partition
    extra = generate_all(
        spark, GeneratorConfig(num_campaigns=2, impressions_per_campaign=40, seed=11)
    )["impressions"]
    one_date = extra.select("date_key").distinct().limit(1).collect()[0].date_key
    cat.append("advertising", "impressions", extra.filter(F.col("date_key") == one_date))
    out = mv.refresh_incremental(spark, cat, "advertising", view)
    assert out["mode"] == "incremental"
    assert out["changed_partitions"] == 1

    # patched MV equals a from-scratch rebuild over current sources
    import snowflake_iceberg_cld_bcdr_demo_spark.adtech.views as V2

    cur = {t: cat.load("advertising", t) for t in V2.BASE_TABLES}
    live = V2.build(spark, view, cur)
    got = cat.load(mv.MV_NS, view)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, live.collect()))

    # a dimension (campaigns) delta forces the safe full fallback
    cat.append("advertising", "campaigns", cat.load("advertising", "campaigns").limit(1))
    out = mv.refresh_incremental(spark, cat, "advertising", view)
    assert out["mode"] == "full"
    # and the replace history is time-travelable (incremental patch = snapshot)
    assert len([s for s in cat.snapshots(mv.MV_NS, view)]) >= 1


def test_runbook_incremental_mv_refresh_task(spark, stack):
    wh = stack["wh"]
    primary = bcdr.make_account(spark, wh, "p2", role="primary")
    secondary = bcdr.make_account(spark, wh, "s2", role="replica")
    sched = runbook.build_reference_schedule(
        spark, primary, secondary, "advertising", with_mv_refresh=True
    )
    assert "mv_refresh" in sched.tasks
    sched.tick(now=0.0)
    assert sched.tasks["mv_refresh"].last_error is None
    # first cycle seeds cursors (full); an immediate second cycle is a noop
    out = mv.refresh_incremental(spark, primary.catalog, "advertising", "v_clicks_daily")
    assert out["mode"] == "noop"


def test_noop_refresh_advances_cursor_past_empty_delta(spark, stack):
    """A zero-row append advances the fact snapshot without changing any
    partition; the noop refresh must still advance its cursor so later
    cycles don't re-read the same empty delta dirs."""
    cat = stack["cat"]
    view = "v_conversions_daily"
    mv.refresh_incremental(spark, cat, "advertising", view)  # seed cursors
    conv = cat.load("advertising", "conversions")
    cat.append("advertising", "conversions", conv.limit(0))  # empty snapshot
    before = mv._read_cursors(cat, view)["conversions"]["snapshot_id"]
    out = mv.refresh_incremental(spark, cat, "advertising", view)
    assert out["mode"] == "noop"
    after = mv._read_cursors(cat, view)["conversions"]["snapshot_id"]
    assert after > before
    assert after == cat.snapshots("advertising", "conversions")[-1].snapshot_id


def test_runbook_hour_simulation_full_composition(spark, stack):
    """F1-F5 composed end-to-end for a simulated hour (mock clock, 30 s
    ticks): sync + heartbeat fire at the reference 5-min cadence
    (`16:483-489` / `31:531-537`), definition replication at 10 min
    (`20:113,137,171`), the drift check once (daily, `33:504-509`); a
    task suspended mid-hour is re-enabled by the heartbeat's resume pass
    WITHOUT losing its cadence; and every heartbeat cycle records the
    round-5 lifecycle + streaming-progress checks in the monitoring
    log."""
    wh = stack["wh"]
    primary = bcdr.make_account(spark, wh, "hp", role="primary")
    secondary = bcdr.make_account(spark, wh, "hs", role="replica")
    sched = runbook.build_reference_schedule(
        spark, primary, secondary, "advertising", streams=[]
    )
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs.logs import MONITORING_NS

    # accounts share the warehouse (zero-copy DR), so earlier tests'
    # heartbeat cycles share this log — count only rows from this hour
    def _log_ids():
        if not primary.catalog.table_exists(MONITORING_NS, "secondary_heartbeat_log"):
            return set()
        log = primary.catalog.load(MONITORING_NS, "secondary_heartbeat_log")
        return {r.heartbeat_id for r in log.select("heartbeat_id").collect()}

    before_ids = _log_ids()
    # a simulated half hour exercises every composition fact the full
    # hour did (cadence, suspend/resume without cadence loss, daily
    # once-only, per-cycle monitoring battery) at half the suite wall —
    # the r13 full-hour version was a 48s test whose second half added
    # no new state transitions
    for now in range(0, 1800, 30):
        if now == 330:
            sched.suspend("replicate_definitions")
        sched.tick(now=float(now))

    t = sched.tasks
    assert t["sync_prod"].runs == 6             # 0, 300, ..., 1500
    assert t["secondary_heartbeat"].runs == 6
    assert t["schema_drift_check"].runs == 1    # daily: t0 only
    # suspended at 330 (missing its t=600 slot), resumed by the t=600
    # heartbeat, back on cadence from 630 -> same 3 runs as undisturbed
    assert t["replicate_definitions"].runs == 3
    assert not t["replicate_definitions"].suspended
    assert all(task.failures == 0 for task in t.values()), {
        n: task.last_error for n, task in t.items()
    }

    log = primary.catalog.load(MONITORING_NS, "secondary_heartbeat_log")
    rows = [r for r in log.collect() if r.heartbeat_id not in before_ids]
    by_type = {}
    for r in rows:
        by_type.setdefault(r.check_type, []).append(r)
    # every cycle records the full battery, incl. the round-5 checks
    assert len(by_type["TABLE_LIFECYCLE"]) == 6
    assert len(by_type["STREAM_PROGRESS"]) == 6
    assert all(r.status == "SUCCESS" for r in by_type["TABLE_LIFECYCLE"])
    # streams=[] exercises the REAL branch (not SKIPPED)
    assert all(r.status == "SUCCESS" for r in by_type["STREAM_PROGRESS"])
    assert all("0 streams healthy" in r.details for r in by_type["STREAM_PROGRESS"])
    # the resume pass logged re-enabling the suspended sibling
    resumes = [r for r in by_type["TASK_RESUME"] if "replicate_definitions" in (r.details or "")]
    assert len(resumes) == 1 and resumes[0].status == "SUCCESS"
