"""OLAP additions: approximate-sketch error bounds vs their exact
oracle-checked twins (the exact/approx pairing contract in plans/olap.py).
Exact-query correctness itself is covered by the DuckDB oracle gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.plans import olap

from .conftest import SF_MED
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

SF = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    """HLL (rsd=2%) per-type distinct counts land within the certified
    5% bound, and the audit query's exact column agrees with the exact
    twin."""
    exact = {
        r.event_type: r.n_users
        for r in olap.distinct_users_by_type(spark, SF).collect()
    }
    audit = {
        r.event_type: r
        for r in olap.distinct_users_by_type_approx(spark, SF).collect()
    }
    assert set(exact) == set(audit)
    for t, n in exact.items():
        assert audit[t].n_users_exact == n
        assert audit[t].hll_within_bound, (t, n)


def test_approx_percentile_rank_error(spark):
    """GK sketch (accuracy 10000): every approx quantile's true rank
    interval intersects the ±2% band around its target — the flags the
    oracle pins TRUE must hold for every event type."""
    for r in olap.event_value_deciles_approx(spark, SF).collect():
        assert r.p10_rank_ok and r.p50_rank_ok and r.p99_rank_ok, r


def test_cube_plans_expand_after_partial_agg(spark):
    """The cube plan must Expand over partial aggregates (not expand raw
    rows): Expand appears with HashAggregate below AND above it."""
    plan = olap.cube_order_stats(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert plan.count("HashAggregate") >= 2


def test_pivot_explicit_values_single_job(spark):
    """Pivot with an explicit value list plans without a distinct-values
    subquery: exactly one aggregate pass over the fact scan."""
    df = olap.pivot_priority_status(spark, SF)
    rows = df.collect()
    assert {r.o_orderpriority for r in rows} == {
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    }
    total = sum(r.F + r.O + r.P for r in rows)
    assert total == table(spark, SF, "orders").count()


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


def test_heavy_hitters_approx_is_superset_of_exact(spark):
    """FreqItems no-false-negative guarantee at sf0.1: every exact
    above-support user is flagged in_sketch, and the audit's exact side
    matches an independent recount."""
    from snowflake_iceberg_cld_bcdr_demo_spark.plans import QUERY_SPECS
    from snowflake_iceberg_cld_bcdr_demo_spark.plans.olap import _FREQ_SUPPORT
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

    audit = QUERY_SPECS["heavy_hitters_approx"].build(spark, SF_MED).collect()
    assert audit and all(r.in_sketch for r in audit)
    ev = table(spark, SF_MED, "events")
    total = ev.count()
    exact = {
        r.user_id: r["count"]
        for r in ev.groupBy("user_id")
        .count()
        .filter(F.col("count") > _FREQ_SUPPORT * total)
        .collect()
    }
    assert {r.user_id: r.n_events for r in audit} == exact


def test_ewma_weekly_revenue_hand_computed(spark):
    """EMA fold semantics: ema_1 = x_1; ema_t = 0.7*ema_{t-1} + 0.3*x_t."""
    from snowflake_iceberg_cld_bcdr_demo_spark.plans import QUERY_SPECS
    from .conftest import SF_SMALL

    rows = QUERY_SPECS["ewma_weekly_revenue"].build(spark, SF_SMALL).collect()
    assert len(rows) > 10
    weeks = sorted(rows, key=lambda r: r.week)
    # recompute from the weekly revenue rollup independently
    from pyspark.sql import functions as F
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

    weekly = (
        table(spark, SF_SMALL, "orders")
        .groupBy(F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("w"))
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
             .cast("double").alias("rev"))
        .orderBy("w")
        .collect()
    )
    ema = weekly[0].rev
    assert abs(weeks[0].ema_revenue - round(ema, 4)) < 1e-9
    for i in range(1, len(weekly)):
        ema = 0.7 * ema + 0.3 * weekly[i].rev
        assert abs(weeks[i].ema_revenue - round(ema, 4)) < 1e-6, f"week {i}"
