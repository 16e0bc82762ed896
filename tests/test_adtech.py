"""Generator + view-layer tests: the reference's data invariants
(FIXTURES.md "Expected invariants") and view semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.adtech import views as V
from snowflake_iceberg_cld_bcdr_demo_spark.adtech.generate import (
    GeneratorConfig,
    generate_all,
)
from snowflake_iceberg_cld_bcdr_demo_spark.adtech.schemas import TABLES


@pytest.fixture(scope="module")
def data(spark):
    cfg = GeneratorConfig(num_campaigns=12, impressions_per_campaign=400)
    d = generate_all(spark, cfg)
    return {k: df.cache() for k, df in d.items()}


def test_schemas_match_declaration(data):
    for name, (schema, _parts) in TABLES.items():
        assert [f.name for f in data[name].schema.fields] == [f.name for f in schema.fields]


def test_campaign_count_and_enums(data):
    camp = data["campaigns"]
    assert camp.count() == 12
    from snowflake_iceberg_cld_bcdr_demo_spark.adtech import schemas

    bad = camp.filter(
        ~F.col("channel").isin(schemas.CHANNELS)
        | ~F.col("status").isin(schemas.STATUSES)
        | ~F.col("target_region").isin(schemas.REGIONS)
    )
    assert bad.count() == 0


def test_referential_integrity(data):
    # FK chain intact (`02:13,142,180,202-204`)
    assert data["clicks"].join(data["impressions"], "impression_id", "left_anti").count() == 0
    assert data["conversions"].join(data["clicks"], "click_id", "left_anti").count() == 0
    assert (
        data["impressions"].join(data["campaigns"], "campaign_id", "left_anti").count() == 0
    )


def test_impressions_only_for_eligible_campaigns(data):
    # status ∈ {active, completed} (`02:95`)
    ineligible = data["campaigns"].filter(~F.col("status").isin("active", "completed"))
    assert data["impressions"].join(ineligible, "campaign_id", "inner").count() == 0


def test_event_time_ordering(data):
    # click ts > impression ts; conversion ts > click ts (`02:147,190-194`)
    imp = data["impressions"].select("impression_id", F.col("timestamp").alias("its"))
    clk = data["clicks"].select("impression_id", "click_id", F.col("timestamp").alias("cts"))
    assert clk.join(imp, "impression_id").filter("cts <= its").count() == 0
    cnv = data["conversions"].select("click_id", F.col("timestamp").alias("vts"))
    assert cnv.join(clk, "click_id").filter("vts <= cts").count() == 0


def test_sampling_rates(data):
    n_imp = data["impressions"].count()
    n_clk = data["clicks"].count()
    n_cnv = data["conversions"].count()
    assert 0.01 < n_clk / n_imp < 0.035  # click_rate 0.02
    assert 0.01 < n_cnv / n_clk < 0.12  # conversion_rate 0.05 (small n)


def test_determinism(spark, data):
    cfg = GeneratorConfig(num_campaigns=12, impressions_per_campaign=400)
    again = generate_all(spark, cfg)
    a = data["conversions"].agg(F.sum("revenue_usd"), F.count(F.lit(1))).collect()[0]
    b = again["conversions"].agg(F.sum("revenue_usd"), F.count(F.lit(1))).collect()[0]
    assert tuple(a) == tuple(b)


def test_value_ranges(data):
    imp = data["impressions"]
    assert imp.filter((F.col("cost_usd") < 0.001) | (F.col("cost_usd") > 0.05)).count() == 0
    assert imp.filter((F.col("hour") < 0) | (F.col("hour") > 23)).count() == 0
    cnv = data["conversions"]
    assert cnv.filter((F.col("quantity") < 1) | (F.col("quantity") > 5)).count() == 0
    assert cnv.filter(F.col("currency") != "USD").count() == 0


def test_geo_region_bias(data):
    # geo = target region with p=0.7 (`02:120`)
    joined = data["impressions"].join(
        data["campaigns"].select("campaign_id", "target_region"), "campaign_id"
    )
    frac = (
        joined.filter(F.col("geo_region") == F.col("target_region")).count() / joined.count()
    )
    assert 0.6 < frac < 0.8


# ---- view layer ------------------------------------------------------


def test_all_views_build(spark, data):
    for view in V.VIEW_DEFS:
        df = V.build(spark, view, data)
        assert len(df.columns) > 0
        assert df.count() >= 0


def test_funnel_view_semantics(spark, data):
    perf = V.build(spark, "v_campaign_performance", data).cache()
    # activity filter: every row has a date_key (P5 `15:242`)
    assert perf.filter(F.col("date_key").isNull()).count() == 0
    # funnel never inverts at the (campaign, day) grain on totals
    tot = perf.agg(
        F.sum("impressions").alias("i"), F.sum("clicks").alias("c"), F.sum("conversions").alias("v")
    ).collect()[0]
    assert tot.i >= tot.c >= tot.v
    perf.unpersist()


def test_ext_fanout_view_matches_exact_counts(spark, data):
    """COUNT(DISTINCT) over the fan-out join (A1) must equal per-table
    exact counts — the cross-check the reference's validation implies."""
    ext = V.build(spark, "v_campaign_performance_ext", data)
    agg = ext.agg(
        F.sum("total_impressions").alias("i"),
        F.sum("total_clicks").alias("c"),
        F.sum("total_conversions").alias("v"),
    ).collect()[0]
    assert agg.i == data["impressions"].count()
    assert agg.c == data["clicks"].count()
    assert agg.v == data["conversions"].count()


def test_campaigns_summary_duration(spark, data):
    summ = V.build(spark, "v_campaigns_summary", data)
    bad = summ.filter(
        (F.col("campaign_duration_days") < 7) | (F.col("campaign_duration_days") > 90)
    )
    assert bad.count() == 0
