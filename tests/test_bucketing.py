"""Bucketed-layout tests: co-located join and aggregation produce
zero-Exchange physical plans, and results match the shuffled equivalent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.sources import bucketing as B
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = table(spark, SF_SMALL, "orders")
    lineitem = table(spark, SF_SMALL, "lineitem")
    B.write_bucketed(orders, "b_orders", ["o_orderkey"], 8)
    B.write_bucketed(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield spark
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(bucketed, no_broadcast):
    spark = bucketed
    joined = (
        spark.table("b_lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(spark.table("b_orders"), "o_orderkey")
        .select("o_orderkey", "o_totalprice", "l_quantity")
    )
    assert B.exchange_count(joined) == 0

    # the same join off raw parquet shuffles both sides
    raw = (
        table(spark, SF_SMALL, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(table(spark, SF_SMALL, "orders"), "o_orderkey")
        .select("o_orderkey", "o_totalprice", "l_quantity")
    )
    assert B.exchange_count(raw) >= 2

    # and the answers are identical
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, raw.collect()))


def test_bucketed_agg_has_no_exchange(bucketed, no_broadcast):
    spark = bucketed
    agg = spark.table("b_lineitem").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert B.exchange_count(agg) == 0
    raw = (
        table(spark, SF_SMALL, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert B.exchange_count(raw) == 1
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, raw.collect()))


def test_mismatched_bucket_counts_still_shuffle(bucketed, no_broadcast):
    """Guard the rule of thumb: a 4-bucket table joined to an 8-bucket
    table cannot consume both scans' partitioning — at least one side
    re-shuffles (so same-count bucketing is a real requirement, not
    folklore)."""
    spark = bucketed
    orders = table(spark, SF_SMALL, "orders")
    B.write_bucketed(orders, "b_orders4", ["o_orderkey"], 4)
    try:
        joined = (
            spark.table("b_lineitem")
            .withColumnRenamed("l_orderkey", "o_orderkey")
            .join(spark.table("b_orders4"), "o_orderkey")
        )
        assert B.exchange_count(joined) >= 1
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders4")
