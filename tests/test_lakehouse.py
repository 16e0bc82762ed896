"""Lakehouse catalog tests: snapshot append/time-travel, partitioned
writes with pruning, dual-catalog consistency, EXT registry, view
registry — the reference's S5-S10 operator surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
    ExternalTables,
    LakehouseCatalog,
    ViewRegistry,
)


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "warehouse")


@pytest.fixture()
def cat(spark, wh):
    return LakehouseCatalog(spark, wh, name="cld")


def _df(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("bucket"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1)).alias("date_key"),
    )


def test_create_load_roundtrip(spark, cat):
    cat.create_table("db", "t", _df(spark, 10))
    assert cat.load("db", "t").count() == 10
    assert cat.list_tables("db") == ["t"]
    assert cat.table_exists("db", "t")


def test_append_creates_snapshots_and_time_travel(spark, cat):
    cat.create_table("db", "t", _df(spark, 10))
    cat.append("db", "t", _df(spark, 5, start=100))
    snaps = cat.snapshots("db", "t")
    # snapshot count grows (`05_append_campaigns.py:115-123`)
    assert [s.snapshot_id for s in snaps] == [1, 2]
    assert [s.operation for s in snaps] == ["create", "append"]
    assert cat.load("db", "t").count() == 15
    # VERSION AS OF
    assert cat.load("db", "t", snapshot_id=1).count() == 10


def test_partitioned_write_prunes(spark, cat):
    cat.create_table("db", "p", _df(spark, 30), partition_by=["date_key"])
    # physical layout has partition dirs
    snap_dir = os.path.join(cat.warehouse, "db", "p", "data-00001")
    assert any(d.startswith("date_key=") for d in os.listdir(snap_dir))
    df = cat.load("db", "p").filter(F.col("date_key") == "2024-01-01")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(extended=False)
    # the filter must reach the scan as a partition filter, not a data filter
    assert "PartitionFilters" in buf.getvalue()
    assert df.count() == 10


def test_dual_catalog_shared_storage(spark, wh, cat):
    """Two catalogs over one warehouse see identical data instantly —
    the EXT vs CLD equivalence check (`90_validation_queries.sql:149-168`)
    and the zero-copy RPO=0 property."""
    other = LakehouseCatalog(spark, wh, name="ext")
    cat.create_table("db", "t", _df(spark, 10))
    assert other.load("db", "t").count() == 10
    cat.append("db", "t", _df(spark, 7, start=50))
    # visible with no refresh/copy step
    assert other.load("db", "t").count() == 17
    assert other.refresh("db") == ["t"]


def test_external_registry(spark, cat):
    cat.create_table("db", "t", _df(spark, 4))
    ext = ExternalTables(cat)
    ext.register("EXT_T", "db", "t")
    assert ext.names() == ["EXT_T"]
    assert ext.load("EXT_T").count() == 4
    with pytest.raises(KeyError):
        ext.register("EXT_MISSING", "db", "nope")
    ext.unregister("EXT_T")
    assert ext.names() == []


def test_link_status_health(spark, wh, cat):
    cat.create_table("db", "t", _df(spark, 3))
    ok = cat.link_status("db")
    assert ok["status"] == "LINK_ACTIVE" and ok["table_count"] == 1
    bad = cat.link_status("no_such_ns")
    assert bad["status"] == "LINK_ACTIVE" and bad["table_count"] == 0


def test_view_registry_apply_and_hashes(spark, wh, cat):
    cat.create_table("db", "t", _df(spark, 6))
    cat.load("db", "t").createOrReplaceTempView("cld_t")
    reg = ViewRegistry(wh, "prod")
    reg.create_or_replace("t_view", "SELECT * FROM cld_t WHERE id > 2")
    created = reg.apply(spark)
    assert created == ["t_view"]
    assert spark.table("t_view").count() == 3
    hashes = reg.definition_hashes(spark)
    row = hashes.collect()[0]
    assert row.object_name == "t_view" and len(row.object_hash) == 64
    # definition change → hash change (drift detection primitive)
    reg.create_or_replace("t_view", "SELECT * FROM cld_t")
    assert reg.definition_hashes(spark).collect()[0].object_hash != row.object_hash


def test_create_table_modes(spark, cat):
    cat.create_table("db", "t", _df(spark, 3))
    with pytest.raises(FileExistsError):
        cat.create_table("db", "t", _df(spark, 3))
    cat.create_table("db", "t", _df(spark, 8), mode="overwrite")
    assert cat.load("db", "t").count() == 8
    # overwrite resets lineage to a fresh create snapshot
    assert cat.snapshots("db", "t")[-1].operation == "create"
