"""Partition-spec evolution (Iceberg ``ALTER TABLE … ADD/DROP PARTITION
FIELD``): metadata-only spec changes, mixed-era reads, era-safe hidden-
partition predicate folding, and spec history in the metadata tables."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import LakehouseCatalog


@pytest.fixture()
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "wh"), name="cld")


def _events(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.col("id"),
        F.concat(
            F.lit("2024-0"), (F.col("id") % 4 + 1).cast("string"), F.lit("-15")
        ).alias("event_date"),
        (F.col("id") % 5).alias("val"),
    )


def test_evolve_months_to_days_mixed_era_reads(spark, cat):
    cat.create_table("db", "ev", _events(spark, 20), partition_by=["months(event_date)"])
    cat.alter_partition_spec("db", "ev", ["days(event_date)"])
    cat.append("db", "ev", _events(spark, 20, start=100))

    # new-era dir uses the new physical layout, old dir untouched
    t = os.path.join(cat.warehouse, "db", "ev")
    assert any(d.startswith("_p_months_event_date=") for d in os.listdir(os.path.join(t, "data-00001")))
    assert any(d.startswith("_p_days_event_date=") for d in os.listdir(os.path.join(t, "data-00002")))

    out = cat.load("db", "ev")
    assert set(out.columns) == {"id", "event_date", "val"}  # both eras' derived cols hidden
    assert out.count() == 40

    # filters on the source column stay CORRECT across eras (old-era rows
    # pass the relaxed fold and are caught by the row-level filter)
    got = sorted(
        cat.load("db", "ev", filters=[("event_date", ">=", "2024-03-01")]).collect()
    )
    want = sorted(
        r
        for r in _events(spark, 20).unionAll(_events(spark, 20, start=100)).collect()
        if r.event_date >= "2024-03-01"
    )
    assert got == want and got

    eq = cat.load("db", "ev", filters=[("event_date", "=", "2024-02-15")])
    assert eq.count() == 10
    assert cat.load("db", "ev", filters=[("event_date", "in", [])]).count() == 0

    # time travel reads the pre-evolution snapshot unchanged
    assert cat.load("db", "ev", snapshot_id=1).count() == 20


def test_evolve_partitioned_to_unpartitioned_and_back(spark, cat):
    cat.create_table("db", "flat", _events(spark, 12), partition_by=["bucket(4, id)"])
    cat.alter_partition_spec("db", "flat", [])
    cat.append("db", "flat", _events(spark, 12, start=50))
    assert cat.load("db", "flat").count() == 24
    cat.alter_partition_spec("db", "flat", ["months(event_date)"])
    cat.append("db", "flat", _events(spark, 12, start=200))
    out = cat.load("db", "flat")
    assert out.count() == 36
    assert set(out.columns) == {"id", "event_date", "val"}
    # equality filter on id is still exact across all three eras
    assert cat.load("db", "flat", filters=[("id", "=", 205)]).count() == 1


def test_alter_partition_spec_is_metadata_only_and_idempotent(spark, cat):
    cat.create_table("db", "m", _events(spark, 8), partition_by=["months(event_date)"])
    before = sorted(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(cat.warehouse, "db", "m", "data-00001"))
        for f in fs
    )
    out = cat.alter_partition_spec("db", "m", ["days(event_date)"])
    assert out == {"partition_by": ["days(event_date)"], "n_specs": 2}
    # same-spec alter is a no-op (no history entry)
    out2 = cat.alter_partition_spec("db", "m", ["days(event_date)"])
    assert out2["n_specs"] == 2
    after = sorted(
        os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(os.path.join(cat.warehouse, "db", "m", "data-00001"))
        for f in fs
    )
    assert before == after  # no data file rewritten

    with pytest.raises(ValueError, match="requires a width"):
        cat.alter_partition_spec("db", "m", ["bucket(id)"])


def test_partitions_metadata_table_shows_spec_history(spark, cat):
    cat.create_table("db", "h", _events(spark, 6), partition_by=["months(event_date)"])
    cat.alter_partition_spec("db", "h", ["days(event_date)", "bucket(2, id)"])
    rows = cat.metadata_table("db", "h", "partitions").collect()
    assert [(r.spec_id, r.transform, r.is_current) for r in rows] == [
        (0, "months", False),
        (1, "days", True),
        (1, "bucket", True),
    ]


def test_rewrite_materializes_current_spec(spark, cat):
    """A row-level rewrite/compaction re-lays untouched rows under the
    CURRENT spec and must not leak retired-era derived columns."""
    cat.create_table("db", "rw", _events(spark, 20), partition_by=["months(event_date)"])
    cat.alter_partition_spec("db", "rw", ["days(event_date)"])
    cat.delete_where("db", "rw", [("val", "=", 0)])
    out = cat.load("db", "rw")
    assert set(out.columns) == {"id", "event_date", "val"}
    assert out.count() == 16
    cat.compact("db", "rw", target_file_partitions=1)
    assert cat.load("db", "rw").count() == 16
    # after compaction everything lives under the current (days) layout
    manifest = cat._read_manifest("db", "rw")
    last_dir = manifest["snapshots"][-1]["data_dirs"][-1]
    layout = os.listdir(os.path.join(cat.warehouse, "db", "rw", last_dir))
    assert any(d.startswith("_p_days_event_date=") for d in layout)
    assert not any(d.startswith("_p_months_") for d in layout)


def test_purge_across_spec_eras(spark, cat):
    """A purge on a spec-evolved table rewrites affected dirs of BOTH
    eras correctly (retired derived columns stripped, current layout
    materialized) and history stays scrubbed."""
    cat.create_table(
        "db", "pev", _events(spark, 30), partition_by=["months(event_date)"]
    )
    cat.alter_partition_spec("db", "pev", ["days(event_date)"])
    cat.append("db", "pev", _events(spark, 30, start=100))

    out = cat.purge_rows("db", "pev", [("id", "in", [5, 105])])
    assert out["removed_rows"] == 2 and out["rewritten_dirs"] == 2
    assert cat.load("db", "pev").count() == 58
    assert cat.load("db", "pev", snapshot_id=1).filter("id = 5").count() == 0
    assert set(cat.load("db", "pev").columns) == {"id", "event_date", "val"}
    # filters on the partition source column still correct post-purge
    got = cat.load("db", "pev", filters=[("event_date", "=", "2024-02-15")]).count()
    want = cat.load("db", "pev").filter("event_date = '2024-02-15'").count()
    assert got == want
