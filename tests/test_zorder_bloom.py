"""Z-order clustered compaction (file-level data skipping) and per-dir
Bloom filters (point-lookup skipping) — the two manifest-pruning tiers a
100 TB scan relies on when min/max dir bounds alone can't prune
(overlapping ranges, unordered high-cardinality keys)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
    LakehouseCatalog,
    _bloom_probe_positions,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "wh"), name="cld")


def _two_dim_frame(spark, n=4000, seed_mod=9973):
    # two independent pseudo-random dimensions: neither is correlated
    # with insertion order, so per-dir bounds are useless before
    # clustering (every dir spans ~the full range of both columns)
    return spark.range(n).select(
        F.col("id").alias("row_id"),
        F.pmod(F.col("id") * 2654435761, F.lit(seed_mod)).alias("x"),
        F.pmod(F.col("id") * 40503 + 17, F.lit(seed_mod)).alias("y"),
    )


def test_zorder_compact_skips_files_on_both_dimensions(spark, cat):
    df = _two_dim_frame(spark)
    cat.create_table("lake", "points", df.filter("row_id % 2 = 0"))
    cat.append("lake", "points", df.filter("row_id % 2 = 1"))

    before = cat.prune_preview("lake", "points", [("x", "<", 500)])
    assert before["skipped"] == []  # bounds overlap: nothing dir-prunable

    cat.compact("lake", "points", target_file_partitions=16, cluster_by=["x", "y"])
    manifest = cat._read_manifest("lake", "points")
    fstats = manifest["file_stats"]
    assert len(fstats) == 1
    files = next(iter(fstats.values()))
    assert len(files) == 16
    assert all(set(st) == {"x", "y"} for st in files.values())

    # a narrow filter on EITHER clustered dimension skips most files
    for col in ("x", "y"):
        pv = cat.prune_preview("lake", "points", [(col, "<", 500)])
        (d,) = pv["kept"]
        assert len(pv["skipped_files"][d]) >= len(pv["kept_files"][d])

    # correctness: file-pruned reads return exactly the full-scan answer
    full = cat.load("lake", "points")
    for filters in ([("x", "<", 500)], [("y", ">=", 9000)], [("x", "<", 500), ("y", ">", 2000)]):
        got = sorted(cat.load("lake", "points", filters=filters).collect())
        cond = " AND ".join(
            f"{c} {'=' if op == '==' else op} {v}" for c, op, v in filters
        )
        want = sorted(full.filter(cond).collect())
        assert got == want and got


def test_zorder_all_files_pruned_returns_empty_with_schema(spark, cat):
    cat.create_table("lake", "pts", _two_dim_frame(spark, n=500))
    cat.compact("lake", "pts", target_file_partitions=4, cluster_by=["x"])
    out = cat.load("lake", "pts", filters=[("x", ">", 10**9)])
    assert out.count() == 0
    assert out.columns == ["row_id", "x", "y"]


def test_zorder_on_partitioned_table(spark, cat):
    df = _two_dim_frame(spark, n=2000).withColumn(
        "bucket", (F.col("row_id") % 4).cast("string")
    )
    cat.create_table("lake", "ppts", df, partition_by=["bucket"])
    cat.compact("lake", "ppts", target_file_partitions=8, cluster_by=["x", "y"])
    got = sorted(
        cat.load("lake", "ppts", filters=[("x", "<", 300)]).collect()
    )
    want = sorted(df.filter("x < 300").collect())
    assert got == want and got
    pv = cat.prune_preview("lake", "ppts", [("x", "<", 300)])
    (d,) = pv["kept"]
    assert pv["skipped_files"][d]


def test_bloom_skips_point_lookups_bounds_cannot(spark, cat):
    # even/odd doc ids: every dir spans the full id range (bounds overlap
    # completely) but each holds a disjoint value set — exactly the shape
    # where only a Bloom filter can prune
    ids = spark.range(3000).select((F.col("id") * 2).alias("doc_id"))
    cat.create_table("lake", "docs", ids, bloom_filter_cols=["doc_id"])
    cat.append("lake", "docs", ids.select((F.col("doc_id") + 1).alias("doc_id")))

    manifest = cat._read_manifest("lake", "docs")
    assert len(manifest["dir_blooms"]) == 2

    hit = cat.prune_preview("lake", "docs", [("doc_id", "=", 1234)])
    miss_dir = cat.prune_preview("lake", "docs", [("doc_id", "=", 1235)])
    assert len(hit["kept"]) == 1 and len(hit["skipped"]) == 1
    assert hit["kept"] != miss_dir["kept"]

    absent = cat.prune_preview("lake", "docs", [("doc_id", "=", 99999)])
    assert absent["kept"] == []  # value in-range for bounds, absent in both blooms
    assert cat.load("lake", "docs", filters=[("doc_id", "=", 99999)]).count() == 0
    assert cat.load("lake", "docs", filters=[("doc_id", "=", 1234)]).collect() == [
        (1234,)
    ]

    # IN probe: survives iff ANY member might be present
    pv = cat.prune_preview("lake", "docs", [("doc_id", "in", [1234, 99999])])
    assert pv["kept"] == hit["kept"]
    pv_empty = cat.prune_preview("lake", "docs", [("doc_id", "in", [])])
    assert pv_empty["kept"] == []


def test_bloom_has_no_false_negatives_and_survives_append_schema_gap(spark, cat):
    vals = spark.range(1000).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("tag")
    )
    cat.create_table("lake", "kv", vals, bloom_filter_cols=["k", "tag"])
    manifest = cat._read_manifest("lake", "kv")
    # every present value must probe positive (no false negatives)
    for probe in (0, 1, 499, 999):
        assert cat.prune_preview("lake", "kv", [("k", "=", probe)])["kept"]
        assert cat.prune_preview("lake", "kv", [("tag", "=", f"v{probe}")])["kept"]
    # a dir written without the indexed column has no bloom entry for it
    cat.append(
        "lake", "kv", spark.range(5).select((F.col("id") + 5000).alias("k"))
    )
    manifest = cat._read_manifest("lake", "kv")
    d2 = manifest["snapshots"][-1]["data_dirs"][-1]
    assert "tag" not in manifest["dir_blooms"][d2]
    # probing tag still sound: the new dir survives (no filter ⇒ keep)
    pv = cat.prune_preview("lake", "kv", [("tag", "=", "v1")])
    assert d2 in pv["kept"]


def test_bloom_probe_positions_match_spark_md5(spark):
    # the Python probe and the Spark write-side hash must agree bit-for-bit
    rows = spark.range(50).select(
        F.col("id").cast("string").alias("s"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("h1"),
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 9, 8), 16, 10)
        .cast("long")
        .alias("h2"),
    ).collect()
    for r in rows:
        expect = [(r.h1 + i * r.h2) % 8192 for i in range(4)]
        assert _bloom_probe_positions(int(r.s), 8192, 4) == expect


def test_count_where_metadata_only(spark, cat):
    """Range counts over range-partitioned appends: interior dirs are
    answered from the manifest, only boundary dirs scan."""
    for start in (0, 100, 200, 300):
        df = spark.range(start, start + 100).select(
            F.col("id"), (F.col("id") % 7).alias("v")
        )
        if start == 0:
            cat.create_table("lake", "cnt", df)
        else:
            cat.append("lake", "cnt", df)

    out = cat.count_where("lake", "cnt", [("id", ">=", 150)])
    assert out["count"] == 250
    # dirs [200,300) and [300,400) are proven full matches; [100,200) is
    # the boundary scan; [0,100) is pruned outright
    assert len(out["metadata_dirs"]) == 2 and len(out["scanned_dirs"]) == 1

    assert cat.count_where("lake", "cnt", [])["scanned_dirs"] == []
    assert cat.count_where("lake", "cnt", [])["count"] == 400
    assert cat.count_where("lake", "cnt", [("id", "<", 0)])["count"] == 0
    eq = cat.count_where("lake", "cnt", [("id", "=", 250)])
    assert eq["count"] == 1 and len(eq["scanned_dirs"]) == 1

    # null rows break full-match proofs but never correctness
    withnull = spark.createDataFrame(
        [(None, 1), (500, 1)], "id long, v long"
    )
    cat.append("lake", "cnt", withnull)
    out2 = cat.count_where("lake", "cnt", [("id", ">=", 150)])
    assert out2["count"] == 251


def test_count_where_mor_deletes_fall_back(spark, cat):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 3).alias("v"))
    cat.create_table("lake", "morc", df)
    cat.delete_where_mor("lake", "morc", [("v", "=", 0)])
    out = cat.count_where("lake", "morc", [("id", "<", 50)])
    assert out["metadata_dirs"] == []
    assert out["count"] == spark.createDataFrame(
        [r for r in df.collect() if r.v != 0 and r.id < 50]
    ).count()


def test_write_distribution_hash_yields_one_file_per_partition(spark, cat):
    df = spark.range(0, 3000, 1, 8).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("pkey")
    )
    cat.create_table(
        "lake", "dist", df, partition_by=["pkey"], write_distribution="hash"
    )
    cat.append("lake", "dist", df)
    import glob as g
    import os

    t = os.path.join(cat.warehouse, "lake", "dist")
    for ddir in ("data-00001", "data-00002"):
        for pv in range(3):
            files = g.glob(os.path.join(t, ddir, f"pkey={pv}", "*.parquet"))
            assert len(files) == 1, (ddir, pv, files)
    # default mode: writer-tasks x partitions files (the problem case)
    cat.create_table("lake", "nodist", df, partition_by=["pkey"])
    many = g.glob(os.path.join(t, "..", "nodist", "data-00001", "pkey=0", "*.parquet"))
    assert len(many) > 1
    assert cat.load("lake", "dist").count() == 6000

    with pytest.raises(ValueError, match="unknown write_distribution"):
        cat.create_table("lake", "bad", df, write_distribution="range")


def test_dynamic_partition_pruning_fires_on_lakehouse_join(spark, cat):
    """Star-join DPP: a selective dim filter must inject a runtime
    dynamicpruning subquery into the partitioned fact scan — at 100 TB
    the fact read shrinks to the dim-selected partitions without any
    static predicate."""
    fact = spark.range(20000).select(
        F.col("id"),
        (F.col("id") % 50).cast("string").alias("date_key"),
        (F.col("id") % 7).alias("v"),
    )
    dim = spark.range(50).select(
        F.col("id").cast("string").alias("date_key"), (F.col("id") % 5).alias("region")
    )
    cat.create_table("lake", "fact", fact, partition_by=["date_key"])
    cat.create_table("lake", "dim", dim)
    j = (
        cat.load("lake", "fact")
        .join(cat.load("lake", "dim").filter(F.col("region") == 1), "date_key")
        .groupBy("region")
        .count()
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert j.collect()[0]["count"] == 4000


def test_zorder_on_string_column(spark, cat):
    """String cluster columns bucket on an order-preserving byte-prefix
    projection — range predicates on the string still skip files."""
    df = spark.range(4000).select(
        F.col("id").alias("row_id"),
        F.concat(
            F.lit("user-"),
            F.lpad(F.pmod(F.col("id") * 2654435761, F.lit(9973)).cast("string"), 4, "0"),
        ).alias("name"),
        F.pmod(F.col("id") * 40503, F.lit(9973)).alias("x"),
    )
    cat.create_table("lake", "spts", df)
    cat.compact("lake", "spts", target_file_partitions=16, cluster_by=["name", "x"])
    pv = cat.prune_preview("lake", "spts", [("name", "<", "user-2000")])
    (d,) = pv["kept"]
    assert len(pv["skipped_files"][d]) >= len(pv["kept_files"][d])
    got = sorted(cat.load("lake", "spts", filters=[("name", "<", "user-2000")]).collect())
    want = sorted(df.filter(F.col("name") < "user-2000").collect())
    assert got == want and got
    # the second (numeric) dimension skips too
    pv2 = cat.prune_preview("lake", "spts", [("x", "<", 500)])
    assert pv2["skipped_files"][d]


def test_expire_snapshots_older_than_retains_recent(spark, cat):
    import time

    df = spark.range(10).select(F.col("id"))
    cat.create_table("lake", "age", df)
    cat.append("lake", "age", df)
    cutoff = time.time()  # snapshots 1-2 are older than this
    time.sleep(0.01)
    cat.append("lake", "age", df)
    cat.append("lake", "age", df)

    out = cat.expire_snapshots("lake", "age", keep_last=1, older_than=cutoff)
    # snapshots 3 and 4 are age-retained even though keep_last=1
    assert out["expired_snapshots"] == [1, 2]
    assert cat.load("lake", "age", snapshot_id=3).count() == 30
    with pytest.raises(ValueError):
        cat.load("lake", "age", snapshot_id=1)


def test_purge_rows_scrubs_history(spark, cat):
    """GDPR purge: the key disappears from EVERY snapshot (time travel
    cannot resurrect it), untouched dirs stay untouched, counts adjust."""
    df1 = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("v"))
    df2 = spark.range(100, 200).select(F.col("id"), (F.col("id") % 5).alias("v"))
    cat.create_table("lake", "pii", df1)
    cat.append("lake", "pii", df2)

    out = cat.purge_rows("lake", "pii", [("id", "=", 42)])
    assert out == {"removed_rows": 1, "rewritten_dirs": 1, "unchanged_dirs": 1}

    # head AND historical snapshots no longer contain the key
    assert cat.load("lake", "pii").filter("id = 42").count() == 0
    assert cat.load("lake", "pii", snapshot_id=1).filter("id = 42").count() == 0
    assert cat.load("lake", "pii", snapshot_id=1).count() == 99
    assert cat.load("lake", "pii").count() == 199
    # everything else intact
    assert cat.load("lake", "pii").filter("id = 41").count() == 1

    # audit trail recorded (manifest + metadata table)
    man = cat._read_manifest("lake", "pii")
    assert man["purges"][0]["removed_rows"] == 1
    audit = cat.metadata_table("lake", "pii", "purges").collect()
    assert len(audit) == 1 and audit[0].removed_rows == 1
    # the second dir (bounds [100,200)) was never rewritten
    assert any(d.startswith("data-00002") for s in man["snapshots"] for d in s["data_dirs"])


def test_purge_rows_range_and_noop(spark, cat):
    df = spark.range(50).select(F.col("id"), F.col("id").alias("k"))
    cat.create_table("lake", "pii2", df)
    noop = cat.purge_rows("lake", "pii2", [("id", ">", 1000)])
    assert noop["removed_rows"] == 0 and noop["rewritten_dirs"] == 0
    out = cat.purge_rows("lake", "pii2", [("id", ">=", 40)])
    assert out["removed_rows"] == 10
    assert cat.load("lake", "pii2").count() == 40

    # MoR deletes block the purge until compacted
    cat.append("lake", "pii2", df.filter("id < 5"))
    cat.delete_where_mor("lake", "pii2", [("id", "=", 1)])
    with pytest.raises(ValueError, match="materialized MoR"):
        cat.purge_rows("lake", "pii2", [("id", "=", 2)])


def test_zorder_on_timestamp_column(spark, cat):
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    df = spark.range(3000).select(
        F.col("id"),
        (F.lit(base) + F.make_interval(mins=F.pmod(F.col("id") * 7919, F.lit(10000))))
        .alias("ts"),
        F.pmod(F.col("id") * 104729, F.lit(9973)).alias("x"),
    )
    cat.create_table("lake", "tpts", df)
    cat.compact("lake", "tpts", target_file_partitions=12, cluster_by=["ts", "x"])
    cutoff = base + dt.timedelta(minutes=2000)
    pv = cat.prune_preview("lake", "tpts", [("ts", "<", cutoff)])
    (d,) = pv["kept"]
    assert pv["skipped_files"][d]
    got = cat.load("lake", "tpts", filters=[("ts", "<", cutoff)]).count()
    want = df.filter(F.col("ts") < F.lit(cutoff)).count()
    assert got == want and got > 0


def test_compact_target_file_mb(spark, cat):
    df = spark.range(50000).select(
        F.col("id"), F.concat(F.lit("payload-"), F.col("id")).alias("s")
    )
    cat.create_table("lake", "sized", df)
    cat.append("lake", "sized", df)
    # tiny target forces multiple output files; huge target forces one
    snap = cat.compact("lake", "sized", target_file_mb=1)
    import glob as g
    import os

    files = g.glob(
        os.path.join(cat.warehouse, "lake", "sized", snap.data_dirs[-1], "*.parquet")
    )
    assert len(files) >= 1
    cat.compact("lake", "sized", target_file_mb=10_000)
    snap2 = cat.current_snapshot("lake", "sized")
    files2 = g.glob(
        os.path.join(cat.warehouse, "lake", "sized", snap2.data_dirs[-1], "*.parquet")
    )
    assert len(files2) == 1
    assert cat.load("lake", "sized").count() == 100000


def test_describe_table(spark, cat):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("k")
    )
    cat.create_table(
        "lake", "desc", df, partition_by=["k"],
        bloom_filter_cols=["id"], write_distribution="hash",
    )
    cat.append("lake", "desc", df)
    cat.create_tag("lake", "desc", "v1")
    cat.alter_partition_spec("lake", "desc", ["bucket(2, id)"])
    cat.delete_where_mor("lake", "desc", [("id", "=", 1)])

    d = cat.describe_table("lake", "desc")
    assert d["table"] == "lake.desc"
    assert d["columns"] == ["id", "k"]
    assert d["partition_by"] == ["bucket(2, id)"]
    assert d["retired_specs"] == [["k"]]
    # the MoR delete's head snapshot already nets out the 2 deleted rows
    assert d["row_count"] == 198 and d["n_snapshots"] == 3
    assert d["n_data_dirs"] == 2 and d["size_bytes"] > 0
    assert d["refs"] == ["v1"]
    assert d["bloom_filter_cols"] == ["id"]
    assert d["write_distribution"] == "hash"
    assert d["pending_mor_deletes"] == 1 and d["n_purges"] == 0


def test_purge_multi_dir_rewrites_run_concurrently(spark, cat):
    """A purge touching several dirs must fan the per-dir rewrites out
    on the thread pool (not one sequential Spark job per dir) — and the
    result must equal the serial semantics exactly."""
    import threading

    for i in range(4):
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id"), (F.col("id") % 7).alias("v")
        )
        if i == 0:
            cat.create_table("lake", "par", df)
        else:
            cat.append("lake", "par", df)

    seen_threads: set[str] = set()
    orig = cat._write_data_dir

    def spy(*a, **kw):
        seen_threads.add(threading.current_thread().name)
        return orig(*a, **kw)

    cat._write_data_dir = spy
    try:
        out = cat.purge_rows("lake", "par", [("v", "=", 6)])
    finally:
        cat._write_data_dir = orig

    # v == 6 hits every dir (ids 6,13,... in each 100-block)
    assert out["rewritten_dirs"] == 4
    assert cat.load("lake", "par").filter("v = 6").count() == 0
    assert cat.load("lake", "par").count() == 400 - out["removed_rows"]
    # every historical snapshot is scrubbed too
    assert cat.load("lake", "par", snapshot_id=1).filter("v = 6").count() == 0
    assert len(seen_threads) > 1, f"rewrites ran on one thread: {seen_threads}"


def test_expire_keep_last_zero_pins_main_head(spark, cat):
    """Iceberg never expires the current snapshot: keep_last=0 must
    leave the main head live so describe_table and the default read
    path agree."""
    df = spark.range(10).select(F.col("id"))
    cat.create_table("lake", "pin", df)
    cat.append("lake", "pin", df)

    out = cat.expire_snapshots("lake", "pin", keep_last=0)
    assert out["expired_snapshots"] == [1]
    # head readable, correct rows
    assert cat.load("lake", "pin").count() == 20
    desc = cat.describe_table("lake", "pin")
    assert desc["current_snapshot_id"] == 2
    assert desc["row_count"] == 20
    with pytest.raises(ValueError):
        cat.load("lake", "pin", snapshot_id=1)


def test_purge_partial_failure_leaves_no_partial_state(spark, cat):
    """If one dir rewrite fails mid-purge, the purge raises, the table
    is untouched (manifest unchanged, all rows readable), and the dirs
    claimed by the successful rewrites are discarded."""
    for i in range(3):
        df = spark.range(i * 50, (i + 1) * 50).select(
            F.col("id"), (F.col("id") % 7).alias("v")
        )
        if i == 0:
            cat.create_table("lake", "pfail", df)
        else:
            cat.append("lake", "pfail", df)
    before = cat._read_manifest("lake", "pfail")

    orig = cat._write_data_dir
    calls = {"n": 0}

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("disk full")
        return orig(*a, **kw)

    cat._write_data_dir = flaky
    try:
        with pytest.raises(RuntimeError, match="disk full"):
            cat.purge_rows("lake", "pfail", [("v", "=", 3)])
    finally:
        cat._write_data_dir = orig

    after = cat._read_manifest("lake", "pfail")
    assert after == before  # manifest untouched
    assert cat.load("lake", "pfail").count() == 150  # nothing lost
    assert cat.load("lake", "pfail").filter("v = 3").count() > 0
    # a clean retry then succeeds end-to-end
    out = cat.purge_rows("lake", "pfail", [("v", "=", 3)])
    assert out["removed_rows"] > 0
    assert cat.load("lake", "pfail").filter("v = 3").count() == 0


def test_orphan_gc_collects_failed_purge_residue(spark, cat):
    """A rewrite that fails AFTER claiming/writing its dir strands it on
    disk unreferenced; remove_orphan_files collects it once past the
    grace period — closing the failed-purge cleanup loop."""
    import os
    import time as _time

    df = spark.range(60).select(F.col("id"), (F.col("id") % 3).alias("v"))
    cat.create_table("lake", "orph", df)

    orig = cat._write_data_dir

    def claim_then_fail(ns, tbl, manifest, frame):
        d, added, stats = orig(ns, tbl, manifest, frame)
        raise RuntimeError("simulated post-write crash")

    cat._write_data_dir = claim_then_fail
    try:
        with pytest.raises(RuntimeError, match="post-write crash"):
            cat.purge_rows("lake", "orph", [("v", "=", 1)])
    finally:
        cat._write_data_dir = orig

    base = cat._table_path("lake", "orph")
    man = cat._read_manifest("lake", "orph")
    referenced = {d for s in man["snapshots"] for d in s["data_dirs"]}
    on_disk = {e for e in os.listdir(base) if e.startswith("data-")}
    stranded = on_disk - referenced
    assert stranded  # the crashed rewrite left an orphan dir

    # young orphans are protected by the grace period
    out = cat.remove_orphan_files("lake", "orph", older_than_s=3600)
    assert out["deleted"] == [] and set(out["kept_young"]) == stranded
    # past the grace period they are collected; table reads unharmed
    out2 = cat.remove_orphan_files("lake", "orph", older_than_s=0.0)
    assert set(out2["deleted"]) == stranded
    assert cat.load("lake", "orph").count() == 60


# ---------------------------------------------------------------------------
# operators.layout: exact-quantized z-order keys (the SQL-replayable path)
# ---------------------------------------------------------------------------


def test_zorder_keys_match_python_morton(spark):
    """zorder_keys reproduces the Morton interleave of the exact affine
    quantization bit-for-bit against a pure-Python replay."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import layout

    rows = [(i, x, y) for i, (x, y) in enumerate(
        (x, y) for x in (3, 7, 19, 40, 63) for y in (100, 205, 399)
    )]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    bits = 4
    out = {r.id: r for r in layout.zorder_keys(df, ["x", "y"], bits).collect()}

    xs, ys = [r[1] for r in rows], [r[2] for r in rows]
    mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)

    def q(v, mn, mx):
        return ((v - mn) * (1 << bits)) // (mx - mn + 1)

    def morton(q0, q1):
        z = 0
        for i in range(bits):
            z |= ((q0 >> i) & 1) << (2 * i)
            z |= ((q1 >> i) & 1) << (2 * i + 1)
        return z

    for i, x, y in rows:
        q0, q1 = q(x, mnx, mxx), q(y, mny, mxy)
        assert (out[i].q0, out[i].q1) == (q0, q1)
        assert out[i].zvalue == morton(q0, q1)
        assert 0 <= out[i].q0 < 16 and 0 <= out[i].q1 < 16


def test_cluster_by_zorder_tightens_both_dimensions(spark, tmp_path):
    """The layout property itself: files written along the z-curve have
    small min/max spans on BOTH clustered columns, while a linear sort
    is tight on its leading column only — the second dimension's
    per-file span stays ~full-range, so filters on it prune nothing."""
    import pyarrow.parquet as pq

    from snowflake_iceberg_cld_bcdr_demo_spark.operators import layout

    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )

    def spans(path):
        out = []
        for frag in pq.ParquetDataset(path).fragments:
            t = pq.read_table(frag.path, columns=["x", "y"])
            xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
            out.append(
                (
                    (max(xs) - min(xs)) / (n - 1),
                    (max(ys) - min(ys)) / (n - 1),
                )
            )
        return out

    zdir, ldir = str(tmp_path / "zorder"), str(tmp_path / "linear")
    layout.cluster_by_zorder(grid, ["x", "y"], 16, bits=6).write.parquet(zdir)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        ldir
    )
    z_spans, l_spans = spans(zdir), spans(ldir)
    # z-order: every file covers a small rectangle in BOTH dims
    assert max(s[0] for s in z_spans) <= 0.5
    assert max(s[1] for s in z_spans) <= 0.5
    # linear sort: x tight, y full-range in (almost) every file
    assert max(s[0] for s in l_spans) <= 0.5
    assert min(s[1] for s in l_spans) > 0.9


def test_zorder_keys_validates(spark):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import layout

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError):
        layout.zorder_keys(df, [])
    with pytest.raises(ValueError):
        layout.zorder_keys(df, ["x", "y"], bits=32)  # 64 bits > signed long
    # degenerate span (min == max): all buckets 0, single cell
    one = spark.createDataFrame([(5, 7), (5, 9)], "x long, y long")
    rows = layout.zorder_keys(one, ["x", "y"], bits=4).collect()
    assert all(r.q0 == 0 for r in rows)
    # x constant -> even output bits all zero; y spreads: 7 -> bucket 0,
    # 9 -> bucket (2*16)//3 = 10 (1010b) -> odd bits 3 and 7 -> 136
    assert {r.zvalue for r in rows} == {0, 136}


def test_exact_zorder_compact_skips_files_on_both_dimensions(spark, cat):
    """compact(cluster_by=..., exact=True): the hash-certified affine
    quantization drives the production rewrite — per-file bounds prune
    on BOTH clustered dimensions, content is unchanged, and non-integral
    cluster columns fail fast."""
    df = _two_dim_frame(spark)
    cat.create_table("lake", "epoints", df.filter("row_id % 2 = 0"))
    cat.append("lake", "epoints", df.filter("row_id % 2 = 1"))
    before = cat.prune_preview("lake", "epoints", [("x", "<", 500)])
    assert before["skipped"] == []

    cat.compact(
        "lake", "epoints", target_file_partitions=16,
        cluster_by=["x", "y"], exact=True,
    )
    manifest = cat._read_manifest("lake", "epoints")
    files = next(iter(manifest["file_stats"].values()))
    assert len(files) == 16
    for col in ("x", "y"):
        pv = cat.prune_preview("lake", "epoints", [(col, "<", 500)])
        (d,) = pv["kept"]
        assert len(pv["skipped_files"][d]) >= len(pv["kept_files"][d])

    full = sorted(cat.load("lake", "epoints").collect())
    assert full == sorted(df.collect())
    got = sorted(
        cat.load("lake", "epoints", filters=[("x", "<", 500), ("y", ">", 2000)])
        .collect()
    )
    want = sorted(df.filter("x < 500 AND y > 2000").collect())
    assert got == want and got

    with pytest.raises(ValueError, match="integral cluster columns"):
        strs = _two_dim_frame(spark, n=50).withColumn(
            "s", F.col("x").cast("string")
        )
        cat.create_table("lake", "spoints", strs)
        cat.compact("lake", "spoints", cluster_by=["s"], exact=True)
