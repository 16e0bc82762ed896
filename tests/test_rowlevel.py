"""Row-level DELETE / UPDATE / MERGE INTO (file-level copy-on-write) and
SCD2 dimension maintenance.

The reference has no row-level writes (dimensions are recreated wholesale,
`/root/reference/scripts/04_create_glue_iceberg_tables.py:143-205`); these
are the Iceberg-user-facing operations the emulation was still missing:
copy-on-write at data-dir granularity (untouched dirs carry by reference),
serializable conflict detection, and versioned dimensions on top.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.jobs import scd
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
    CommitConflictError,
    LakehouseCatalog,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return LakehouseCatalog(spark, str(tmp_path / "wh"), name="cld")


def _batch(spark, lo, hi, tag="a"):
    """Rows with id in [lo, hi) — appends with disjoint id ranges give the
    manifest disjoint per-dir bounds, the CoW pruning substrate."""
    return spark.range(lo, hi).select(
        F.col("id"),
        F.lit(tag).alias("tag"),
        (F.col("id") * 2.0).alias("val"),
    )


# -- DELETE ----------------------------------------------------------------


def test_delete_where_rewrites_only_touched_dirs(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 100))
    cat.append("db", "t", _batch(spark, 100, 200, tag="b"))
    before = cat.current_snapshot("db", "t")
    snap = cat.delete_where("db", "t", [("id", ">=", 150)])
    assert snap.operation == "rewrite"
    # dir 1 (ids 0..99) proves no match → carried by reference
    assert before.data_dirs[0] in snap.data_dirs
    # dir 2 was rewritten → its name is gone from the new snapshot
    assert before.data_dirs[1] not in snap.data_dirs
    assert snap.row_count == 150
    assert cat.load("db", "t").count() == 150
    assert cat.load("db", "t").agg(F.max("id")).first()[0] == 149
    # history intact: pre-delete snapshot still reads 200 rows
    assert cat.load("db", "t", snapshot_id=before.snapshot_id).count() == 200


def test_delete_where_no_match_is_metadata_noop(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 100))
    before = cat.current_snapshot("db", "t")
    snap = cat.delete_where("db", "t", [("id", ">=", 1000)])
    assert snap.snapshot_id == before.snapshot_id  # no new snapshot at all


def test_delete_where_null_predicate_rows_are_kept(spark, cat):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 50.0)], "id long, val double"
    )
    cat.create_table("db", "t", df)
    cat.delete_where("db", "t", [("val", ">", 20.0)])
    left = {r.id for r in cat.load("db", "t").collect()}
    assert left == {1, 2}  # NULL val: predicate unknown → row kept


# -- UPDATE ----------------------------------------------------------------


def test_update_where_applies_assignments_to_matching_rows_only(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 100))
    cat.append("db", "t", _batch(spark, 100, 200, tag="b"))
    before = cat.current_snapshot("db", "t")
    snap = cat.update_where(
        "db", "t",
        {"tag": F.lit("hot"), "val": "val * 10"},
        [("id", ">=", 190)],
    )
    assert snap.operation == "rewrite"
    assert before.data_dirs[0] in snap.data_dirs  # untouched dir carried
    cur = cat.load("db", "t")
    assert cur.count() == 200
    hot = cur.filter(F.col("tag") == "hot")
    assert hot.count() == 10
    assert hot.agg(F.min("val")).first()[0] == 190 * 2.0 * 10
    # a row in the rewritten dir but outside the predicate is unchanged
    row = cur.filter(F.col("id") == 150).first()
    assert row.tag == "b" and row.val == 300.0


def test_update_where_unknown_column_raises(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    with pytest.raises(ValueError, match="unknown column"):
        cat.update_where("db", "t", {"nope": F.lit(1)}, [("id", ">=", 0)])


# -- MERGE INTO ------------------------------------------------------------


def test_merge_into_update_insert_delete_clauses(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    source = spark.createDataFrame(
        [(5, "upd", 1.0), (6, "del", 2.0), (20, "new", 3.0)],
        "id long, tag string, val double",
    )
    snap = cat.merge_into(
        "db", "t", source, on=["id"],
        when_matched_update={"tag": "s.tag", "val": "s.val"},
        when_matched_delete="s.tag = 'del'",
        when_not_matched_insert=True,
    )
    assert snap.operation == "rewrite"
    cur = cat.load("db", "t")
    assert cur.count() == 10  # 10 - 1 deleted + 1 inserted
    assert cur.filter("id = 6").count() == 0
    assert cur.filter("id = 5").first().tag == "upd"
    assert cur.filter("id = 20").first().val == 3.0
    assert cur.filter("id = 3").first().tag == "a"  # untouched


def test_merge_into_prunes_disjoint_dirs(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 100))
    cat.append("db", "t", _batch(spark, 1000, 1100, tag="b"))
    before = cat.current_snapshot("db", "t")
    source = spark.createDataFrame([(1050, "x", 0.0)], "id long, tag string, val double")
    snap = cat.merge_into(
        "db", "t", source, on=["id"],
        when_matched_update={"tag": "s.tag"},
    )
    # dir of ids 0..99 can't overlap [1050, 1050] → carried by reference
    assert before.data_dirs[0] in snap.data_dirs
    assert before.data_dirs[1] not in snap.data_dirs
    assert cat.load("db", "t").filter("id = 1050").first().tag == "x"
    assert snap.row_count == 200


def test_merge_into_duplicate_source_keys_rejected(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    dup = spark.createDataFrame(
        [(1, "x", 0.0), (1, "y", 0.0)], "id long, tag string, val double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        cat.merge_into("db", "t", dup, on=["id"], when_matched_update={"tag": "s.tag"})


def test_merge_into_insert_only_against_carried_dirs(spark, cat):
    """A source key that lives in a dir the bounds pruned out must still
    NOT re-insert (the anti-join sees the whole table)."""
    cat.create_table("db", "t", _batch(spark, 0, 100))
    cat.append("db", "t", _batch(spark, 1000, 1100, tag="b"))
    source = spark.createDataFrame(
        [(50, "x", 0.0), (2000, "new", 1.0)], "id long, tag string, val double"
    )
    # key range [50, 2000] overlaps both dirs → no carry here; shrink the
    # range instead: merge only the high key, then assert id=50 (in the
    # carried low dir) isn't duplicated by a second merge inserting it
    cat.merge_into("db", "t", source, on=["id"], when_matched_update={"tag": "s.tag"})
    assert cat.load("db", "t").filter("id = 50").count() == 1
    assert cat.load("db", "t").filter("id = 2000").count() == 1
    assert cat.load("db", "t").count() == 201


def test_rewrite_conflict_with_concurrent_commit(spark, cat):
    """A rewrite planned against snapshot N must abort if another commit
    lands first — otherwise the concurrent rows would silently vanish."""
    cat.create_table("db", "t", _batch(spark, 0, 100))
    manifest, snap, touched, carried, backfill = cat._plan_rewrite(
        "db", "t", [("id", ">=", 0)]
    )
    cat.append("db", "t", _batch(spark, 100, 200, tag="b"))  # interleaver
    keep = cat._read_dirs_clean("db", "t", touched, manifest).filter("id < 50")
    with pytest.raises(CommitConflictError, match="head advanced"):
        cat._commit(
            "db", "t", manifest, keep, "rewrite",
            carry_dirs=carried, base_snapshot_id=snap["snapshot_id"],
            extra_dir_rows=backfill,
        )
    # the interleaved append's rows survived
    assert cat.load("db", "t").count() == 200


# -- SCD2 ------------------------------------------------------------------


def _dim(spark, rows):
    return spark.createDataFrame(rows, "cust_id long, segment string, region string")


def test_scd2_lifecycle(spark, cat):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    t2 = dt.datetime(2024, 3, 1)
    scd.scd2_init(
        cat, "dim", "customer",
        _dim(spark, [(1, "gold", "us"), (2, "silver", "eu")]), t0,
    )

    # v2: customer 1 changes segment, customer 3 appears, customer 2 unchanged
    out = scd.scd2_apply(
        cat, "dim", "customer",
        _dim(spark, [(1, "platinum", "us"), (2, "silver", "eu"), (3, "bronze", "ap")]),
        key_cols=["cust_id"], tracked_cols=["segment", "region"], effective=t1,
    )
    assert out["changed"] == 1 and out["inserted"] == 1

    cur = scd.scd2_current(cat, "dim", "customer")
    assert cur.count() == 3
    assert cur.filter("cust_id = 1").first().segment == "platinum"

    # full history: customer 1 has two versions, properly chained
    hist = (
        cat.load("dim", "customer").filter("cust_id = 1")
        .orderBy("valid_from").collect()
    )
    assert len(hist) == 2
    assert hist[0].valid_to == t1 and hist[0].is_current is False
    assert hist[1].valid_from == t1 and hist[1].valid_to is None

    # point-in-time: before the change, customer 1 was gold; customer 3 absent
    asof = scd.scd2_as_of(cat, "dim", "customer", dt.datetime(2024, 1, 15))
    assert asof.count() == 2
    assert asof.filter("cust_id = 1").first().segment == "gold"

    # v3 with close_missing: customer 2 disappears
    out = scd.scd2_apply(
        cat, "dim", "customer",
        _dim(spark, [(1, "platinum", "us"), (3, "bronze", "ap")]),
        key_cols=["cust_id"], tracked_cols=["segment", "region"],
        effective=t2, close_missing=True,
    )
    assert out["closed_missing"] == 1 and out["changed"] == 0 and out["inserted"] == 0
    cur = scd.scd2_current(cat, "dim", "customer")
    assert {r.cust_id for r in cur.collect()} == {1, 3}
    # customer 2 still visible as-of January
    assert scd.scd2_as_of(cat, "dim", "customer", dt.datetime(2024, 1, 15)).filter(
        "cust_id = 2"
    ).count() == 1


def test_scd2_noop_apply_writes_nothing(spark, cat):
    t0 = dt.datetime(2024, 1, 1)
    scd.scd2_init(cat, "dim", "customer", _dim(spark, [(1, "gold", "us")]), t0)
    before = cat.current_snapshot("dim", "customer").snapshot_id
    out = scd.scd2_apply(
        cat, "dim", "customer", _dim(spark, [(1, "gold", "us")]),
        key_cols=["cust_id"], tracked_cols=["segment", "region"],
        effective=dt.datetime(2024, 2, 1),
    )
    assert out["changed"] == 0 and out["inserted"] == 0 and out["snapshot"] is None
    assert cat.current_snapshot("dim", "customer").snapshot_id == before


# -- branches / tags / write-audit-publish ---------------------------------


def test_wap_branch_stage_audit_publish(spark, cat):
    """Write-audit-publish: stage an append on a branch, audit it via the
    branch ref while main is untouched, then fast-forward publish."""
    cat.create_table("db", "t", _batch(spark, 0, 50))
    snap = cat.append("db", "t", _batch(spark, 50, 80, tag="staged"), branch="audit")
    assert snap.branch == "audit"
    # main readers see nothing of the staged commit
    assert cat.load("db", "t").count() == 50
    assert cat.current_snapshot("db", "t").row_count == 50
    # branch readers see the staged state
    assert cat.load("db", "t", ref="audit").count() == 80
    # a second staged append chains on the branch
    cat.append("db", "t", _batch(spark, 80, 90, tag="staged"), branch="audit")
    assert cat.load("db", "t", ref="audit").count() == 90
    assert cat.load("db", "t").count() == 50
    # audit passed → publish: main fast-forwards, metadata only
    head = cat.publish_branch("db", "t", "audit")
    assert head.row_count == 90
    assert cat.load("db", "t").count() == 90
    assert "audit" not in cat.list_refs("db", "t")


def test_wap_publish_refuses_diverged_main(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    cat.append("db", "t", _batch(spark, 10, 20), branch="wap")
    cat.append("db", "t", _batch(spark, 100, 110, tag="main"))  # main diverges
    with pytest.raises(CommitConflictError, match="not fast-forwardable"):
        cat.publish_branch("db", "t", "wap")
    # main unaffected, branch still readable
    assert cat.load("db", "t").count() == 20
    assert cat.load("db", "t", ref="wap").count() == 20


def test_tags_pin_snapshots_and_survive_expiry(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    cat.create_tag("db", "t", "v1.0")
    cat.append("db", "t", _batch(spark, 10, 30))
    cat.append("db", "t", _batch(spark, 30, 60))
    # tag still reads the pinned state after main advanced
    assert cat.load("db", "t", ref="v1.0").count() == 10
    # expiry keeps the tagged snapshot's data alive
    cat.expire_snapshots("db", "t", keep_last=1)
    assert cat.load("db", "t", ref="v1.0").count() == 10
    assert cat.load("db", "t").count() == 60
    with pytest.raises(ValueError, match="already exists"):
        cat.create_tag("db", "t", "v1.0")
    cat.drop_ref("db", "t", "v1.0")
    with pytest.raises(ValueError, match="no branch/tag"):
        cat.load("db", "t", ref="v1.0")


def test_append_to_tag_rejected(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 5))
    cat.create_tag("db", "t", "pin")
    with pytest.raises(ValueError, match="cannot append to tag"):
        cat.append("db", "t", _batch(spark, 5, 8), branch="pin")


# -- changelog -------------------------------------------------------------


def test_changelog_append_only_is_insert_scan(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    s1 = cat.current_snapshot("db", "t").snapshot_id
    cat.append("db", "t", _batch(spark, 10, 15, tag="b"))
    cl = cat.changelog("db", "t", s1)
    rows = cl.collect()
    assert all(r._change_type == "insert" for r in rows)
    assert {r.id for r in rows} == set(range(10, 15))


def test_changelog_surfaces_update_as_delete_plus_insert(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    s1 = cat.current_snapshot("db", "t").snapshot_id
    cat.update_where("db", "t", {"tag": F.lit("upd")}, [("id", "=", 3)])
    cat.delete_where("db", "t", [("id", "=", 7)])
    cl = cat.changelog("db", "t", s1).collect()
    by_type = {}
    for r in cl:
        by_type.setdefault(r._change_type, []).append(r)
    # update of id=3 → delete(old) + insert(new); delete of id=7 → delete
    assert {r.id for r in by_type["delete"]} == {3, 7}
    assert {r.id for r in by_type["insert"]} == {3}
    assert by_type["insert"][0].tag == "upd"


def test_changelog_same_snapshot_is_empty(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 5))
    s1 = cat.current_snapshot("db", "t").snapshot_id
    assert cat.changelog("db", "t", s1, s1).count() == 0


def test_refs_metadata_table(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 5))
    cat.create_tag("db", "t", "v1")
    cat.append("db", "t", _batch(spark, 5, 9), branch="wip")
    rows = {r.name: (r.type, r.snapshot_id) for r in cat.metadata_table("db", "t", "refs").collect()}
    assert rows["main"] == ("branch", 1)
    assert rows["v1"] == ("tag", 1)
    assert rows["wip"] == ("branch", 2)


# -- merge-on-read deletes -------------------------------------------------


def test_mor_delete_defers_rewrite_and_scopes_to_old_files(spark, cat):
    """Equality deletes: no data dir rewrites, reads anti-join the delete
    set, and a row re-inserted AFTER the delete survives (sequence-number
    scope semantics)."""
    cat.create_table("db", "t", _batch(spark, 0, 100))
    dirs_before = cat.current_snapshot("db", "t").data_dirs
    snap = cat.delete_where_mor("db", "t", [("id", "<", 10)], equality_cols=["id"])
    assert snap.operation == "delete"
    assert snap.data_dirs == dirs_before  # no data rewritten
    assert snap.row_count == 90
    assert cat.load("db", "t").count() == 90
    assert cat.load("db", "t").filter("id < 10").count() == 0
    # re-insert id 3: the old delete must NOT swallow the new row
    cat.append("db", "t", _batch(spark, 3, 4, tag="reborn"))
    cur = cat.load("db", "t")
    assert cur.count() == 91
    assert cur.filter("id = 3").first().tag == "reborn"
    # time travel: pre-delete snapshot unaffected
    assert cat.load("db", "t", snapshot_id=1).count() == 100


def test_mor_compact_materializes_deletes(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 50))
    cat.delete_where_mor("db", "t", [("id", ">=", 40)], equality_cols=["id"])
    snap = cat.compact("db", "t")
    assert not [d for d in snap.data_dirs if d.startswith("deletes-")]
    assert cat.load("db", "t").count() == 40
    # after compaction CoW rewrites are allowed again
    cat.delete_where("db", "t", [("id", ">=", 35)])
    assert cat.load("db", "t").count() == 35
    # expiry reclaims the dead delete dir from disk
    import os

    cat.expire_snapshots("db", "t", keep_last=1)
    on_disk = [e for e in os.listdir(cat._table_path("db", "t")) if e.startswith("deletes-")]
    assert on_disk == []


def test_mor_blocks_cow_rewrite_until_compacted(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 50))
    cat.delete_where_mor("db", "t", [("id", "=", 5)], equality_cols=["id"])
    with pytest.raises(ValueError, match="outstanding merge-on-read"):
        cat.delete_where("db", "t", [("id", "=", 6)])
    with pytest.raises(ValueError, match="outstanding merge-on-read"):
        cat.update_where("db", "t", {"tag": F.lit("x")}, [("id", "=", 6)])


def test_mor_changelog_and_rollback(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 20))
    s1 = cat.current_snapshot("db", "t").snapshot_id
    cat.delete_where_mor("db", "t", [("id", ">=", 15)], equality_cols=["id"])
    cl = cat.changelog("db", "t", s1).collect()
    assert {r._change_type for r in cl} == {"delete"}
    assert {r.id for r in cl} == {15, 16, 17, 18, 19}
    # rollback to the MoR-delete snapshot from a later state reapplies it
    cat.append("db", "t", _batch(spark, 100, 105))
    cat.rollback_to_snapshot("db", "t", 2)
    assert cat.load("db", "t").count() == 15


def test_mor_no_match_is_noop(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    before = cat.current_snapshot("db", "t").snapshot_id
    snap = cat.delete_where_mor("db", "t", [("id", ">", 999)], equality_cols=["id"])
    assert snap.snapshot_id == before


def test_mor_surviving_count_prunes_to_key_bound_dirs(spark, cat, monkeypatch):
    """The exact surviving-row count a MoR delete records must NOT be an
    O(corpus) read (r12 review): it derives from the head's row_count
    minus a matched-row count whose scan carries the delete keys'
    min/max bounds — so on a table with disjoint per-dir ranges, only
    the dir that can contain a key is read."""
    cat.create_table("db", "t", _batch(spark, 0, 100))
    cat.append("db", "t", _batch(spark, 100, 200, tag="b"))
    cat.append("db", "t", _batch(spark, 200, 300, tag="c"))
    seen: list = []
    orig = cat.load

    def spy(ns, table, *a, **kw):
        seen.append(kw.get("filters"))
        return orig(ns, table, *a, **kw)

    monkeypatch.setattr(cat, "load", spy)
    # an `in` delete predicate, so the ONLY >=/<= filters any load sees
    # are the internal key-bounds of the surviving-count scan
    snap = cat.delete_where_mor(
        "db", "t", [("id", "in", list(range(120, 130)))], equality_cols=["id"]
    )
    assert snap.row_count == 290
    assert cat.load("db", "t").count() == 290
    bound = [
        f
        for f in seen
        if f and {op for _, op, _ in f} == {">=", "<="}
    ]
    assert bound, f"surviving-count scan carried no key bounds: {seen}"
    preview = cat.prune_preview("db", "t", bound[-1])
    assert len(preview["kept"]) == 1, preview
    assert len(preview["skipped"]) == 2, preview


def test_mor_surviving_count_exact_with_null_keys(spark, cat):
    """eqNullSafe read semantics: a NULL in the delete key set matches
    NULL rows, which bounds can't locate — the count must skip bounds
    on that column and still come out exact."""
    df = spark.range(0, 20).select(
        F.col("id"),
        F.when(F.col("id") % 5 == 0, F.lit(None)).otherwise(F.lit("t")).alias("tag"),
        (F.col("id") * 2.0).alias("val"),
    )
    cat.create_table("db", "n", df)
    # full-row equality delete of ids 0..4: keys include (0, NULL, 0.0)
    snap = cat.delete_where_mor("db", "n", [("id", "<", 5)])
    assert snap.row_count == 15
    assert cat.load("db", "n").count() == 15
    assert cat.load("db", "n").filter("id < 5").count() == 0


# -- schema-evolution DDL --------------------------------------------------


def test_alter_table_add_drop_rename(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    cat.alter_table(
        "db", "t",
        add_columns={"score": "double"},
        rename_columns={"tag": "label"},
    )
    cur = cat.load("db", "t")
    assert cur.columns == ["id", "label", "val", "score"]
    row = cur.filter("id = 3").first()
    assert row.label == "a" and row.score is None  # old files mapped + null-filled
    # writes after the DDL use the new schema
    new = spark.createDataFrame([(100, "b", 5.0, 0.9)],
                                "id long, label string, val double, score double")
    cat.append("db", "t", new)
    cur = cat.load("db", "t")
    assert cur.count() == 11
    assert cur.filter("id = 100").first().score == 0.9
    assert cur.filter("label = 'a'").count() == 10  # filter on renamed col
    # drop a column: disappears from every read, metadata only
    cat.alter_table("db", "t", drop_columns=["val"])
    assert cat.load("db", "t").columns == ["id", "label", "score"]
    # a CoW rewrite materializes the evolved schema
    cat.update_where("db", "t", {"score": F.lit(1.0)}, [("id", "=", 3)])
    assert cat.load("db", "t").filter("id = 3").first().score == 1.0
    assert cat.load("db", "t").columns == ["id", "label", "score"]


def test_alter_table_guards(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 5))
    with pytest.raises(ValueError, match="unknown column"):
        cat.alter_table("db", "t", rename_columns={"nope": "x"})
    with pytest.raises(ValueError, match="already exists"):
        cat.alter_table("db", "t", add_columns={"tag": "string"})
    cat.alter_table("db", "t", drop_columns=["val"])
    with pytest.raises(ValueError, match="previously dropped"):
        cat.alter_table("db", "t", add_columns={"val": "double"})


def test_upsert_mor_single_snapshot_updates_and_inserts(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 100))
    dirs_before = cat.current_snapshot("db", "t").data_dirs
    src = spark.createDataFrame(
        [(5, "upd", 1.0), (200, "new", 2.0)], "id long, tag string, val double"
    )
    snap = cat.upsert_mor("db", "t", src, equality_cols=["id"])
    assert snap.operation == "upsert"
    # old dirs untouched; exactly one new data dir
    assert set(dirs_before) < set(snap.data_dirs)
    assert len(snap.data_dirs) == len(dirs_before) + 1
    assert snap.row_count == 101
    cur = cat.load("db", "t")
    assert cur.count() == 101
    assert cur.filter("id = 5").first().tag == "upd"
    assert cur.filter("id = 200").first().tag == "new"
    assert cur.filter("id = 6").first().tag == "a"
    # compaction materializes: row set identical, delete dirs cleared
    cat.compact("db", "t")
    assert cat.load("db", "t").count() == 101
    assert cat.load("db", "t").filter("id = 5").first().tag == "upd"


def test_upsert_mor_with_delete_markers_and_idempotence(spark, cat):
    cat.create_table("db", "t", _batch(spark, 0, 10))
    src = spark.createDataFrame(
        [(3, "D", None, None), (11, "I", "x", 1.0)],
        "id long, op string, tag string, val double",
    )
    snap = cat.upsert_mor(
        "db", "t", src, equality_cols=["id"],
        delete_condition="op = 'D'", batch_id=7,
    )
    cur = cat.load("db", "t")
    assert cur.count() == 10  # 10 - 1 deleted + 1 inserted
    assert cur.filter("id = 3").count() == 0
    assert cur.filter("id = 11").first().tag == "x"
    assert "op" not in cur.columns
    # replay with the same batch_id: no-op
    again = cat.upsert_mor(
        "db", "t", src, equality_cols=["id"],
        delete_condition="op = 'D'", batch_id=7,
    )
    assert again.snapshot_id == snap.snapshot_id
    assert cat.load("db", "t").count() == 10
