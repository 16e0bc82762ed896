"""Persisted media-fingerprint index invariants: build == recompute,
append == rebuild (O(batch) maintenance), mining from the stored table
== mining from a fresh fingerprint pass, partition-pruned kind scans,
and the takedown leg (standalone + through the one-call cascade)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.multimodal.media import (
    audio_ahash,
    image_ahash,
    media_neardup_pairs,
    synthesize_decodable_images,
    synthesize_decodable_videos,
    synthesize_decodable_wavs,
    video_ahash,
)
from snowflake_iceberg_cld_bcdr_demo_spark.operators import mediaindex, takedown
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import LakehouseCatalog


@pytest.fixture(scope="module")
def assets(spark):
    # localCheckpoint (eager), not cache: the three synthesis chains are
    # md5-expression trees, and ProjectCollapsing re-inlines a cached
    # plan's expressions into every downstream aHash sample — the
    # codegen blowup the image-aHash registry query documents.  The
    # checkpoint severs lineage so every test plans over plain rows.
    return (
        synthesize_decodable_images(spark, 40)
        .unionByName(synthesize_decodable_wavs(spark, 40))
        .unionByName(synthesize_decodable_videos(spark, 40))
        .localCheckpoint()
    )


def _fps(df):
    return {(r.asset_id, r.kind, r.fp) for r in df.collect()}


def test_media_fp_table_matches_per_kind_recompute(spark, assets):
    got = mediaindex.media_fp_table(assets)
    expect = set()
    for kind, fn in (
        ("image", image_ahash),
        ("audio", audio_ahash),
        ("video", video_ahash),
    ):
        for r in fn(assets.filter(F.col("media_type") == kind)).collect():
            if r.ahash is not None:
                expect.add((r.asset_id, kind, r.ahash))
    assert _fps(got) == expect
    # undecodable content contributes no row
    junk = spark.createDataFrame(
        [("J-1", "image", b"\x00" * 64), ("J-2", "audio", b"\x00" * 64)],
        "asset_id string, media_type string, content binary",
    )
    assert mediaindex.media_fp_table(junk).count() == 0


def test_build_append_equals_rebuild_and_pruned_kind_scan(spark, assets, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="mfp")
    old = assets.filter(F.col("asset_id") < "WAV-999999").filter(
        ~F.col("asset_id").endswith("7")
    )
    new = assets.subtract(old)
    n = mediaindex.build_media_fp_index(cat, "db", old)
    assert n == mediaindex.media_fp_table(old).count()
    added = mediaindex.append_media_fp_index(cat, "db", new, batch_id=0, writer_id="w")
    assert added == mediaindex.media_fp_table(new).count()
    # append-vs-rebuild equality (fingerprints are per-asset rows)
    stored = cat.load("db", "media_fp")
    assert _fps(stored) == _fps(mediaindex.media_fp_table(assets))
    # batch replay no-ops
    assert mediaindex.append_media_fp_index(
        cat, "db", new, batch_id=0, writer_id="w"
    ) == 0
    # kind scan is partition-pruned (hive layout on kind)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cat.load("db", "media_fp").filter(F.col("kind") == "audio").explain()
    assert "PartitionFilters" in buf.getvalue()


def test_mining_from_index_matches_recompute(spark, assets, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="mfp2")
    # plant duplicates so the pair set is non-empty for every kind
    dups = assets.filter(
        F.col("asset_id").isin("BMP-000001", "WAV-000001", "VID-000001")
    ).select(
        F.concat(F.lit("DUP"), F.substring("asset_id", 4, 10)).alias("asset_id"),
        "media_type",
        "content",
        "metadata",
    )
    corpus = assets.unionByName(dups)
    mediaindex.build_media_fp_index(cat, "db", corpus)
    for kind, fn in (
        ("image", image_ahash),
        ("audio", audio_ahash),
        ("video", video_ahash),
    ):
        served = {
            (r.asset_a, r.asset_b, r.hamming)
            for r in mediaindex.media_neardup_from_index(
                cat, "db", kind, max_hamming=1
            ).collect()
        }
        fp = (
            fn(corpus.filter(F.col("media_type") == kind))
            .select("asset_id", F.col("ahash").alias("simhash"))
            .filter(F.col("simhash").isNotNull())
            .localCheckpoint(eager=False)
        )
        direct = {
            (r.asset_a, r.asset_b, r.hamming)
            for r in media_neardup_pairs(fp, max_hamming=1, bits=64).collect()
        }
        assert served == direct and served, kind

    with pytest.raises(ValueError, match="unknown kind"):
        mediaindex.media_neardup_from_index(cat, "db", "hologram")


def test_admission_gate_rejects_near_dups_and_is_replay_safe(
    spark, assets, tmp_path
):
    """The media admission gate: an incoming copy of an indexed asset is
    rejected (near_dup_index), a within-batch copy keeps only the
    min-id representative (near_dup_batch), novel assets are admitted
    and appended so the NEXT batch sees them, and a crash-replayed
    batch re-derives the identical decisions with no double append."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="mfp4")
    corpus = assets.filter(F.col("asset_id") < "BMP-000030").filter(
        F.col("media_type") == "image"
    )
    mediaindex.build_media_fp_index(cat, "db", corpus)
    n0 = cat.current_snapshot("db", "media_fp").row_count

    # batch: an exact copy of indexed BMP-000002, two copies of the
    # un-indexed BMP-000031 (within-batch dup), and a novel BMP-000032
    src = assets.filter(F.col("media_type") == "image")
    batch = (
        src.filter(F.col("asset_id") == "BMP-000002")
        .select(F.lit("NEW-COPY2").alias("asset_id"), "media_type", "content", "metadata")
        .unionByName(
            src.filter(F.col("asset_id") == "BMP-000031").select(
                F.lit("NEW-A31").alias("asset_id"), "media_type", "content", "metadata"
            )
        )
        .unionByName(
            src.filter(F.col("asset_id") == "BMP-000031").select(
                F.lit("NEW-B31").alias("asset_id"), "media_type", "content", "metadata"
            )
        )
        .unionByName(
            src.filter(F.col("asset_id") == "BMP-000032").select(
                F.lit("NEW-NOVEL").alias("asset_id"), "media_type", "content", "metadata"
            )
        )
    )
    out = {
        r.asset_id: r
        for r in mediaindex.admit_media_assets(
            cat, "db", batch, max_hamming=1, batch_id=0, writer_id="gate"
        ).collect()
    }
    assert not out["NEW-COPY2"].admitted
    assert out["NEW-COPY2"].reason == "near_dup_index"
    assert out["NEW-A31"].admitted and out["NEW-A31"].reason is None
    assert not out["NEW-B31"].admitted
    assert out["NEW-B31"].reason == "near_dup_batch"
    assert out["NEW-NOVEL"].admitted
    assert cat.current_snapshot("db", "media_fp").row_count == n0 + 2

    # batch N+1 sees batch N's admissions
    resubmit = src.filter(F.col("asset_id") == "BMP-000031").select(
        F.lit("NEW-C31").alias("asset_id"), "media_type", "content", "metadata"
    )
    out2 = mediaindex.admit_media_assets(
        cat, "db", resubmit, max_hamming=1, batch_id=1, writer_id="gate"
    ).collect()
    assert not out2[0].admitted and out2[0].reason == "near_dup_index"

    # crash-replay of batch 0: identical admit/reject bits, no double
    # append (the advisory reason of a batch-dup may resolve to
    # near_dup_index now that its admitted mate is stored)
    replay = {
        r.asset_id: r.admitted
        for r in mediaindex.admit_media_assets(
            cat, "db", batch, max_hamming=1, batch_id=0, writer_id="gate"
        ).collect()
    }
    assert replay == {k: v.admitted for k, v in out.items()}
    assert cat.current_snapshot("db", "media_fp").row_count == n0 + 2


def test_takedown_leg_standalone_and_cascade(spark, assets, tmp_path):
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="mfp3")
    mediaindex.build_media_fp_index(cat, "db", assets)
    n0 = cat.current_snapshot("db", "media_fp").row_count

    victims = spark.createDataFrame(
        [("BMP-000002",), ("VID-000003",)], "asset_id string"
    )
    removed = mediaindex.delete_assets_from_media_fp_index(cat, "db", victims)
    assert removed == 2
    assert cat.load("db", "media_fp").filter(
        F.col("asset_id").isin("BMP-000002", "VID-000003")
    ).count() == 0

    # the one-call cascade reaches the same leg (docs + media in one go)
    docs = spark.createDataFrame(
        [(1, "text of the removed doc", "s")],
        "doc_id long, text string, source string",
    )
    cat.create_table("db", "corpus", docs)
    out = takedown.takedown_docs(
        cat, "db", docs,
        corpus_table="corpus",
        media_fp_table="media_fp",
        deleted_asset_ids=spark.createDataFrame([("WAV-000004",)], "a string"),
    )
    assert out["media_fp"] == 1
    assert cat.current_snapshot("db", "media_fp").row_count == n0 - 3
    # MoR flavor writes a delete dir instead of rewriting
    out2 = takedown.takedown_docs(
        cat, "db", docs.limit(0),
        media_fp_table="media_fp",
        deleted_asset_ids=spark.createDataFrame([("WAV-000005",)], "a string"),
        mode="mor",
    )
    assert out2["media_fp"] == 1
    assert cat.load("db", "media_fp").filter(
        F.col("asset_id") == "WAV-000005"
    ).count() == 0
