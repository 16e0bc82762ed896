"""Persisted PERCEPTUAL-FINGERPRINT index for media assets — the
multimodal member of the persist-state-once family (`admission_state`,
`retrieval_index`, `ann_codes`): computing image/audio/video aHashes is
a full scan of the asset bytes, so a near-dup mining service that
recomputes them per run is O(corpus bytes) forever.  This module builds
the fingerprints ONCE into a lakehouse table (`media_fp`: one row per
decodable asset, 64-bit hash, partitioned by media kind), appends new
batches in O(batch), serves near-dup mining from the stored table
(bit-identical to a recompute — pytest-pinned), and rides the standard
takedown cascade.

The reference has no media pipeline (its assets are TPC-H-ish rows);
this is part of the beyond-reference LLM-pipeline surface.  Scale: the
fingerprint stage is the narrow codegen'd projection the aHash
operators already are (no shuffle); the index is one 64-bit hash per
asset (bytes never stored twice); mining loads only the requested
kind's partition and routes through the hot-bucket-capped banded join.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: media kind -> (fingerprint fn name in multimodal.media); every fn
#: returns (id_col, ..., "ahash") with NULL for undecodable content
MEDIA_FP_KINDS = ("image", "audio", "video")

DEFAULT_TABLE = "media_fp"


def media_fp_table(
    assets: DataFrame,
    kinds: tuple[str, ...] = MEDIA_FP_KINDS,
    id_col: str = "asset_id",
) -> DataFrame:
    """One row per DECODABLE asset: ``(asset_id, kind, fp)`` with the
    certified 64-bit perceptual aHash of its kind (`image_ahash` /
    `audio_ahash` / `video_ahash` — all pure Catalyst).  Undecodable
    assets (NULL hash) are dropped: they can never pair, and keeping
    them would bloat the index with unservable rows."""
    from ..multimodal.media import audio_ahash, image_ahash, video_ahash

    fns = {"image": image_ahash, "audio": audio_ahash, "video": video_ahash}
    unknown = [k for k in kinds if k not in fns]
    if unknown:
        raise ValueError(f"media_fp_table: unknown kinds {unknown}")
    parts = []
    for kind in kinds:
        sub = assets.filter(F.col("media_type") == kind)
        fp = fns[kind](sub, id_col=id_col).select(
            F.col(id_col).alias("asset_id"),
            F.lit(kind).alias("kind"),
            F.col("ahash").alias("fp"),
        )
        # lineage cut at the 3-column fingerprint frame BEFORE the
        # null-drop: the optimizer pushes `fp IS NOT NULL` below the
        # projection, substituting the whole 64-sample aHash expression
        # into the predicate — with an expression-typed input (the
        # synthesized test corpora) that doubles a tree that is already
        # at the codegen limit and stalls planning for minutes.  The
        # lazy checkpoint is a plan barrier (one materialization of
        # id+kind+hash rows on first action); every downstream consumer
        # (filter, union, the table write) reuses it.
        parts.append(
            fp.localCheckpoint(eager=False).filter(F.col("fp").isNotNull())
        )
    return reduce(lambda a, b: a.unionByName(b), parts)


def build_media_fp_index(
    cat,
    namespace: str,
    assets: DataFrame,
    table: str = DEFAULT_TABLE,
    kinds: tuple[str, ...] = MEDIA_FP_KINDS,
) -> int:
    """Materialize the fingerprint index — build once at corpus-ship
    time, then maintain with :func:`append_media_fp_index` (O(batch))
    and the standard lakehouse compaction cadence.  Partitioned by
    ``kind`` so each mining run lists only its own kind's files.
    Returns the indexed row count."""
    df = media_fp_table(assets, kinds)
    snap = cat.create_table(namespace, table, df, partition_by=["kind"])
    return snap.row_count


def append_media_fp_index(
    cat,
    namespace: str,
    new_assets: DataFrame,
    table: str = DEFAULT_TABLE,
    kinds: tuple[str, ...] = MEDIA_FP_KINDS,
    batch_id: int | None = None,
    writer_id: str | None = None,
) -> int:
    """Incremental maintenance: fingerprint ONLY the new batch and
    append.  Correct by layout — fingerprints are per-asset, so
    disjoint new assets contribute exactly the rows a full rebuild
    would add (append-vs-rebuild equality pytest-pinned).  Takes the
    standard ``batch_id``/``writer_id`` idempotency guard for streaming
    sinks.  Returns rows appended (0 when the guard no-ops a replay)."""
    before = cat.current_snapshot(namespace, table).snapshot_id
    snap = cat.append(
        namespace, table, media_fp_table(new_assets, kinds),
        batch_id=batch_id, writer_id=writer_id,
    )
    # a batch-guarded replay returns the CURRENT snapshot unchanged —
    # its added_rows belong to the batch that originally landed
    return 0 if snap.snapshot_id == before else snap.added_rows


def media_neardup_from_index(
    cat,
    namespace: str,
    kind: str,
    max_hamming: int = 1,
    table: str = DEFAULT_TABLE,
    bands: int | None = None,
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Serve near-dup pairs from the STORED index: load one kind's
    partition (partition-pruned scan — no asset bytes touched, no
    fingerprint recompute) and mine with the capped banded hamming
    join.  Bit-identical to recomputing fingerprints and mining in one
    pass, at O(index-partition) read cost instead of O(corpus bytes)."""
    from ..multimodal.media import media_neardup_pairs

    if kind not in MEDIA_FP_KINDS:
        raise ValueError(f"media_neardup_from_index: unknown kind {kind!r}")
    fp = cat.load(namespace, table, filters=[("kind", "=", kind)]).select(
        "asset_id", F.col("fp").alias("simhash")
    )
    return media_neardup_pairs(
        fp, max_hamming=max_hamming, bands=bands, bits=64,
        max_band_bucket=max_band_bucket,
    )


def _banded(fp: DataFrame, bands: int, width: int) -> DataFrame:
    mask = (1 << width) - 1
    return fp.select(
        "asset_id",
        "kind",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("fp"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select("asset_id", "kind", "fp", "bv.band", "bv.band_key")


def admit_media_assets(
    cat,
    namespace: str,
    new_assets: DataFrame,
    max_hamming: int = 1,
    table: str = DEFAULT_TABLE,
    kinds: tuple[str, ...] = MEDIA_FP_KINDS,
    max_band_bucket: int | None = None,
    batch_id: int | None = None,
    writer_id: str | None = None,
) -> DataFrame:
    """The media ADMISSION GATE — the multimodal twin of the text
    pipeline's incremental dedup admit (`corpus.curated_incremental_
    admit`'s near-dup gate): a new asset is admitted only if NO
    perceptual near-duplicate (hamming ≤ ``max_hamming`` on its kind's
    64-bit aHash) exists in the stored index OR earlier in its own
    batch (min-id representative wins, the dedup discipline); admitted
    assets' fingerprints are appended to the index in the same call, so
    batch N+1 sees batch N.

    Cost is O(batch + touched index buckets): the new side's band keys
    probe the stored table via the pigeonhole banding
    (``max_hamming + 1`` bands — exact recall, same contract as
    :func:`..multimodal.media.media_neardup_pairs`), with kind in the
    join key so hashes never cross modality.  ``max_band_bucket`` drops
    index band keys with more members before the probe join (the
    boilerplate-logo guard).  Crash-replay safe: the append takes the
    standard ``batch_id``/``writer_id`` idempotency guard (no double
    rows), and the probe EXCLUDES stored rows with the probing asset's
    own id — so a replayed batch, whose admissions already sit in the
    index, re-derives the identical admit/reject decisions instead of
    self-rejecting at hamming 0 (the advisory ``reason`` of a rejected
    copy may resolve to ``near_dup_index`` on replay, its admitted
    batch mate now being stored).

    Returns the decision frame ``(asset_id, kind, fp, admitted,
    reason)`` with reason in ``near_dup_index`` / ``near_dup_batch`` /
    NULL (admitted); assets whose content doesn't decode never reach
    the gate (NULL hash — fingerprint them with ``decoder='undecoded'``
    reporting via `media_validity` upstream)."""
    bands = max_hamming + 1
    width = 64 // bands
    fps = media_fp_table(new_assets, kinds)
    newb = _banded(fps, bands, width)
    stored = cat.load(namespace, table, filters=[("kind", "in", list(kinds))])
    storedb = _banded(
        stored.select("asset_id", "kind", "fp"), bands, width
    )
    if max_band_bucket is not None:
        counts = storedb.groupBy("kind", "band", "band_key").count()
        storedb = storedb.join(
            counts.filter(F.col("count") > max_band_bucket).select(
                "kind", "band", "band_key"
            ),
            ["kind", "band", "band_key"],
            "left_anti",
        )
    probe = (
        newb.alias("n")
        .join(
            storedb.alias("s"),
            ["kind", "band", "band_key"],
            "inner",
        )
        # self-exclusion = replay idempotency: a crash-replayed batch's
        # own prior admissions are in the index under the same ids
        .filter(F.col("n.asset_id") != F.col("s.asset_id"))
        .filter(
            F.bit_count(F.col("n.fp").bitwiseXOR(F.col("s.fp"))) <= max_hamming
        )
        .select(F.col("n.asset_id").alias("asset_id"))
        .distinct()
    )
    # within-batch gate: reject an asset that near-dups a SMALLER-id
    # batch mate which itself survives the index gate (min-id
    # representative admitted, its copies rejected)
    batch_pairs = (
        newb.alias("x")
        .join(newb.alias("y"), ["kind", "band", "band_key"], "inner")
        .filter(F.col("x.asset_id") < F.col("y.asset_id"))
        .filter(
            F.bit_count(F.col("x.fp").bitwiseXOR(F.col("y.fp"))) <= max_hamming
        )
        .select(
            F.col("x.asset_id").alias("rep"),
            F.col("y.asset_id").alias("dup"),
        )
        .distinct()
    )
    batch_reject = (
        batch_pairs.join(
            probe.select(F.col("asset_id").alias("rep")), "rep", "left_anti"
        )
        .select(F.col("dup").alias("asset_id"))
        .distinct()
    )
    decisions = (
        fps.join(
            probe.withColumn("_idx", F.lit(True)), "asset_id", "left"
        )
        .join(
            batch_reject.withColumn("_bat", F.lit(True)), "asset_id", "left"
        )
        .select(
            "asset_id",
            "kind",
            "fp",
            (F.col("_idx").isNull() & F.col("_bat").isNull()).alias("admitted"),
            F.when(F.col("_idx").isNotNull(), F.lit("near_dup_index"))
            .when(F.col("_bat").isNotNull(), F.lit("near_dup_batch"))
            .alias("reason"),
        )
        # one materialization: the append below and the caller's read
        # must see the SAME decisions, and the banded joins shouldn't
        # re-run per consumer
        .localCheckpoint(eager=False)
    )
    admitted = decisions.filter("admitted").select("asset_id", "kind", "fp")
    cat.append(
        namespace, table, admitted, batch_id=batch_id, writer_id=writer_id
    )
    return decisions


def delete_assets_from_media_fp_index(
    cat,
    namespace: str,
    deleted_asset_ids: DataFrame,
    table: str = DEFAULT_TABLE,
    mode: str = "cow",
) -> int:
    """Takedown leg for the fingerprint index: a perceptual hash is a
    derived artifact of the deleted bytes, so a right-to-be-forgotten
    cascade must drop it too (same reasoning as the retrieval postings
    and ANN codes legs).  ``deleted_asset_ids`` is one id column;
    deletion is bounds/Bloom-pruned like every cascade leg, and
    ``mode="mor"`` writes an equality-delete dir instead of rewriting.
    Returns rows removed.  The one-call cascade
    (`operators.takedown.takedown_docs` with ``media_fp_table=`` +
    ``deleted_asset_ids=``) runs the same leg inline, sharing the
    cascade's mode/scrub/reporting."""
    from .takedown import MAX_TAKEDOWN_IDS

    col = deleted_asset_ids.columns[0]
    rows = deleted_asset_ids.select(F.col(col).alias("asset_id")).distinct().limit(
        MAX_TAKEDOWN_IDS + 1
    ).collect()
    if len(rows) > MAX_TAKEDOWN_IDS:
        raise ValueError(
            f"delete_assets_from_media_fp_index: more than {MAX_TAKEDOWN_IDS} "
            "asset ids — a corpus-scale purge should be a rebuild, not a cascade"
        )
    ids = [r.asset_id for r in rows]
    if not ids or not cat.table_exists(namespace, table):
        return 0
    before = cat.current_snapshot(namespace, table).row_count
    if mode == "mor":
        after = cat.delete_where_mor(
            namespace, table, [("asset_id", "in", ids)],
            equality_cols=["asset_id"],
        )
    else:
        after = cat.delete_where(namespace, table, [("asset_id", "in", ids)])
    return before - after.row_count
