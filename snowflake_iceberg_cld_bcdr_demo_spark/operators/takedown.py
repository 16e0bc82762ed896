"""Deletion / takedown propagation through PERSISTED pipeline state.

A production LLM-data pipeline must honor opt-out and
right-to-be-forgotten requests, and "delete the rows from the corpus
table" is not enough: the corpus ships with derived, persisted state —
the admission index (:func:`.corpus.admission_state`), the retrieval
index (:func:`.retrieval.retrieval_index`), the frozen IVF embedding
index (:func:`.similarity.ivf_index`) — and a document whose
fingerprint, signatures, postings or embedding survive in those
artifacts keeps influencing admission decisions and keeps being
retrievable long after its corpus row is gone.

This module CASCADES a delete through every artifact, with the same
discipline the incremental-append path proved (`append_retrieval_index`,
`admission_state` — both pytest-pinned bit-equal to a rebuild): the
cascaded state is BIT-EQUAL to rebuilding the artifact from the
remaining corpus, per artifact:

- ``fingerprints`` — the deleted docs' canonical-md5 fingerprints
  leave the membership set.  Exact-equal to a rebuild because a
  CURATED corpus holds at most one document per fingerprint (the
  exact-dedup admission gate enforces it), so a deleted fingerprint
  never has a surviving owner,
- ``signatures`` — banded MinHash rows are per ``doc_id``; an
  anti-join IS the rebuild (row content depends only on the doc's own
  text),
- ``consumed`` — per-source token totals drop by the deleted docs'
  BPE piece counts (exact long arithmetic; sources whose total reaches
  0 leave the table, matching a rebuild in which the source has no
  remaining docs).  The LAKEHOUSE path appends a NEGATIVE delta to the
  append-only consumed log instead of rewriting it, so the takedown
  rides the same batch-id idempotent, crash-replay-safe commit
  machinery as the streaming admitter,
- ``nb_model`` / ``nb_tau`` — FROZEN, deliberately untouched: the
  quality model and its operating points are corpus-ship-time
  artifacts (rotating them is an offline retrain +
  :func:`..streaming.curation.save_admission_state`), and a takedown
  must not silently move every future batch's quality bar,
- ``postings`` / ``doclens`` — per ``(term, doc_id)`` / per ``doc_id``
  rows; anti-joins are the rebuild.  BM25's corpus statistics (N,
  avgdl) derive from ``doclens`` at query time, so they follow
  automatically,
- ``emb_index`` — per ``eval_id`` rows under a frozen centroid
  codebook; an anti-join is the rebuild,
- ``ann_codes`` — the IVF-PQ serving table
  (:func:`.similarity.build_ivfpq_index`): per-vector code rows under
  the frozen ``ann_model`` (centroids + codebooks stay, exactly like
  ``nb_model`` — a takedown doesn't retrain), so the row delete is the
  rebuild and served queries stop returning the vector immediately.

Scale: every cascade step is O(|deleted| + touched partitions), never
O(corpus) — anti-joins broadcast the (human-scale) takedown batch, and
the lakehouse path uses ``delete_where``'s bounds-pruned copy-on-write
(untouched data dirs carry by manifest reference).  The lakehouse
cascade is IDEMPOTENT end to end (re-deleting absent rows no-ops; the
consumed delta is batch-id guarded), so a takedown job that crashes
mid-cascade is safely re-run.

Reference parity note: the reference demo has no deletion path at all
(its lifecycle is append → sync → validate,
`/root/reference/scripts/05_append_campaigns.py:112-123`); this module
is part of the beyond-reference LLM-pipeline surface the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import bpe_piece_count, fingerprint

#: hard ceiling on the driver-side id collect in :func:`takedown_docs`
#: — takedown batches are human-scale (opt-out requests); a "delete
#: half the corpus" request should be a rebuild, not a cascade
MAX_TAKEDOWN_IDS = 1_000_000


def _norm_deleted(
    deleted_docs: DataFrame, text_col: str, id_col: str, group_col: str | None
) -> DataFrame:
    cols = [F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")]
    if group_col is not None:
        cols.insert(1, F.col(group_col).alias("source"))
    return deleted_docs.select(*cols)


def delete_docs_from_admission_state(
    state: dict[str, DataFrame],
    deleted_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    deleted_emb_ids: DataFrame | None = None,
    surviving_sources: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Cascade a takedown through an in-memory / loaded admission-state
    dict; returns a NEW dict (inputs untouched).  ``deleted_docs`` must
    carry the docs' text and source (the fingerprints and consumed
    adjustments derive from them — the state tables don't store text).
    ``deleted_emb_ids`` (one ``eval_id``-compatible id column) cascades
    the optional frozen IVF embedding index when present.

    Equality contract (pytest-pinned): ``fingerprints``/``signatures``/
    ``consumed`` come out bit-equal to
    :func:`.corpus.admission_state`-on-remaining-docs; ``nb_model`` /
    ``nb_tau`` are returned UNCHANGED (frozen — see module doc).

    One documented edge: without ``surviving_sources``, a source is
    dropped from ``consumed`` when its adjusted total reaches 0 — which
    also drops a source that still has surviving docs whose BPE tokens
    total zero, where the rebuild keeps a ``(source, 0)`` row.  Pass
    ``surviving_sources`` (one source column — e.g. the distinct
    sources of the post-delete corpus, a broadcast-sized frame) to make
    the equality exact in that edge: consumed then keeps precisely the
    surviving sources, zero totals included."""
    d = _norm_deleted(deleted_docs, text_col, id_col, group_col)
    del_fp = d.select(fingerprint(F.col("text")).alias("fingerprint")).distinct()
    del_ids = d.select("doc_id").distinct()
    del_consumed = d.groupBy("source").agg(
        F.sum(bpe_piece_count(F.col("text")).cast("long")).alias("_minus")
    )
    out = dict(state)
    out["fingerprints"] = (
        state["fingerprints"]
        .join(F.broadcast(del_fp), "fingerprint", "left_anti")
        .select(*state["fingerprints"].columns)
    )
    out["signatures"] = (
        state["signatures"]
        .join(F.broadcast(del_ids), "doc_id", "left_anti")
        .select(*state["signatures"].columns)
    )
    adjusted = (
        state["consumed"]
        .join(F.broadcast(del_consumed), "source", "left")
        .select(
            "source",
            (F.col("consumed") - F.coalesce(F.col("_minus"), F.lit(0))).alias(
                "consumed"
            ),
        )
    )
    if surviving_sources is not None:
        # exact rebuild semantics: keep precisely the sources that still
        # have docs, zero-token totals included
        surv = surviving_sources.select(
            F.col(surviving_sources.columns[0]).alias("source")
        ).distinct()
        out["consumed"] = adjusted.join(F.broadcast(surv), "source", "left_semi")
    else:
        # heuristic: total 0 = source fully deleted (see docstring edge)
        out["consumed"] = adjusted.filter(F.col("consumed") > 0)
    if deleted_emb_ids is not None and "emb_index" in state:
        eid = deleted_emb_ids.columns[0]
        out["emb_index"] = (
            state["emb_index"]
            .join(
                F.broadcast(deleted_emb_ids.select(F.col(eid).alias("eval_id"))),
                "eval_id",
                "left_anti",
            )
            .select(*state["emb_index"].columns)
        )
    return out


def delete_docs_from_retrieval_index(
    index: dict[str, DataFrame],
    deleted_ids: DataFrame,
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """Cascade a takedown through a retrieval-index dict: postings and
    doclens rows are per-document, so anti-joins ARE the rebuild
    (pytest-pinned bit-equality).  BM25's N/avgdl derive from doclens
    at query time and follow automatically."""
    ids = deleted_ids.select(F.col(id_col).alias("doc_id")).distinct()
    return {
        # reselect the original column order: a USING-key join hoists
        # the key column first, and downstream positional comparisons
        # (exceptAll, parquet appends) need the build-time layout
        name: index[name]
        .join(F.broadcast(ids), "doc_id", "left_anti")
        .select(*index[name].columns)
        for name in ("postings", "doclens")
    }


def delete_docs_from_ivf_index(
    index: DataFrame, deleted_ids: DataFrame, id_col: str = "eval_id"
) -> DataFrame:
    """Cascade a takedown through a frozen IVF embedding index
    (:func:`.similarity.ivf_index` layout — per-vector rows under a
    frozen centroid codebook): the anti-join is the rebuild."""
    ids = deleted_ids.select(F.col(deleted_ids.columns[0]).alias(id_col)).distinct()
    return index.join(F.broadcast(ids), id_col, "left_anti").select(*index.columns)


def _collect_values(df: DataFrame, what: str) -> list:
    rows = df.limit(MAX_TAKEDOWN_IDS + 1).collect()
    if len(rows) > MAX_TAKEDOWN_IDS:
        raise ValueError(
            f"takedown_docs: more than {MAX_TAKEDOWN_IDS} {what} — a "
            "corpus-scale delete should rebuild the artifacts, not cascade"
        )
    return [r[0] for r in rows]


def takedown_docs(
    catalog,
    namespace: str,
    deleted_docs: DataFrame,
    *,
    corpus_table: str | None = None,
    admission_prefix: str | None = None,
    retrieval_prefix: str | None = None,
    emb_index_ids: DataFrame | None = None,
    ann_codes_table: str | None = None,
    media_fp_table: str | None = None,
    deleted_asset_ids: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    batch_id: int | None = None,
    writer_id: str | None = None,
    mode: str = "cow",
    scrub: bool = False,
) -> dict[str, int]:
    """One-call lakehouse takedown: cascade ``deleted_docs`` through the
    corpus table and every registered persisted artifact — admission
    index, retrieval index, frozen embedding index, ANN codes, and (via
    ``media_fp_table`` + ``deleted_asset_ids``) the persisted media
    fingerprint index.  Returns per-table rows removed (the consumed
    log reports the negative delta rows APPENDED — it is a log, not a
    membership table).

    Every step is idempotent: ``delete_where`` on absent rows is a
    metadata no-op and the consumed delta append takes the standard
    ``batch_id``/``writer_id`` guard, so a crash mid-cascade is handled
    by re-running the whole call.  Deletes are copy-on-write snapshots —
    history (and time travel to the PRE-takedown snapshot) is preserved
    until ``expire_snapshots``; run it after a takedown when the point
    is to make the bytes unreachable.

    ``mode="mor"`` switches every row delete to merge-on-read equality
    deletes (:meth:`~..sources.lakehouse.LakehouseCatalog
    .delete_where_mor`): the commit writes only the matched key tuples
    as a delete dir and readers anti-join it — O(matched keys) write
    cost per takedown instead of a partition rewrite, the right shape
    for a TRICKLE of opt-out requests against a 100 TB corpus.  Reads
    stay correct immediately; run the table compaction
    (:meth:`compact` / :func:`.retrieval.compact_retrieval_index`) on
    the usual maintenance cadence to materialize the deletes, and note
    the BYTES remain until that compaction + snapshot expiry (MoR
    defers the physical scrub — "cow" is the choice when the point is
    immediate unreachability).

    ``scrub=True`` finishes the legal-erasure story in the same call:
    every table the cascade touched is compacted (materializing MoR
    delete dirs) and its snapshot history expired to the post-takedown
    head, so the deleted rows' BYTES become unreachable — no time
    travel to the pre-takedown state remains.  Incompatible with
    streams that might crash-replay a pre-takedown batch against those
    tables (the same caveat as all lakehouse maintenance: run between
    stream runs).

    Scale: the id/fingerprint collects are bounded
    (:data:`MAX_TAKEDOWN_IDS`); each ``delete_where`` rewrites only data
    dirs whose column bounds admit a match (Bloom/minmax-pruned), so a
    takedown touches O(batch) state, never O(corpus)."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"takedown_docs: mode must be 'cow' or 'mor', got {mode!r}")
    d = _norm_deleted(deleted_docs, text_col, id_col, group_col)
    ids = _collect_values(d.select("doc_id").distinct(), "doc ids")
    removed: dict[str, int] = {}

    def _delete(table: str, col: str, values: list) -> None:
        if not values or not catalog.table_exists(namespace, table):
            return
        before = catalog.current_snapshot(namespace, table).row_count
        if mode == "mor":
            # equality-delete dir keyed on the delete column: O(matched
            # keys) written, no data-dir rewrite; row_count reflects the
            # logical table either way
            after = catalog.delete_where_mor(
                namespace, table, [(col, "in", values)], equality_cols=[col]
            )
        else:
            after = catalog.delete_where(namespace, table, [(col, "in", values)])
        removed[table] = before - after.row_count

    if corpus_table is not None:
        _delete(corpus_table, id_col, ids)
    if admission_prefix is not None:
        fps = _collect_values(
            d.select(fingerprint(F.col("text")).alias("fp")).distinct(),
            "fingerprints",
        )
        _delete(f"{admission_prefix}_fingerprints", "fingerprint", fps)
        _delete(f"{admission_prefix}_signatures", "doc_id", ids)
        neg = d.groupBy("source").agg(
            (-F.sum(bpe_piece_count(F.col("text")).cast("long"))).alias("consumed")
        ).filter(F.col("consumed") < 0)
        if not neg.isEmpty():
            t = f"{admission_prefix}_consumed"
            before = catalog.current_snapshot(namespace, t).snapshot_id
            snap = catalog.append(
                namespace, t, neg,
                batch_id=batch_id,
                # takedowns get their OWN writer scope by default (r12
                # review: writer_id=None made the delta's batch guard
                # answer to ANY stream's batch numbers — a takedown with
                # batch_id n silently skipped whenever some stream had
                # committed batch >= n), and opt out of the pre-scoping
                # legacy guard: takedown deltas postdate writer scoping,
                # so an unscoped snapshot can never be a takedown replay.
                writer_id=writer_id if writer_id is not None else "takedown",
                legacy_batch_guard=False,
            )
            # a batch_id-guarded replay no-ops (same snapshot back):
            # report 0 delta rows so the caller sees the idempotent skip
            removed[t] = 0 if snap.snapshot_id == before else neg.count()
    if retrieval_prefix is not None:
        _delete(f"{retrieval_prefix}_postings", "doc_id", ids)
        _delete(f"{retrieval_prefix}_doclens", "doc_id", ids)
    if emb_index_ids is not None and (
        admission_prefix is not None or ann_codes_table is not None
    ):
        eids = _collect_values(
            emb_index_ids.select(emb_index_ids.columns[0]).distinct(),
            "embedding ids",
        )
        if admission_prefix is not None:
            _delete(f"{admission_prefix}_emb_index", "eval_id", eids)
        if ann_codes_table is not None:
            # the IVF-PQ serving layout (`similarity.build_ivfpq_index`):
            # codes are per-vector rows under a FROZEN model (centroids +
            # codebooks stay, like nb_model — deleting vectors doesn't
            # retrain the codebook), so the row delete IS the rebuild
            _delete(ann_codes_table, "vec_id", eids)
    if media_fp_table is not None and deleted_asset_ids is not None:
        # perceptual fingerprints are derived artifacts of the deleted
        # bytes — same reasoning as postings/codes; per-asset rows, so
        # the row delete IS the rebuild
        aid = deleted_asset_ids.columns[0]
        aids = _collect_values(
            deleted_asset_ids.select(F.col(aid).alias("asset_id")).distinct(),
            "asset ids",
        )
        _delete(media_fp_table, "asset_id", aids)
    if scrub:
        # physical erasure: rewrite each touched table without the
        # deleted rows (materializes MoR delete dirs too) and drop the
        # pre-takedown snapshot history so its data dirs are reclaimed
        for t in removed:
            if t.endswith("_consumed"):
                continue  # a delta log — nothing deleted, nothing to scrub
            catalog.compact(namespace, t)
            catalog.expire_snapshots(namespace, t, keep_last=1)
    return removed
