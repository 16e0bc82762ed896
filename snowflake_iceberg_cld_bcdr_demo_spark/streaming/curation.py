"""Streaming curated admission: the full curation gate set as a
continuous ingest.

`streaming.events.stream_content_admit` is the exact-dedup-only
admission stream; THIS module productionizes the complete
:func:`operators.corpus.curated_incremental_admit` discipline — exact +
near-dup vs the corpus, frozen NB quality model at its frozen operating
point, remaining mixture budget, stateless scrub — against the PERSISTED
admission index (:func:`operators.corpus.admission_state`), so no
micro-batch ever rescans the corpus.  The reference's own lifecycle is
the batch form of this loop (append → sync → validate,
`/root/reference/scripts/05_append_campaigns.py:112-123` →
`16_sync_task_primary.sql`); Structured Streaming's checkpointing gives
the non-overlap + exactly-once progress its task scheduler provides.

State layout (all lakehouse tables under one prefix):

- ``{prefix}_fingerprints`` / ``{prefix}_signatures`` — INCREMENTAL:
  each batch appends its admitted docs' fingerprints and banded MinHash
  signatures, so batch N+1's gates see batch N's admissions,
- ``{prefix}_consumed`` — an append-only per-source token-delta LOG,
  aggregated to totals at load time: `LakehouseCatalog.append`'s
  ``batch_id`` idempotency then covers crash-replay for free, which an
  in-place merge of running totals would not (a replayed merge
  double-counts),
- ``{prefix}_nb_model`` / ``{prefix}_nb_tau`` — FROZEN: the quality
  model and its per-source operating points never move inside the
  stream; retrain offline and :func:`save_admission_state` to rotate.

Every per-batch append shares the micro-batch id, so a restart between
append and checkpoint replays into no-ops on every table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint
from ..operators import corpus as corpus_ops
from ..operators.dedup import _banded_signatures
from ..sources.lakehouse import LakehouseCatalog

STATE_TABLES = ("fingerprints", "signatures", "consumed", "nb_model", "nb_tau")


def save_admission_state(
    catalog: LakehouseCatalog,
    namespace: str,
    prefix: str,
    state: dict[str, DataFrame],
) -> None:
    """Persist an :func:`operators.corpus.admission_state` dict as five
    lakehouse tables under ``prefix`` (snapshotted, time-travelable —
    the admission index is itself BCDR-managed state)."""
    missing = set(STATE_TABLES) - set(state)
    if missing:
        raise ValueError(f"save_admission_state: missing {sorted(missing)}")
    # the optional sixth table (the frozen IVF embedding index) persists
    # alongside the core five when present
    for name in state:
        catalog.create_table(namespace, f"{prefix}_{name}", state[name])


def load_admission_state(
    catalog: LakehouseCatalog, namespace: str, prefix: str
) -> dict[str, DataFrame]:
    """Reload the admission index.  ``consumed`` is stored as an
    append-only delta log; it aggregates back to per-source totals here
    (sources are few — this is a tiny map-side groupBy)."""
    state = {
        name: catalog.load(namespace, f"{prefix}_{name}")
        for name in STATE_TABLES
    }
    if catalog.table_exists(namespace, f"{prefix}_emb_index"):
        state["emb_index"] = catalog.load(namespace, f"{prefix}_emb_index")
    state["consumed"] = (
        state["consumed"]
        .groupBy("source")
        .agg(F.sum("consumed").alias("consumed"))
    )
    return state


def stream_curated_admission(
    docs_stream: DataFrame,
    catalog: LakehouseCatalog,
    namespace: str,
    corpus_table: str,
    state_prefix: str,
    checkpoint_dir: str,
    token_budget: int,
    shares: dict[str, float],
    nd_threshold: float = 0.5,
    blocklist: list[str] | None = None,
    blocklist_max_hits: int = 2,
    boiler_grams: DataFrame | None = None,
    es_windows: DataFrame | None = None,
    available_now: bool = True,
):
    """Run the full curated-admission gate set over a document stream.

    Each micro-batch: (1) reload the admission index (fingerprints and
    signatures grow as earlier batches admit; model/tau stay frozen),
    (2) gate the batch with ``curated_incremental_admit(state=...,
    existing_docs=None)`` — the corpus itself is NEVER read, (3) append
    the admitted docs (scrubbed text — the shipped-text contract) to the
    corpus table, (4) append their fingerprints + banded signatures and
    the per-source token deltas to the state tables.  All four appends
    carry the micro-batch id → idempotent under restart-replay.

    Scale: per batch the corpus-sized inputs are the state tables only
    — fingerprint anti-join on 32-byte keys, signature probe with the
    BATCH side broadcast, a one-row model and a per-source tau/consumed
    map; nothing corpus-sized shuffles, nothing batch-sized rescans.

    Returns the started StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = load_admission_state(catalog, namespace, state_prefix)
        trail = corpus_ops.curated_incremental_admit(
            batch_df,
            None,
            None,  # nb_target unused: the model and tau come frozen
            token_budget,
            shares,
            nd_threshold=nd_threshold,
            blocklist=blocklist,
            blocklist_max_hits=blocklist_max_hits,
            boiler_grams=boiler_grams,
            es_windows=es_windows,
            state=state,
            include_text=True,
        )
        admitted = (
            trail.filter("admitted")
            .select("doc_id", "source", "text", "n_mix_tokens")
            # the decision trail feeds four sinks: evaluate the gates
            # once, not once per append
            .localCheckpoint()
        )
        if admitted.isEmpty():
            return
        docs = admitted.select("doc_id", "source", "text")
        if catalog.table_exists(namespace, corpus_table):
            catalog.append(namespace, corpus_table, docs, batch_id=batch_id)
        else:
            catalog.create_table(namespace, corpus_table, docs, batch_id=batch_id)
        catalog.append(
            namespace,
            f"{state_prefix}_fingerprints",
            docs.select(fingerprint(F.col("text")).alias("fingerprint")),
            batch_id=batch_id,
        )
        catalog.append(
            namespace,
            f"{state_prefix}_signatures",
            _banded_signatures(docs, "text", "doc_id"),
            batch_id=batch_id,
        )
        catalog.append(
            namespace,
            f"{state_prefix}_consumed",
            admitted.groupBy("source").agg(
                F.sum("n_mix_tokens").alias("consumed")
            ),
            batch_id=batch_id,
        )

    writer = (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_consumed_log(
    catalog: LakehouseCatalog, namespace: str, prefix: str
) -> None:
    """Offline maintenance for the consumed delta log: rewrite it as one
    row per source (the aggregated totals).  Semantics are unchanged —
    :func:`load_admission_state` aggregates either way — this just stops
    the log growing one row per source per batch forever.  Run it
    BETWEEN stream runs (compaction is a replace snapshot; a stream
    crash-replaying a batch from before the compaction would no longer
    find its batch_id guard), e.g. from the same maintenance window as
    `jobs.cleanup.table_maintenance`."""
    t = f"{prefix}_consumed"
    totals = (
        catalog.load(namespace, t)
        .groupBy("source")
        .agg(F.sum("consumed").alias("consumed"))
    )
    catalog.merge_upsert(namespace, t, totals, ["source"])
