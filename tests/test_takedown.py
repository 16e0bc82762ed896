"""Deletion/takedown cascade invariants: cascading a delete through
every persisted artifact must be BIT-EQUAL to rebuilding that artifact
from the remaining corpus (the discipline already pinned for the
append path), the frozen quality model must come through untouched,
and the one-call lakehouse takedown must be idempotent end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.operators import (
    corpus,
    retrieval,
    similarity,
    takedown,
)
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import LakehouseCatalog
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

from .conftest import SF_SMALL


def _assert_df_equal(a, b, what: str) -> None:
    assert a.exceptAll(b).count() == 0, f"{what}: cascade has extra rows"
    assert b.exceptAll(a).count() == 0, f"{what}: cascade lost rows"


@pytest.fixture(scope="module")
def corpus_docs(spark):
    body = " ".join(f"w{j}" for j in range(40))
    other = " ".join(f"q{j}" for j in range(40))
    return spark.createDataFrame(
        [
            (1, f"alpha corpus document {body}", "src0"),
            (3, f"bravo corpus document {other}", "src0"),
            (5, "short target note here", "src0"),
            (7, f"delta corpus document {body} extra", "src1"),
            (9, "tiny", "src1"),  # too short for shingles: no signatures
            (10, "held out benchmark text nothing shared", "src9"),
            (12, "second held out text nothing shared at all", "src9"),
        ],
        "doc_id long, text string, source string",
    )


def test_admission_state_cascade_equals_rebuild(spark, corpus_docs):
    """delete_docs_from_admission_state == admission_state(remaining)
    for fingerprints/signatures/consumed — including a FULLY deleted
    source (src9 leaves `consumed` entirely) — while nb_model/nb_tau
    stay the frozen originals."""
    tgt = F.col("source") == "src0"
    state = corpus.admission_state(corpus_docs, tgt, nb_top_frac=1.0)
    deleted = corpus_docs.filter(F.col("doc_id").isin(3, 9, 10, 12))
    remaining = corpus_docs.filter(~F.col("doc_id").isin(3, 9, 10, 12))

    out = takedown.delete_docs_from_admission_state(state, deleted)
    rebuilt = corpus.admission_state(remaining, tgt, nb_top_frac=1.0)

    for name in ("fingerprints", "signatures", "consumed"):
        _assert_df_equal(out[name], rebuilt[name], name)
    # src9 fully deleted: its consumed row is gone, like the rebuild's
    assert {r.source for r in out["consumed"].collect()} == {"src0", "src1"}
    # frozen: the model and operating points are the ORIGINAL frames
    assert out["nb_model"] is state["nb_model"]
    assert out["nb_tau"] is state["nb_tau"]


def test_retrieval_index_cascade_equals_rebuild(spark):
    docs = table(spark, SF_SMALL, "documents")
    deleted = docs.filter(F.col("doc_id") % 7 == 3)
    remaining = docs.filter(F.col("doc_id") % 7 != 3)

    out = takedown.delete_docs_from_retrieval_index(
        retrieval.retrieval_index(docs), deleted.select("doc_id")
    )
    rebuilt = retrieval.retrieval_index(remaining)
    for name in ("postings", "doclens"):
        _assert_df_equal(out[name], rebuilt[name], name)

    # retrieval answers on the cascaded index == answers on the rebuild
    q = ["the", "data", "of"]
    _assert_df_equal(
        retrieval.bm25_search_indexed(out, q, top_k=10),
        retrieval.bm25_search_indexed(rebuilt, q, top_k=10),
        "bm25_search_indexed",
    )


def test_ivf_index_cascade_equals_rebuild(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    cents = similarity.sample_centroids(emb, 4)
    deleted = emb.filter(F.col("vec_id") % 5 == 2).select("vec_id")
    remaining = emb.filter(F.col("vec_id") % 5 != 2)

    out = takedown.delete_docs_from_ivf_index(
        similarity.ivf_index(emb, cents), deleted
    )
    _assert_df_equal(out, similarity.ivf_index(remaining, cents), "emb_index")


def test_takedown_docs_lakehouse_cascade_and_idempotency(
    spark, corpus_docs, tmp_path
):
    """One-call lakehouse takedown: the corpus table, admission index
    (negative consumed delta through the append-only log) and retrieval
    index all cascade; the LOADED post-takedown state equals a rebuild
    from the remaining docs; re-running the same takedown (crash-replay)
    is a no-op; time travel to the pre-takedown snapshot still works."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="takedown")
    tgt = F.col("source") == "src0"
    from snowflake_iceberg_cld_bcdr_demo_spark.streaming import curation as C

    cat.create_table("db", "corpus", corpus_docs)
    C.save_admission_state(
        cat, "db", "adm", corpus.admission_state(corpus_docs, tgt, nb_top_frac=1.0)
    )
    retrieval.save_retrieval_index(
        cat, "db", "idx", retrieval.retrieval_index(corpus_docs)
    )

    deleted = corpus_docs.filter(F.col("doc_id").isin(3, 10))
    remaining = corpus_docs.filter(~F.col("doc_id").isin(3, 10))
    kw = dict(
        corpus_table="corpus",
        admission_prefix="adm",
        retrieval_prefix="idx",
        batch_id=0,
        writer_id="takedown-1",
    )
    removed = takedown.takedown_docs(cat, "db", deleted, **kw)
    assert removed["corpus"] == 2
    assert removed["adm_signatures"] == 8  # 2 docs x 4 bands
    assert removed["adm_fingerprints"] == 2
    assert removed["adm_consumed"] == 2  # negative delta rows (2 sources)

    # loaded post-takedown state == rebuild-on-remaining
    loaded = C.load_admission_state(cat, "db", "adm")
    rebuilt = corpus.admission_state(remaining, tgt, nb_top_frac=1.0)
    for name in ("fingerprints", "signatures", "consumed"):
        _assert_df_equal(loaded[name], rebuilt[name], name)
    idx = retrieval.load_retrieval_index(cat, "db", "idx")
    ridx = retrieval.retrieval_index(remaining)
    for name in ("postings", "doclens"):
        _assert_df_equal(idx[name], ridx[name], name)

    # idempotent: the replayed cascade deletes nothing and the guarded
    # consumed append no-ops (same batch_id + writer_id)
    replay = takedown.takedown_docs(cat, "db", deleted, **kw)
    assert all(v == 0 for v in replay.values()), replay
    _assert_df_equal(
        C.load_admission_state(cat, "db", "adm")["consumed"],
        rebuilt["consumed"],
        "consumed after replay",
    )

    # history preserved: the pre-takedown snapshot is still reachable
    snaps = cat.snapshots("db", "corpus")
    assert cat.load("db", "corpus", snapshot_id=snaps[0].snapshot_id).count() == 7


def test_takedown_delta_not_swallowed_by_stream_batches(
    spark, corpus_docs, tmp_path
):
    """r12 review: with writer_id=None the consumed delta's batch guard
    answered to ANY writer's batch numbers — a takedown with batch_id=0
    was silently skipped whenever some stream (scoped OR legacy
    unscoped) had committed a batch >= 0.  The takedown now scopes to
    its own default writer and opts out of the pre-scoping legacy
    guard, while staying idempotent against its OWN replays."""
    from snowflake_iceberg_cld_bcdr_demo_spark.streaming import curation as C

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="td_guard")
    cat.create_table("db", "corpus", corpus_docs)
    C.save_admission_state(
        cat, "db", "adm",
        corpus.admission_state(corpus_docs, F.lit(True), nb_top_frac=1.0),
    )
    extra = spark.createDataFrame(
        [("srcX", 7)], "source string, consumed long"
    )
    # a legacy UNSCOPED stream snapshot (batch 5, no writer) and a
    # scoped foreign stream snapshot (batch 9) both predate the takedown
    cat.append("db", "adm_consumed", extra, batch_id=5)
    cat.append("db", "adm_consumed", extra, batch_id=9, writer_id="streamA")
    doc3 = corpus_docs.filter(F.col("doc_id") == 3)
    removed = takedown.takedown_docs(
        cat, "db", doc3,
        corpus_table="corpus", admission_prefix="adm", batch_id=0,
    )
    # the delta LANDED despite batch 0 < 5 and < 9 (1 source touched)
    assert removed["adm_consumed"] == 1
    head = cat.current_snapshot("db", "adm_consumed").snapshot_id
    # the takedown's own replay with the same batch_id still no-ops
    replay = takedown.takedown_docs(
        cat, "db", doc3,
        corpus_table="corpus", admission_prefix="adm", batch_id=0,
    )
    assert replay["adm_consumed"] == 0
    assert cat.current_snapshot("db", "adm_consumed").snapshot_id == head


def test_admission_cascade_zero_token_source_with_surviving_sources(
    spark,
):
    """The documented consumed>0 edge: a source whose surviving docs
    total zero BPE tokens.  Passing surviving_sources makes the cascade
    bit-equal to the rebuild (the (source, 0) row is kept); without it
    the heuristic drops the row (the documented exception)."""
    docs = spark.createDataFrame(
        [
            (1, "real document with plenty of words here", "srcA"),
            (2, "", "srcA"),  # zero-token survivor
            (3, "another live doc", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    tgt = F.col("source") == "srcB"
    state = corpus.admission_state(docs, tgt, nb_top_frac=1.0)
    deleted = docs.filter(F.col("doc_id") == 1)
    remaining = docs.filter(F.col("doc_id") != 1)
    rebuilt = corpus.admission_state(remaining, tgt, nb_top_frac=1.0)

    exact = takedown.delete_docs_from_admission_state(
        state, deleted,
        surviving_sources=remaining.select("source").distinct(),
    )
    _assert_df_equal(exact["consumed"], rebuilt["consumed"], "consumed")
    assert {
        (r.source, r.consumed) for r in exact["consumed"].collect()
    } >= {("srcA", 0)}

    heuristic = takedown.delete_docs_from_admission_state(state, deleted)
    assert {r.source for r in heuristic["consumed"].collect()} == {"srcB"}


def test_takedown_bounded_collect(spark, corpus_docs, monkeypatch):
    monkeypatch.setattr(takedown, "MAX_TAKEDOWN_IDS", 1)
    with pytest.raises(ValueError, match="more than 1 doc ids"):
        takedown.takedown_docs(
            None, "db", corpus_docs, corpus_table="corpus"
        )


def test_takedown_anti_joins_broadcast_deleted_side(spark):
    """Scale shape: the cascade's anti-joins must broadcast the
    (human-scale) takedown batch — a shuffled anti-join would reshuffle
    the full artifact for a handful of deleted ids."""
    docs = table(spark, SF_SMALL, "documents")
    out = takedown.delete_docs_from_retrieval_index(
        retrieval.retrieval_index(docs),
        docs.filter(F.col("doc_id") % 7 == 3).select("doc_id"),
    )
    plan = out["postings"]._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin LeftAnti" not in plan


def test_takedown_ann_codes_table(spark, tmp_path):
    """Takedown through the IVF-PQ serving layout: deleted vectors leave
    the partition-pruned codes table (per-vector rows under the FROZEN
    model — the row delete IS the rebuild, like ivf_index), the model
    stays, and a served query no longer returns them."""
    from snowflake_iceberg_cld_bcdr_demo_spark.functions.vectors import l2_normalize

    emb = table(spark, SF_SMALL, "embeddings")
    unit = emb.select(
        "vec_id", l2_normalize(F.col("embedding")).alias("embedding"), "label"
    )
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="td_ann")
    similarity.build_ivfpq_index(cat, "ann", unit, n_cells=4, m=8, k=16)
    n_before = cat.current_snapshot("ann", "ann_codes").row_count
    model_before = sorted(map(tuple, cat.load("ann", "ann_model").collect()))

    # the pre-takedown top-10 from vec 0 — delete its top hit
    served = similarity.ivfpq_query_index(
        cat, "ann", unit, query_vec_id=0, k=10, nprobe=4
    ).collect()
    victim = served[0].vec_id
    deleted_docs = spark.createDataFrame(
        [(victim, "", "s")], "doc_id long, text string, source string"
    )
    removed = takedown.takedown_docs(
        cat, "ann", deleted_docs,
        ann_codes_table="ann_codes",
        emb_index_ids=spark.createDataFrame([(victim,)], "vec_id long"),
    )
    assert removed["ann_codes"] == 1
    assert cat.current_snapshot("ann", "ann_codes").row_count == n_before - 1
    assert cat.load("ann", "ann_codes").filter(
        F.col("vec_id") == victim
    ).count() == 0
    # model frozen
    assert sorted(map(tuple, cat.load("ann", "ann_model").collect())) == model_before
    # the served answer no longer contains the deleted vector
    after = similarity.ivfpq_query_index(
        cat, "ann", unit, query_vec_id=0, k=10, nprobe=4
    ).collect()
    assert victim not in {r.vec_id for r in after}


def test_takedown_enables_readmission(spark, corpus_docs, tmp_path):
    """The right-to-be-forgotten semantics end to end: while a doc is in
    the corpus its resubmission is rejected by the exact gate; after
    takedown_docs its fingerprint has left the admission index, so the
    SAME text is admissible again — forgetting really forgets."""
    from snowflake_iceberg_cld_bcdr_demo_spark.streaming import curation as C

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="td_readmit")
    cat.create_table("db", "corpus", corpus_docs)
    C.save_admission_state(
        cat, "db", "adm",
        corpus.admission_state(corpus_docs, F.lit(True), nb_top_frac=1.0),
    )
    doc3 = corpus_docs.filter(F.col("doc_id") == 3)
    resubmit = doc3.select(
        F.lit(300).cast("long").alias("doc_id"), "text", "source"
    )
    kw = dict(token_budget=100_000, shares={"src0": 1.0}, nb_top_frac=1.0)

    def decide():
        return {
            r.doc_id: r
            for r in corpus.curated_incremental_admit(
                resubmit, None, F.lit(True),
                state=C.load_admission_state(cat, "db", "adm"), **kw
            ).collect()
        }

    before = decide()
    assert not before[300].e_keep  # exact dup of the live doc 3

    takedown.takedown_docs(
        cat, "db", doc3,
        corpus_table="corpus", admission_prefix="adm",
        batch_id=0, writer_id="td",
    )
    after = decide()
    assert after[300].e_keep and after[300].admitted


def test_takedown_docs_mor_mode(spark, corpus_docs, tmp_path):
    """mode="mor": the cascade commits equality-delete dirs instead of
    rewriting data dirs — O(matched keys) write cost, reads correct
    immediately, original data dirs untouched until compaction
    materializes the deletes."""
    from snowflake_iceberg_cld_bcdr_demo_spark.streaming import curation as C

    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="td_mor")
    cat.create_table("db", "corpus", corpus_docs)
    C.save_admission_state(
        cat, "db", "adm",
        corpus.admission_state(corpus_docs, F.lit(True), nb_top_frac=1.0),
    )
    dirs_before = cat.current_snapshot("db", "corpus").data_dirs

    deleted = corpus_docs.filter(F.col("doc_id").isin(3, 10))
    remaining = corpus_docs.filter(~F.col("doc_id").isin(3, 10))
    removed = takedown.takedown_docs(
        cat, "db", deleted,
        corpus_table="corpus", admission_prefix="adm",
        batch_id=0, writer_id="td-mor", mode="mor",
    )
    assert removed["corpus"] == 2 and removed["adm_fingerprints"] == 2

    # reads are correct immediately, with the ORIGINAL data dirs intact
    assert {r.doc_id for r in cat.load("db", "corpus").collect()} == {
        r.doc_id for r in remaining.collect()
    }
    assert cat.current_snapshot("db", "corpus").data_dirs == dirs_before
    rebuilt = corpus.admission_state(remaining, F.lit(True), nb_top_frac=1.0)
    _assert_df_equal(
        C.load_admission_state(cat, "db", "adm")["fingerprints"],
        rebuilt["fingerprints"],
        "fingerprints (mor)",
    )

    # compaction materializes the equality deletes
    cat.compact("db", "corpus")
    assert cat.load("db", "corpus").count() == 5

    with pytest.raises(ValueError, match="mode must be"):
        takedown.takedown_docs(cat, "db", deleted, mode="bogus")


def test_takedown_scrub_makes_bytes_unreachable(spark, corpus_docs, tmp_path):
    """scrub=True: after the cascade, the touched tables compact and
    expire to the post-takedown head — time travel to the pre-takedown
    snapshot raises (the deleted rows' bytes are reclaimed), while the
    logical contents stay exactly the post-takedown state."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="td_scrub")
    cat.create_table("db", "corpus", corpus_docs)
    retrieval.save_retrieval_index(
        cat, "db", "idx", retrieval.retrieval_index(corpus_docs)
    )
    pre = cat.current_snapshot("db", "corpus").snapshot_id

    deleted = corpus_docs.filter(F.col("doc_id").isin(3, 10))
    takedown.takedown_docs(
        cat, "db", deleted,
        corpus_table="corpus", retrieval_prefix="idx", scrub=True,
    )
    assert cat.load("db", "corpus").count() == 5
    with pytest.raises(Exception, match="expired|not found|no snapshot"):
        cat.load("db", "corpus", snapshot_id=pre).count()
    # the index scrubbed too, and still serves correctly
    remaining = corpus_docs.filter(~F.col("doc_id").isin(3, 10))
    _assert_df_equal(
        retrieval.load_retrieval_index(cat, "db", "idx")["doclens"],
        retrieval.retrieval_index(remaining)["doclens"],
        "doclens after scrub",
    )
