"""Persisted-inverted-index invariants: the index-consuming retrieval
operators must be BIT-IDENTICAL to their certified rescan twins —
including the full round trip of the index through lakehouse tables —
and the query-side postings read must push the term filter into the
scan (the serve-many contract: a query reads its own terms' rows, not
the corpus)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.operators import (
    corpus,
    retrieval,
    textops,
)
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import LakehouseCatalog
from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table

from .conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return table(spark, SF_SMALL, "documents")


@pytest.fixture(scope="module")
def frozen_index(spark, docs, tmp_path_factory):
    """The build-once artifact: index persisted to lakehouse tables and
    reloaded — every equality test runs against the FROZEN form, so the
    parquet round trip (array<int> positions included) is in scope."""
    cat = LakehouseCatalog(
        spark, str(tmp_path_factory.mktemp("wh")), name="idx"
    )
    retrieval.save_retrieval_index(
        cat, "db", "docs", retrieval.retrieval_index(docs)
    )
    return retrieval.load_retrieval_index(cat, "db", "docs")


def test_bm25_indexed_bit_equal_to_rescan(spark, docs, frozen_index):
    terms = ["dup", "hash", "join"]
    rescan = sorted(textops.bm25_search(docs, terms, top_k=25).collect())
    indexed = sorted(
        retrieval.bm25_search_indexed(frozen_index, terms, top_k=25).collect()
    )
    assert indexed == rescan
    assert len(indexed) > 0


def test_bm25_indexed_single_term_and_unmatched_term(spark, docs, frozen_index):
    """Term order 0 unmatched: the rescan folds +0.0 first; the indexed
    fold must reproduce that bit for bit.  'zzzznothing' matches no doc."""
    terms = ["zzzznothing", "join"]
    rescan = sorted(textops.bm25_search(docs, terms, top_k=10).collect())
    indexed = sorted(
        retrieval.bm25_search_indexed(frozen_index, terms, top_k=10).collect()
    )
    assert indexed == rescan


def test_phrase_indexed_bit_equal_to_rescan(spark, docs, frozen_index):
    phrase = ["customer", "join"]
    rescan = sorted(textops.phrase_search(docs, phrase).collect())
    indexed = sorted(
        retrieval.phrase_search_indexed(frozen_index, phrase).collect()
    )
    assert indexed == rescan
    assert len(indexed) > 0


def test_phrase_indexed_repeated_term(spark, docs, frozen_index):
    """A phrase with a repeated token exercises the distinct-pivot +
    per-occurrence shift path."""
    phrase = ["the", "the"]
    rescan = sorted(textops.phrase_search(docs, phrase).collect())
    indexed = sorted(
        retrieval.phrase_search_indexed(frozen_index, phrase).collect()
    )
    assert indexed == rescan


def test_conjunctive_indexed_bit_equal_to_rescan(spark, docs, frozen_index):
    terms = ["spark", "window", "join"]
    rescan = sorted(
        corpus.conjunctive_term_search(docs, terms).collect()
    )
    indexed = sorted(
        retrieval.conjunctive_term_search_indexed(frozen_index, terms).collect()
    )
    assert indexed == rescan
    assert len(indexed) > 0


def test_indexed_queries_push_term_filter_into_scan(spark, frozen_index):
    """The serve-many win: the postings scan must carry the term IN
    filter (PushedFilters), so a query reads O(sum df) rows, never the
    whole postings table."""
    for df in (
        retrieval.bm25_search_indexed(frozen_index, ["dup", "join"], top_k=5),
        retrieval.phrase_search_indexed(frozen_index, ["customer", "join"]),
        retrieval.conjunctive_term_search_indexed(frozen_index, ["spark"]),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "In(term" in plan or "EqualTo(term," in plan, plan


def test_doclens_covers_every_doc(spark, docs, frozen_index):
    assert frozen_index["doclens"].count() == docs.count()
    # empty/whitespace docs appear with dl=0 (BM25 avgdl parity needs them)
    nulls = frozen_index["doclens"].filter(F.col("dl").isNull()).count()
    assert nulls == 0


def test_index_validation(spark, docs, frozen_index):
    with pytest.raises(ValueError, match="query_terms is empty"):
        retrieval.bm25_search_indexed(frozen_index, [])
    with pytest.raises(ValueError, match="bad phrase"):
        retrieval.phrase_search_indexed(frozen_index, ["two words"])
    with pytest.raises(ValueError, match="terms is empty"):
        retrieval.conjunctive_term_search_indexed(frozen_index, [])
    with pytest.raises(ValueError, match="index missing"):
        retrieval.bm25_search_indexed(
            {"postings": frozen_index["postings"]}, ["a"]
        )
    with pytest.raises(ValueError, match="missing"):
        retrieval.save_retrieval_index(None, "db", "x", {})


def test_bm25_many_single_query_bit_equal_to_single_operator(spark, docs, frozen_index):
    """bm25_search_many with one query must reproduce bm25_search's
    (doc, n_matched, dl, score, rank) bit for bit — the batched fold's
    ascending-term order is the single operator's order, and dropped
    zero-tf terms contribute exactly +0.0 there."""
    terms = ["dup", "hash", "join"]
    single = sorted(
        (r.doc_id, r.n_matched, r.dl, r.score, r.rank)
        for r in textops.bm25_search(docs, terms, top_k=25).collect()
    )
    q = spark.createDataFrame([(7, t) for t in terms], "query_id int, term string")
    many = sorted(
        (r.doc_id, r.n_matched, r.dl, r.score, r.rank)
        for r in retrieval.bm25_search_many(
            frozen_index, q, top_k=25
        ).collect()
    )
    assert many == single and many


def test_bm25_many_isolates_queries_and_dedupes_terms(spark, docs, frozen_index):
    """Queries must not leak into each other's rankings, and duplicate
    (or case-colliding) terms within a query count once."""
    q = spark.createDataFrame(
        [(1, "dup"), (1, "DUP"), (1, "dup"), (2, "customer"), (2, "join")],
        "query_id int, term string",
    )
    out = retrieval.bm25_search_many(frozen_index, q, top_k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    dedup_single = {
        r.doc_id: r.score
        for r in textops.bm25_search(docs, ["dup"], top_k=5).collect()
    }
    assert {r.doc_id: r.score for r in by_q[1]} == dedup_single
    two_single = {
        r.doc_id: r.score
        for r in textops.bm25_search(docs, ["customer", "join"], top_k=5).collect()
    }
    assert {r.doc_id: r.score for r in by_q[2]} == two_single


def test_append_retrieval_index_equals_rebuild(spark, docs, tmp_path):
    """Incremental maintenance: save(index(corpus)) + append(batch) must
    equal a full rebuild over corpus+batch — as table multisets AND
    through a BM25 answer."""
    corpus_docs = docs.filter("doc_id % 5 <> 0")
    batch = docs.filter("doc_id % 5 = 0")
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="idx2")
    retrieval.save_retrieval_index(
        cat, "db", "docs", retrieval.retrieval_index(corpus_docs)
    )
    retrieval.append_retrieval_index(cat, "db", "docs", batch)
    incr = retrieval.load_retrieval_index(cat, "db", "docs")
    full = retrieval.retrieval_index(docs)
    for t in retrieval.INDEX_TABLES:
        assert sorted(map(tuple, incr[t].collect())) == sorted(
            map(tuple, full[t].collect())
        )
    terms = ["dup", "join"]
    assert sorted(retrieval.bm25_search_indexed(incr, terms, top_k=10).collect()) == \
        sorted(retrieval.bm25_search_indexed(full, terms, top_k=10).collect())


def test_compact_retrieval_index_lifecycle(spark, docs, tmp_path):
    """Index lifecycle: after N appended batches each table holds one
    data dir per batch; compact_retrieval_index folds every table to ONE
    dir, expires the per-batch snapshot history, preserves content
    bit-for-bit (a BM25 answer is unchanged), and a takedown's MoR
    delete dirs are materialized away — size O(corpus), never
    O(batches)."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"), name="idx3")
    retrieval.save_retrieval_index(
        cat, "db", "docs",
        retrieval.retrieval_index(docs.filter("doc_id % 4 = 0")),
    )
    for k in (1, 2, 3):  # three daily batches
        retrieval.append_retrieval_index(
            cat, "db", "docs", docs.filter(f"doc_id % 4 = {k}")
        )
    assert len(cat.current_snapshot("db", "docs_postings").data_dirs) == 4
    terms = ["dup", "join"]
    before = sorted(
        retrieval.bm25_search_indexed(
            retrieval.load_retrieval_index(cat, "db", "docs"), terms, top_k=10
        ).collect()
    )

    sizes = retrieval.compact_retrieval_index(cat, "db", "docs")

    for t in retrieval.INDEX_TABLES:
        assert len(cat.current_snapshot("db", f"docs_{t}").data_dirs) == 1, t
    # per-batch history expired: the create snapshot is gone (marked,
    # and its dirs reclaimed) — time travel to it raises clearly
    with pytest.raises(Exception, match="expired|not found|no snapshot"):
        cat.load("db", "docs_postings", snapshot_id=1).count()
    full = retrieval.retrieval_index(docs)
    assert sizes == {t: full[t].count() for t in retrieval.INDEX_TABLES}
    after = sorted(
        retrieval.bm25_search_indexed(
            retrieval.load_retrieval_index(cat, "db", "docs"), terms, top_k=10
        ).collect()
    )
    assert after == before
