"""Property-based defense of the pipeline-operator invariants: the
guarantees the 100 TB design arguments rest on, checked over arbitrary
inputs rather than hand-picked fixtures.

- winnowing: ANY shared run >= k + window - 1 chars yields a shared
  fingerprint (the MOSS certainty guarantee — not probabilistic);
- hash_split: a document's split never changes when the corpus around
  it changes (pure function of seed+id — the no-leakage property);
- BPE: the driver-memory trainer is bit-identical to the per-merge-job
  distributed trainer on arbitrary corpora;
- MinHash: the shuffle-free row-local fold equals the explode+groupBy
  matrix on arbitrary text;
- source_quota: every stratum keeps exactly min(quota, stratum size).

Example counts are small (each example runs Spark jobs); the properties
still cover far more shapes than fixture tests."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

word = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
sentence = st.lists(word, min_size=3, max_size=25).map(" ".join)


@pytest.fixture(scope="module")
def sparkm(spark):
    return spark


@settings(**SET)
@given(
    prefix=sentence,
    shared=st.lists(word, min_size=8, max_size=14).map(" ".join),
    suffix=sentence,
    other=sentence,
)
def test_winnowing_certainty_property(sparkm, prefix, shared, suffix, other):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import dedup

    k, w = 16, 8
    if len(shared) < k + w - 1:
        return  # guarantee only applies to runs >= k+w-1
    docs = sparkm.createDataFrame(
        [
            (1, prefix + " " + shared + " " + suffix),
            (2, other + " " + shared + " " + other),
        ],
        "doc_id long, text string",
    )
    fp = dedup.winnow_fingerprints(docs, k=k, window=w)
    by_doc = {
        r.doc_id: set(r.fps)
        for r in fp.groupBy("doc_id")
        .agg(F.collect_set("fingerprint").alias("fps"))
        .collect()
    }
    assert by_doc.get(1, set()) & by_doc.get(2, set()), (
        f"shared run of {len(shared)} chars produced no common fingerprint"
    )


@settings(**SET)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40, unique=True
    ),
    extra=st.lists(
        st.integers(min_value=10**9 + 1, max_value=2 * 10**9),
        min_size=0,
        max_size=40,
        unique=True,
    ),
)
def test_hash_split_stable_under_corpus_growth(sparkm, ids, extra):
    """A doc's split assignment must not move when other docs arrive —
    the property that keeps eval sets leak-free as the corpus grows."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import corpus

    small = sparkm.createDataFrame([(i,) for i in ids], "doc_id long")
    big = sparkm.createDataFrame([(i,) for i in ids + extra], "doc_id long")
    s1 = {r.doc_id: r.split for r in corpus.hash_split(small).collect()}
    s2 = {r.doc_id: r.split for r in corpus.hash_split(big).collect()}
    assert all(s2[i] == s1[i] for i in ids)


@settings(deadline=None, max_examples=4,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(sentence, min_size=1, max_size=6))
def test_bpe_trainers_bit_identical_property(sparkm, texts):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textops

    docs = sparkm.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    assert textops.bpe_train(docs, n_merges=6) == textops.bpe_train_distributed(
        docs, n_merges=6
    )


@settings(**SET)
@given(texts=st.lists(sentence.filter(lambda s: len(s) >= 8), min_size=1, max_size=8))
def test_minhash_rowlocal_equality_property(sparkm, texts):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import dedup

    docs = sparkm.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = dedup.minhash_signatures(
        dedup.char_shingles(docs, dedup_shingles=False), num_hashes=16
    )
    b = dedup.minhash_signatures_rowlocal(docs, num_hashes=16)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


@settings(**SET)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=30), min_size=1, max_size=4),
    quota=st.integers(min_value=1, max_value=15),
)
def test_source_quota_exact_cap_property(sparkm, sizes, quota):
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import corpus

    rows, nid = [], 0
    for s, n in enumerate(sizes):
        for _ in range(n):
            rows.append((nid, f"s{s}"))
            nid += 1
    docs = sparkm.createDataFrame(rows, "doc_id long, source string")
    kept = (
        corpus.source_quota(docs, per_source=quota)
        .filter("kept")
        .groupBy("source")
        .count()
        .collect()
    )
    got = {r.source: r["count"] for r in kept}
    assert got == {f"s{s}": min(quota, n) for s, n in enumerate(sizes)}
