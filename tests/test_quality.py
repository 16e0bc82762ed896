"""Data-quality expectations: rule evaluation, enforcement, and the
WAP audit-gate integration (stage → check → publish/abandon)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.operators import quality as Q
from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import LakehouseCatalog


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "O", 10.0, 100),
            (2, "F", -5.0, 200),   # range violation
            (3, "X", 20.0, None),  # accepted_values + not_null violations
            (3, "O", 30.0, 300),   # duplicate id
        ],
        "id long, status string, price double, ref_id long",
    )


def test_check_counts_each_violation_kind(spark):
    ref = spark.createDataFrame([(100,), (200,)], "k long")  # 300 missing
    report = {
        r.rule: (r.n_violations, r.passed)
        for r in Q.check(
            _df(spark),
            [
                Q.not_null("ref_id"),
                Q.accepted_values("status", ["O", "F", "P"]),
                Q.in_range("price", lo=0.0),
                Q.unique(["id"]),
                Q.foreign_key("ref_id", ref, "k"),
                Q.expect("price_below_1000", F.col("price") < 1000),
            ],
        ).collect()
    }
    assert report["not_null(ref_id)"] == (1, False)
    assert report["accepted_values(status)"] == (1, False)
    assert report["in_range(price)"] == (1, False)
    assert report["unique(id)"] == (1, False)
    assert report["foreign_key(ref_id)"] == (1, False)  # 300 orphan; NULL exempt
    assert report["expect(price_below_1000)"] == (0, True)


def test_enforce_raises_listing_failures(spark):
    with pytest.raises(ValueError, match=r"unique\(id\).*1 violations"):
        Q.enforce(_df(spark), [Q.unique(["id"]), Q.in_range("price", lo=-100)])


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError, match="no rules"):
        Q.check(_df(spark), [])


def test_wap_audit_gate(spark, tmp_path):
    """The stage → audit → publish flow: a bad batch stays quarantined on
    its branch; a clean batch publishes."""
    cat = LakehouseCatalog(spark, str(tmp_path / "wh"))
    clean = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id long, price double")
    cat.create_table("db", "t", clean)
    rules = [Q.not_null("price"), Q.in_range("price", lo=0.0), Q.unique(["id"])]

    bad = spark.createDataFrame([(3, -1.0)], "id long, price double")
    cat.append("db", "t", bad, branch="incoming")
    with pytest.raises(ValueError, match="in_range"):
        Q.enforce(cat.load("db", "t", ref="incoming"), rules)
    cat.drop_ref("db", "t", "incoming")  # audit failed: abandon the stage
    assert cat.load("db", "t").count() == 2

    good = spark.createDataFrame([(3, 7.0)], "id long, price double")
    cat.append("db", "t", good, branch="incoming2")
    Q.enforce(cat.load("db", "t", ref="incoming2"), rules)
    cat.publish_branch("db", "t", "incoming2")
    assert cat.load("db", "t").count() == 3


def test_char_entropy_catalyst_matches_python_kernel(spark):
    """The pure-Catalyst entropy must agree with compression_signals'
    Python kernel to rounding (different summation orders — first
    appearance vs sorted char — so equality is to 1e-9, not bits)."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators import textclean

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, ""), (5, "mississippi")],
        "doc_id long, text string",
    )
    jvm = {r.doc_id: r.char_entropy_bits
           for r in textclean.char_entropy(docs).collect()}
    py = {r.doc_id: r.char_entropy
          for r in textclean.compression_signals(docs).collect()}
    assert jvm[1] == 0.0 and jvm[4] == 0.0
    assert abs(jvm[2] - 1.0) < 1e-9  # two equiprobable symbols = 1 bit
    assert abs(jvm[3] - 2.0) < 1e-9
    for k in jvm:
        assert abs(jvm[k] - py[k]) < 1e-8, k
