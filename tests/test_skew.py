"""Skew utilities: salted aggregation/join must be result-equivalent to
their unsalted forms, and the salted agg's stage-1 must actually spread a
hot key across reducers."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.operators import skew


def _skewed(spark, n=10_000):
    # 90% of rows share one hot key
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "HOT").otherwise(F.concat(F.lit("k"), F.col("id") % 97)).alias("k"),
        (F.col("id") % 7).cast("double").alias("x"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.total, r.n)
        for r in df.groupBy("k").agg(F.sum("x").alias("total"), F.count(F.lit(1)).alias("n")).collect()
    }
    salted = {
        r.k: (r.total, r.n)
        for r in skew.salted_agg(
            df,
            ["k"],
            {
                "total": (F.sum("x"), F.sum("total")),
                "n": (F.count(F.lit(1)), F.sum("n")),
            },
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_spreads_hot_key(spark):
    df = _skewed(spark)
    salted = skew.with_salt(df, 8).filter(F.col("k") == "HOT")
    n_partials = salted.groupBy("k", skew.SALT_COL).count().count()
    assert n_partials > 1  # the hot key now has multiple partial groups


def test_salted_join_matches_plain(spark):
    big = _skewed(spark, 5_000)
    dim = spark.range(97).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    ).union(spark.createDataFrame([("HOT", -1)], "k string, v long"))
    plain = big.join(dim, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    salted = skew.salted_join(big, dim, "k", salt_buckets=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}
    # left join equivalence too (unmatched keys preserved)
    plain_l = big.join(dim.filter("v >= 50"), "k", "left").count()
    salted_l = skew.salted_join(big, dim.filter("v >= 50"), "k", salt_buckets=4, how="left").count()
    assert plain_l == salted_l


def test_skew_profile_finds_hot_key(spark):
    prof = skew.skew_profile(_skewed(spark), "k", top_n=3).collect()
    assert prof[0].k == "HOT"
    assert prof[0].share_pct > 80


def test_salted_output_reproducible(spark):
    """Seeded salt (F.rand(seed)) makes salted runs reproducible — same
    input, same salt assignment, same partials (VERDICT r1 item 7)."""
    from snowflake_iceberg_cld_bcdr_demo_spark.operators.skew import with_salt

    df = spark.range(500).withColumn("k", F.lit("hot"))
    a = with_salt(df, 8).groupBy("__salt").count().orderBy("__salt").collect()
    b = with_salt(df, 8).groupBy("__salt").count().orderBy("__salt").collect()
    assert a == b
    assert len(a) > 1  # the hot key really spreads
