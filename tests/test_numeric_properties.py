"""Property-based defense of the cross-engine numeric contract
(functions/numeric.py): for arbitrary 2-decimal money values under
arbitrary partitioning, the decimal-sum/round/avg formulations are
bit-identical between Spark and DuckDB.

This is the invariant the whole oracle gate rests on — naive double
formulations fail it (sum-order ulps, round-of-double divergence), which
is exactly what these properties would catch on regression."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.functions.numeric import dec, dec_avg, dec_sum

# 2-decimal money values as the testdata has them, including boundary
# shapes (x.xx5 sums arise from any combination of these)
money = st.integers(min_value=-10_000_000, max_value=10_000_000).map(lambda c: c / 100)
rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3), money), min_size=1, max_size=60
)


def _duck(rows_list, sql):
    con = duckdb.connect()
    con.sql("CREATE TABLE t (g INTEGER, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows_list)
    return sorted(map(tuple, con.sql(sql).fetchall()))


@pytest.fixture(scope="module")
def sparkm(spark):
    return spark


@given(data=rows, nparts=st.integers(min_value=1, max_value=7))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_decimal_sum_bit_identical(sparkm, data, nparts):
    df = sparkm.createDataFrame(data, "g int, x double").repartition(nparts)
    got = sorted(
        tuple(r)
        for r in df.groupBy("g").agg(dec_sum(dec("x")).alias("s")).collect()
    )
    want = _duck(
        data,
        "SELECT g, CAST(ROUND(SUM(CAST(x AS DECIMAL(18,2))), 2) AS DOUBLE) AS s"
        " FROM t GROUP BY g",
    )
    assert [(g, repr(s)) for g, s in got] == [(g, repr(s)) for g, s in want]


@given(data=rows, nparts=st.integers(min_value=1, max_value=7))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_decimal_avg_bit_identical(sparkm, data, nparts):
    df = sparkm.createDataFrame(data, "g int, x double").repartition(nparts)
    got = sorted(
        tuple(r)
        for r in df.groupBy("g").agg(dec_avg(dec("x")).alias("a")).collect()
    )
    want = _duck(
        data,
        "SELECT g, CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS a"
        " FROM t GROUP BY g",
    )
    assert [(g, repr(a)) for g, a in got] == [(g, repr(a)) for g, a in want]


def test_known_boundary_case(sparkm):
    """The literal failure mode that motivated the contract: values whose
    double-sum straddles a .xx5 rounding boundary depending on add order."""
    vals = [0.1] * 3 + [70160.51]  # double sum = 70160.809999... or ...81
    df = sparkm.createDataFrame([(0, v) for v in vals], "g int, x double")
    naive = df.groupBy("g").agg(F.round(F.sum("x"), 2).alias("s")).collect()[0].s
    exact = df.groupBy("g").agg(dec_sum(dec("x")).alias("s")).collect()[0].s
    assert exact == 70160.81
    # the naive double path is allowed to agree here — the point is the
    # decimal path is exact by construction
    assert not math.isnan(naive)


def test_pack_contiguous_matches_naive_prefix_sum(spark):
    """Property: the distributed prefix-sum packing must equal the naive
    sequential layout for adversarial size mixes (zeros, giants, runs of
    equal ids are impossible — ids unique — but unsorted input order and
    skewed sizes are the risk surfaces)."""
    import random

    from snowflake_iceberg_cld_bcdr_demo_spark.operators import corpus

    rng = random.Random(7)
    rows = [
        (i, "w " * rng.choice([0, 1, 3, 40, 511, 512, 513, 2000]))
        for i in rng.sample(range(10_000), 400)
    ]
    rng.shuffle(rows)  # arrival order != id order
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.bin_id, r.offset_in_bin)
        for r in corpus.pack_contiguous(df, budget_tokens=256).collect()
    }
    cum = 0
    for doc_id, text in sorted(rows):
        n = len(text.split())
        assert got[doc_id] == (n, cum // 256, cum % 256)
        cum += n
