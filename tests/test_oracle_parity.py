"""Every registered query with an oracle must match DuckDB at sf0.001
(fast gate; the driver runs sf0.01). Rows-only queries must run and
return a stable schema."""

from __future__ import annotations

import pytest

from snowflake_iceberg_cld_bcdr_demo_spark.plans import QUERY_SPECS

from .conftest import SF_SMALL
from .oracle_compare import compare, duck_connection

_WITH_ORACLE = [n for n, s in QUERY_SPECS.items() if s.oracle is not None]
_ROWS_ONLY = [n for n, s in QUERY_SPECS.items() if s.oracle is None]


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_SMALL)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    spec = QUERY_SPECS[name]
    df = spec.build(spark, SF_SMALL)
    ok, msg = compare(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"


def test_every_query_has_an_oracle():
    """Round 11 bound-certified the last four rows-only queries (the
    HLL/GK/FreqItems sketches and the zlib signal now emit exact
    columns + published-bound flags the oracle replays), so the WHOLE
    registry is oracle-bearing.  This pin replaces the per-query
    rows-only runner — an empty parametrize list would otherwise show
    up as a phantom pytest skip forever."""
    assert _ROWS_ONLY == [], f"rows-only queries reappeared: {_ROWS_ONLY}"


def test_registry_order_tiers():
    """The external driver records a bounded prefix of queries() in
    CORRECTNESS_r{N}.json.  Ordering contract: (1) oracle-bearing
    queries that are never-certified OR stale (rewritten after their
    last stamp — ``changed_in``) first, (2) rows-only queries never
    recorded in ANY official file next — so they finally reach the
    window, (3) fresh certified oracle queries (LRU rotation),
    (4) recorded rows-only last."""
    import __spark_entry__ as e
    from snowflake_iceberg_cld_bcdr_demo_spark.plans import registry

    names = list(e.queries())
    oracles = set(e.oracle_sql())
    cert = registry._certification_rounds()
    recorded = registry._recorded_names()

    def tier(n: str) -> int:
        if n in oracles:
            fresh = n in cert and cert[n] > registry.QUERY_SPECS[n].changed_in
            return 3 if fresh else 1
        return 2 if n not in recorded else 4

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), (
        "registry order violates tier contract: "
        + str([(n, t) for n, t in zip(names, tiers)][:20])
    )


def test_never_recorded_rows_only_land_in_driver_window():
    """The 8 rows-only queries that spent six rounds outside the
    driver's 50-entry window must now sort inside it (they sit right
    after the never-certified oracle tier, which is small once the
    surface is green)."""
    import __spark_entry__ as e
    from snowflake_iceberg_cld_bcdr_demo_spark.plans import registry

    names = list(e.queries())
    oracles = set(e.oracle_sql())
    recorded = registry._recorded_names()
    never_recorded_rows_only = [
        n for n in names if n not in oracles and n not in recorded
    ]
    window = set(names[:50])
    missing = [n for n in never_recorded_rows_only if n not in window]
    assert not missing, f"never-recorded rows-only outside window: {missing}"


def test_failed_official_rows_refront_rotation(tmp_path, monkeypatch):
    """A query whose LATEST official CORRECTNESS row failed (hash
    mismatch or canonicalizer error) must count as UNchecked so it
    re-enters the driver's bounded window next round; a later passing
    row re-certifies it.  Regression for the round-4 rotation bug where
    merely *appearing* in a CORRECTNESS file counted as certified."""
    import json

    from snowflake_iceberg_cld_bcdr_demo_spark.plans import registry

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "spark_rows": 1, "oracle_rows": 1, "err": None}
    red = dict(green, hash_match=False)
    crashed = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": "boom"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"a": green, "b": green, "c": green}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"b": red, "c": crashed, "d": green}))
    # r10 sorts after r2 numerically (not lexically): 'b' re-certified there
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps({"b": green}))

    import glob as _glob

    real_glob = _glob.glob

    def fake_glob(pattern):
        return real_glob(str(tmp_path / "CORRECTNESS_r*.json"))

    monkeypatch.setattr(_glob, "glob", fake_glob)
    checked = registry._officially_checked()
    assert "a" in checked            # passed, never contradicted
    assert "b" in checked            # failed r02 but re-certified in r10
    assert "c" not in checked        # latest row crashed -> recheck
    assert "d" in checked
    # the hardcoded r01/r02 baseline names stay certified
    assert "q1_pricing_summary" in checked
    # least-recently-certified ordering data: 'b' carries its r10 round,
    # 'a' its r01 round
    rounds = registry._certification_rounds()
    assert rounds["a"] == 1 and rounds["b"] == 10 and rounds["d"] == 2


def test_rotation_covers_whole_certified_surface():
    """With every oracle query certified and a 50-entry driver window,
    the least-recently-certified ordering must walk the ENTIRE certified
    surface across consecutive rounds (ceil(N/50) rounds), instead of
    re-checking a static prefix forever — simulate three driver rounds
    and assert full coverage."""
    from snowflake_iceberg_cld_bcdr_demo_spark.plans import registry
    from snowflake_iceberg_cld_bcdr_demo_spark.plans.registry import QuerySpec

    n, window = 140, 50
    specs = [QuerySpec(f"q{i:03d}", build=None, oracle="SELECT 1") for i in range(n)]
    cert = {s.name: 5 for s in specs}  # all certified in the same round
    seen: set[str] = set()
    for rnd in (6, 7, 8):
        prefix = [s.name for s in registry._order_specs(specs, cert)[:window]]
        seen.update(prefix)
        for name in prefix:
            cert[name] = rnd  # the driver re-certifies the window
    assert seen == {s.name for s in specs}
