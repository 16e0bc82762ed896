"""Masking + row-access policies: registry, role-hierarchy resolution,
and the policy-enforcing read path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_iceberg_cld_bcdr_demo_spark.jobs.grants import GrantRegistry
from snowflake_iceberg_cld_bcdr_demo_spark.jobs.policies import (
    PolicyRegistry,
    secured_view,
)


@pytest.fixture()
def pol(tmp_path):
    return PolicyRegistry(str(tmp_path / "wh"))


def _users(spark):
    return spark.createDataFrame(
        [
            (1, "ann@example.com", "us", 900.0),
            (2, "bob@corp.org", "eu", 100.0),
            (3, "cat@mail.net", "us", 500.0),
        ],
        "id long, email string, region string, balance double",
    )


def test_masking_per_role_with_default(spark, pol):
    pol.set_masking_policy("db.users", "email", {"admin": "unmasked", "*": "email"})
    pol.set_masking_policy("db.users", "balance", {"admin": "unmasked", "*": "null"})

    admin = secured_view(_users(spark), "db.users", "admin", pol)
    assert admin.filter("id = 1").first().email == "ann@example.com"

    analyst = secured_view(_users(spark), "db.users", "analyst", pol)
    row = analyst.filter("id = 1").first()
    assert row.email == "a***@example.com"
    assert row.balance is None
    # schema stable for downstream consumers
    assert dict(analyst.dtypes)["balance"] == "double"


def test_row_policy_filters_and_pushes_down(spark, pol):
    pol.set_row_policy("db.users", {"admin": "unrestricted", "*": "region = 'us'"})
    assert secured_view(_users(spark), "db.users", "admin", pol).count() == 3
    limited = secured_view(_users(spark), "db.users", "analyst", pol)
    assert {r.id for r in limited.collect()} == {1, 3}


def test_role_hierarchy_resolution(spark, pol, tmp_path):
    """A parent role inherits its (transitive) children's policy entries —
    the reference hierarchy admin ← engineer ← analyst."""
    g = GrantRegistry(str(tmp_path / "wh"))
    g.create_role("iceberg_admin")
    g.create_role("iceberg_engineer", granted_to="iceberg_admin")
    g.create_role("iceberg_analyst", granted_to="iceberg_engineer")
    pol.set_masking_policy(
        "db.users", "email", {"iceberg_engineer": "unmasked", "*": "full"}
    )
    # admin inherits engineer's entry; analyst does not (it is below)
    admin = secured_view(_users(spark), "db.users", "iceberg_admin", pol, grants=g)
    assert admin.first().email == "ann@example.com"
    analyst = secured_view(_users(spark), "db.users", "iceberg_analyst", pol, grants=g)
    assert analyst.first().email == "***MASKED***"


def test_hash_mask_and_drop(spark, pol):
    pol.set_masking_policy("db.users", "email", {"*": "hash"})
    hashed = secured_view(_users(spark), "db.users", "anyone", pol)
    assert len(hashed.first().email) == 64  # sha2-256 hex
    pol.drop_policies("db.users")
    raw = secured_view(_users(spark), "db.users", "anyone", pol)
    assert raw.first().email == "ann@example.com"


def test_purge_consistent_across_catalog_paths(spark, tmp_path):
    """GDPR purge consistency across every access path: the purged key
    must be gone through the EXT registry (both accounts), the second
    account's own CLD catalog binding over the shared warehouse, time
    travel, AND the PROD views after migrate_prod_independent — no path
    may resurrect the row."""
    from snowflake_iceberg_cld_bcdr_demo_spark.jobs import bcdr, sync

    wh = str(tmp_path / "wh")
    primary = bcdr.make_account(spark, wh, "pa")
    secondary = bcdr.make_account(spark, wh, "sa", role="replica")
    ns = "pii"
    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("v"))
    primary.catalog.create_table(ns, "users", df)
    primary.catalog.append(ns, "users", df.withColumn("id", F.col("id") + 100))
    primary.ext.register("EXT_USERS", ns, "users")
    sync.sync_prod_database(spark, primary.catalog, ns, primary.prod)
    bcdr.replicate_definitions(primary, secondary)

    out = primary.catalog.purge_rows(ns, "users", [("id", "=", 42)])
    assert out["removed_rows"] == 1

    # path 1+2: EXT registry through BOTH accounts (shared storage)
    assert primary.ext.load("EXT_USERS").filter("id = 42").count() == 0
    assert secondary.ext.load("EXT_USERS").filter("id = 42").count() == 0
    # path 3: the secondary's own CLD catalog binding
    assert secondary.catalog.load(ns, "users").filter("id = 42").count() == 0
    # path 4: time travel on either catalog cannot resurrect the row
    assert (
        secondary.catalog.load(ns, "users", snapshot_id=1)
        .filter("id = 42").count() == 0
    )
    assert secondary.catalog.load(ns, "users").count() == 199

    # path 5: PROD views after promote + migrate_prod_independent —
    # catalog refresh (re-register) then the rebound views stay clean
    bcdr.promote(secondary, primary)
    bcdr.migrate_prod_independent(spark, secondary, ns)
    sync.register_catalog_tables(spark, secondary.catalog, ns, f"cld_{secondary.name}")
    for v in secondary.prod.apply(spark, prefix="prodsa"):
        if v.endswith("users"):
            assert spark.table(v).filter("id = 42").count() == 0
            assert spark.table(v).count() == 199


def test_engine_enforced_rbac_on_catalog(spark, tmp_path):
    """Opt-in engine enforcement (closing the audit-only gap): with
    enable_rbac a direct catalog.load() by an ungranted role raises,
    SELECT flows down the role hierarchy and through wildcard (future)
    grants, every write path is gated at the commit choke point, and
    disable_rbac restores the unenforced default."""
    import pytest

    from snowflake_iceberg_cld_bcdr_demo_spark.jobs.grants import GrantRegistry
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )

    wh = str(tmp_path / "wh")
    cat = LakehouseCatalog(spark, wh, name="rbac")
    df = spark.range(5).selectExpr("id", "id * 2 AS v")
    cat.create_table("prod", "t", df)

    reg = GrantRegistry(wh, "acct")
    reg.create_role("iceberg_admin")
    reg.create_role("iceberg_engineer", granted_to="iceberg_admin")
    reg.create_role("iceberg_analyst", granted_to="iceberg_engineer")
    # future-grant wildcard SELECT for analysts; engineer-level WRITE
    reg.grant("TABLE", "prod.*", "iceberg_analyst", "SELECT")
    reg.grant("TABLE", "prod.*", "iceberg_engineer", "WRITE")

    cat.enable_rbac(reg, "iceberg_analyst")
    assert cat.load("prod", "t").count() == 5  # wildcard SELECT
    with pytest.raises(PermissionError, match="lacks WRITE"):
        cat.append("prod", "t", df)
    # time travel goes through the same gate
    snap = cat.current_snapshot("prod", "t")
    assert cat.load("prod", "t", snapshot_id=snap.snapshot_id).count() == 5

    # the hierarchy flows child -> parent: engineer inherits analyst's
    # SELECT and carries its own WRITE
    cat.set_role("iceberg_engineer")
    cat.append("prod", "t", df)
    assert cat.load("prod", "t").count() == 10

    # an unknown/ungranted role can do neither
    cat.set_role("intern")
    with pytest.raises(PermissionError, match="lacks SELECT"):
        cat.load("prod", "t")
    with pytest.raises(PermissionError, match="lacks WRITE"):
        cat.delete_where("prod", "t", [("id", "=", 1)])

    # outside the granted namespace nothing leaks through the wildcard
    cat.set_role("iceberg_analyst")
    cat.disable_rbac()
    cat.create_table("other", "s", df)
    cat.enable_rbac(reg, "iceberg_analyst")
    with pytest.raises(PermissionError, match="lacks SELECT"):
        cat.load("other", "s")

    cat.disable_rbac()
    assert cat.load("other", "s").count() == 5
