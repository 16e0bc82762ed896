"""Config-driven grant/ACL registry + audit — the engine-side model of the
reference's RBAC surface.

The reference builds a three-role hierarchy ADMIN → ENGINEER → ANALYST
(`00_prereqs_rbac.sql:22-44`) and its heartbeat re-asserts grants every
cycle: database USAGE, schema USAGE (current + future), table/view SELECT
(current + future), and integration/volume USAGE
(`31_sync_task_secondary.sql:197-287`).  Spark has no engine RBAC
(SURVEY.md §1.1), so this module models it as data: a persisted registry
of roles and grants, an ``ensure`` pass that applies a declarative
expected set (the reference's idempotent re-GRANT loops), and an ``audit``
diff (J5 anti-join shapes) that reports missing/unexpected grants the same
way view drift is reported — so the F2 grant audit produces real findings
instead of a SKIPPED record.

Future grants (`GRANT … ON FUTURE TABLES IN DATABASE db`) are modeled as
wildcard object names (``db.*``): a wildcard grant covers any current or
future object under that database, which is exactly the semantics the
reference relies on (`31:230-232,246-250`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..adtech.schemas import GRANT_AUDIT_LOG_SCHEMA
from ..sources.lakehouse import LakehouseCatalog
from .logs import append_rows

#: the reference's role hierarchy (`00_prereqs_rbac.sql:22-44`):
#: child role granted to parent → the parent inherits the child's access
REFERENCE_ROLES: dict[str, str | None] = {
    "iceberg_admin": None,
    "iceberg_engineer": "iceberg_admin",
    "iceberg_analyst": "iceberg_engineer",
}


def reference_expected_grants(
    cld_db: str = "cld", prod_db: str = "prod"
) -> list[dict]:
    """The declarative grant set the reference heartbeat re-asserts
    (`31:197-287`), re-expressed against this engine's catalogs."""
    grants: list[dict] = []
    for db in (cld_db, prod_db):
        for role in ("iceberg_analyst", "iceberg_engineer"):
            # database USAGE (`31:199-204`)
            grants.append(
                dict(object_type="DATABASE", object_name=db, role=role, privilege="USAGE")
            )
            # schema USAGE, current + future → wildcard (`31:217-233`)
            grants.append(
                dict(object_type="SCHEMA", object_name=f"{db}.*", role=role, privilege="USAGE")
            )
            # table/view SELECT, current + future → wildcard (`31:241-262`)
            grants.append(
                dict(
                    object_type="TABLE/VIEW",
                    object_name=f"{db}.*",
                    role=role,
                    privilege="SELECT",
                )
            )
    for role in ("iceberg_analyst", "iceberg_engineer"):
        grants.append(
            dict(
                object_type="EXTERNAL VOLUME",
                object_name="iceberg_ext_volume",
                role=role,
                privilege="USAGE",
            )
        )
        grants.append(
            dict(
                object_type="INTEGRATION",
                object_name="iceberg_s3_int",
                role=role,
                privilege="USAGE",
            )
        )
    # REST catalog integration is admin-only (`31:276`)
    grants.append(
        dict(
            object_type="INTEGRATION",
            object_name="rest_glue_catalog_int",
            role="iceberg_admin",
            privilege="USAGE",
        )
    )
    return grants


def _key(g: dict) -> tuple[str, str, str, str]:
    return (g["object_type"], g["object_name"], g["role"], g["privilege"])


class GrantRegistry:
    """Persisted role/grant state for one logical account — the registry
    the ``ensure``/``audit`` passes read and repair."""

    def __init__(self, warehouse: str, name: str = "grants") -> None:
        self._path = os.path.join(warehouse, f"_grants_{name}.json")
        os.makedirs(warehouse, exist_ok=True)

    def _read(self) -> dict:
        if not os.path.isfile(self._path):
            return {"roles": {}, "grants": []}
        with open(self._path) as f:
            return json.load(f)

    def _write(self, state: dict) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, self._path)

    # -- roles (`00_prereqs_rbac.sql:22-44`) ------------------------------
    def create_role(self, role: str, granted_to: str | None = None) -> None:
        state = self._read()
        state["roles"][role] = granted_to
        self._write(state)

    def roles(self) -> dict[str, str | None]:
        return dict(self._read()["roles"])

    def _reachable_from(self, role: str) -> set[str]:
        """Roles whose privileges ``role`` inherits: itself plus every role
        granted (directly or transitively) to it — Snowflake's hierarchy
        semantics, where GRANT ROLE child TO ROLE parent flows access up."""
        state = self._read()
        reach = {role}
        changed = True
        while changed:
            changed = False
            for child, parent in state["roles"].items():
                if parent in reach and child not in reach:
                    reach.add(child)
                    changed = True
        return reach

    # -- grants -----------------------------------------------------------
    def grant(
        self, object_type: str, object_name: str, role: str, privilege: str
    ) -> bool:
        """Idempotent grant; returns True if it was newly applied."""
        state = self._read()
        g = dict(
            object_type=object_type, object_name=object_name, role=role, privilege=privilege
        )
        if any(_key(x) == _key(g) for x in state["grants"]):
            return False
        state["grants"].append(g)
        self._write(state)
        return True

    def revoke(
        self, object_type: str, object_name: str, role: str, privilege: str
    ) -> bool:
        state = self._read()
        key = (object_type, object_name, role, privilege)
        before = len(state["grants"])
        state["grants"] = [g for g in state["grants"] if _key(g) != key]
        self._write(state)
        return len(state["grants"]) < before

    def grants(self) -> list[dict]:
        return [dict(g) for g in self._read()["grants"]]

    def has_privilege(
        self, role: str, object_type: str, object_name: str, privilege: str
    ) -> bool:
        """Access check with hierarchy + wildcard (future-grant) matching."""
        reach = self._reachable_from(role)
        for g in self._read()["grants"]:
            if g["object_type"] != object_type or g["privilege"] != privilege:
                continue
            if g["role"] not in reach:
                continue
            name = g["object_name"]
            if name == object_name or (
                name.endswith(".*") and object_name.startswith(name[:-1])
            ):
                return True
        return False


def ensure_roles(registry: GrantRegistry, roles: dict[str, str | None] | None = None) -> None:
    for role, parent in (roles or REFERENCE_ROLES).items():
        registry.create_role(role, parent)


def ensure_grants(
    spark: SparkSession,
    registry: GrantRegistry,
    expected: list[dict],
    monitoring: LakehouseCatalog | None = None,
) -> dict:
    """The reference's idempotent re-GRANT pass (`31:197-287`): apply every
    expected grant, log each application to ``grant_audit_log``."""
    applied, already = [], 0
    for g in expected:
        if registry.grant(**g):
            applied.append(g)
        else:
            already += 1
    if monitoring is not None and applied:
        append_rows(
            spark,
            monitoring,
            "grant_audit_log",
            GRANT_AUDIT_LOG_SCHEMA,
            [
                dict(
                    object_type=g["object_type"],
                    object_name=g["object_name"],
                    role_name=g["role"],
                    privilege=g["privilege"],
                    action="GRANTED",
                    status="SUCCESS",
                )
                for g in applied
            ],
            id_field="audit_id",
        )
    return {"granted": len(applied), "already_present": already}


def audit_grants(
    spark: SparkSession,
    registry: GrantRegistry,
    expected: list[dict],
    monitoring: LakehouseCatalog | None = None,
) -> dict:
    """Grant drift audit: expected-vs-actual set difference both ways (the
    J5 anti-join shape used for view drift, applied to ACLs).  Missing
    grants are real findings; unexpected grants are reported for review."""
    actual = {_key(g) for g in registry.grants()}
    want = {_key(g) for g in expected}
    missing = sorted(want - actual)
    unexpected = sorted(actual - want)
    if monitoring is not None and (missing or unexpected):
        rows = [
            dict(
                object_type=k[0],
                object_name=k[1],
                role_name=k[2],
                privilege=k[3],
                action="MISSING",
                status="DETECTED",
            )
            for k in missing
        ] + [
            dict(
                object_type=k[0],
                object_name=k[1],
                role_name=k[2],
                privilege=k[3],
                action="UNEXPECTED",
                status="DETECTED",
            )
            for k in unexpected
        ]
        append_rows(
            spark,
            monitoring,
            "grant_audit_log",
            GRANT_AUDIT_LOG_SCHEMA,
            rows,
            id_field="audit_id",
        )
    return {
        "status": "SUCCESS" if not missing else "FAILED",
        "missing": [" ".join(k) for k in missing],
        "unexpected": [" ".join(k) for k in unexpected],
        "checked": len(want),
    }
