"""Dynamic data masking + row access policies — the engine-side model of
Snowflake's column/row security surface the reference's RBAC story implies
(`/root/reference/scripts/00_prereqs_rbac.sql:22-44` builds the role
hierarchy; masking/row policies are the next governance layer a real
deployment adds on top of grants — see :mod:`.grants`).

Spark has no engine-enforced policies (SURVEY.md §1.1), so policies are
data: a persisted registry of masking rules (column → per-role masked
expression) and row-access rules (per-role predicate), applied at read
time by rewriting the DataFrame — `secured_view` is the policy-enforcing
reader a platform layer would expose instead of raw table access.

Scale: enforcement is a projection (masking) plus a pushdown-friendly
filter (row access) — both narrow, codegen'd, and predicate-pushdown
reaches the scan, so a row policy on the partition column still prunes
partitions.  Role resolution walks the grant hierarchy driver-side
(O(roles), tiny).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .grants import GrantRegistry

#: built-in masking functions, Snowflake masking-policy idioms
MASKS = {
    "full": lambda c: F.lit("***MASKED***"),
    "null": lambda c: F.lit(None),
    "email": lambda c: F.concat(
        F.substring(c, 1, 1), F.lit("***@"), F.substring_index(c, "@", -1)
    ),
    "hash": lambda c: F.sha2(c.cast("string"), 256),
    "last4": lambda c: F.concat(
        F.lit("***"), F.substring(c.cast("string"), -4, 4)
    ),
}


class PolicyRegistry:
    """Persisted masking + row-access policies for one warehouse.

    A masking policy: (table, column) → {role_or_'*': mask_name_or_expr}.
    A row policy: table → {role_or_'*': SQL predicate}.  The '*' entry is
    the default; a role with an explicit entry (or an ancestor's entry via
    the grant hierarchy) uses the most specific match.  Roles with the
    ``unmasked`` marker see raw data."""

    def __init__(self, warehouse: str, name: str = "policies") -> None:
        self.path = os.path.join(warehouse, f"_{name}.json")

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {"masking": {}, "row_access": {}}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, reg: dict) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(reg, f, indent=1)
        os.replace(tmp, self.path)

    # -- policy DDL ------------------------------------------------------
    def set_masking_policy(
        self, table: str, column: str, rules: dict[str, str]
    ) -> None:
        """``rules``: role (or '*') → mask name from :data:`MASKS`, the
        marker 'unmasked', or a SQL expression over the column's table."""
        for mask in rules.values():
            if mask not in MASKS and mask != "unmasked" and not mask.strip():
                raise ValueError(f"bad mask {mask!r}")
        reg = self._read()
        reg["masking"][f"{table}.{column}"] = rules
        self._write(reg)

    def set_row_policy(self, table: str, rules: dict[str, str]) -> None:
        """``rules``: role (or '*') → SQL predicate (TRUE = row visible;
        the marker 'unrestricted' lifts filtering for that role)."""
        reg = self._read()
        reg["row_access"][table] = rules
        self._write(reg)

    def drop_policies(self, table: str) -> None:
        reg = self._read()
        reg["masking"] = {
            k: v for k, v in reg["masking"].items() if not k.startswith(f"{table}.")
        }
        reg["row_access"].pop(table, None)
        self._write(reg)

    def policies_for(self, table: str) -> dict:
        reg = self._read()
        return {
            # keys are "{table}.{column}"; table may itself be dotted
            # ("ns.table"), so split the column off the right
            "masking": {
                k.rsplit(".", 1)[1]: v
                for k, v in reg["masking"].items()
                if k.rsplit(".", 1)[0] == table
            },
            "row_access": reg["row_access"].get(table),
        }


def _role_chain(role: str, grants: GrantRegistry | None) -> list[str]:
    """``role`` followed by the roles it inherits.  The registry maps
    child → parent where the PARENT inherits the child's access
    (`grants.py` REFERENCE_ROLES), so the inherited set is the role's
    transitive children, breadth-first — an explicit own rule beats an
    inherited one, nearer children beat farther ones."""
    chain = [role]
    if grants is None:
        return chain
    child_to_parent = grants.roles()
    frontier = [role]
    seen = {role}
    while frontier:
        nxt = [
            c
            for c, p in child_to_parent.items()
            if p in frontier and c not in seen
        ]
        chain.extend(nxt)
        seen.update(nxt)
        frontier = nxt
    return chain


def _resolve(rules: dict[str, str], role: str, grants: GrantRegistry | None) -> str | None:
    for r in _role_chain(role, grants):
        if r in rules:
            return rules[r]
    return rules.get("*")


def secured_view(
    df: DataFrame,
    table: str,
    role: str,
    policies: PolicyRegistry,
    grants: GrantRegistry | None = None,
) -> DataFrame:
    """Apply ``table``'s masking + row policies to ``df`` for ``role`` —
    the policy-enforcing read path.  Row policy applies FIRST (on raw
    values, like engines evaluate row access before masking), then
    masked columns are rewritten in place."""
    pol = policies.policies_for(table)
    row_rules = pol["row_access"]
    if row_rules:
        pred = _resolve(row_rules, role, grants)
        if pred is not None and pred != "unrestricted":
            df = df.filter(F.expr(pred))
    for column, rules in pol["masking"].items():
        mask = _resolve(rules, role, grants)
        if mask is None or mask == "unmasked":
            continue
        if column not in df.columns:
            continue
        dtype = dict(df.dtypes)[column]
        masked = (
            MASKS[mask](F.col(column)) if mask in MASKS else F.expr(mask)
        )
        # 'null'/'hash' style masks may change type; keep the column type
        # when castable so downstream schemas stay stable
        df = df.withColumn(
            column,
            masked.cast(dtype) if mask in ("null", "last4") else masked,
        )
    return df
