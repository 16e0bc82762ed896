"""Slowly-changing-dimension (SCD Type 2) maintenance over lakehouse tables.

The reference's dimension (``campaigns``) is overwritten wholesale on each
load (`/root/reference/scripts/04_create_glue_iceberg_tables.py:143-205`
recreates; `05_append_campaigns.py:112-123` appends) — history of a
changed row is lost.  A production BCDR/analytics stack versions its
dimensions instead, so this module adds the standard SCD2 pattern on top
of the row-level MERGE machinery (`..sources.lakehouse.merge_into`):

- every logical row is a set of *versions* ``[valid_from, valid_to)`` with
  an ``is_current`` flag (open version: ``valid_to IS NULL``);
- an incoming dimension snapshot closes the open version of every key
  whose tracked attributes changed and opens a new one, inserts brand-new
  keys, and leaves unchanged keys untouched;
- point-in-time reads (``as_of``) reconstruct the dimension exactly as it
  stood at any timestamp — the dimension-side analog of the fact table's
  snapshot time travel.

Scale: one join of the incoming snapshot (dimension-sized, usually
broadcastable) against only the OPEN versions; the subsequent MERGE is
file-level copy-on-write, so untouched data dirs carry by reference.  The
closed-version history accumulates append-only and is never rewritten.
"""

from __future__ import annotations

import datetime as _dt
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lakehouse import LakehouseCatalog, Snapshot

#: SCD2 bookkeeping columns added to the user's dimension schema
META_COLS = ("valid_from", "valid_to", "is_current")


def _with_meta(df: DataFrame, effective: _dt.datetime) -> DataFrame:
    return (
        df.withColumn("valid_from", F.lit(effective).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_init(
    cat: LakehouseCatalog,
    namespace: str,
    table: str,
    initial: DataFrame,
    effective: _dt.datetime,
    mode: str = "error",
) -> Snapshot:
    """Create an SCD2 dimension table from its first snapshot: every row
    becomes an open version effective at ``effective``."""
    return cat.create_table(namespace, table, _with_meta(initial, effective), mode=mode)


def scd2_apply(
    cat: LakehouseCatalog,
    namespace: str,
    table: str,
    snapshot: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective: _dt.datetime,
    close_missing: bool = False,
) -> dict:
    """Merge a new dimension snapshot into an SCD2 table.

    - keys present in both with any ``tracked_cols`` difference: the open
      version closes (``valid_to = effective``, ``is_current = false``)
      and a new open version inserts;
    - brand-new keys: a new open version inserts;
    - unchanged keys: untouched (their rows never rewrite);
    - ``close_missing=True`` additionally closes open versions whose key
      vanished from the snapshot (a hard-deleted dimension member).

    Returns ``{"changed": n, "inserted": n, "closed_missing": n,
    "snapshot": Snapshot}``.  NULL-safe comparison throughout: NULL → value
    (or value → NULL) counts as a change; NULL == NULL does not.
    """
    current_open = cat.load(namespace, table).filter(F.col("is_current")).alias("c")
    s = snapshot.alias("s")
    key_eq = [F.col(f"c.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key_cols]

    joined = s.join(current_open, on=key_eq, how="left")
    is_new = F.col(f"c.{key_cols[0]}").isNull() & reduce(
        lambda a, b: a & b, [F.col(f"c.{k}").isNull() for k in key_cols]
    )
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(f"c.{t}").eqNullSafe(F.col(f"s.{t}")) for t in tracked_cols],
    )
    delta_src = joined.filter(is_new | changed).select("s.*")
    # One pass computes both halves from the same join; the frame is
    # dimension-sized, so the double traversal below stays cheap.
    changed_keys = joined.filter(~is_new & changed).select(
        *[F.col(f"s.{k}").alias(k) for k in key_cols]
    )

    # 1. close the superseded open versions: match on (key, is_current)
    closing = changed_keys.withColumn("is_current", F.lit(True))
    n_changed = closing.count()
    n_new = delta_src.count() - n_changed
    if n_changed:
        cat.merge_into(
            namespace,
            table,
            closing,
            on=[*key_cols, "is_current"],
            when_matched_update={
                "valid_to": F.lit(effective).cast("timestamp"),
                "is_current": F.lit(False),
            },
            when_not_matched_insert=False,
        )

    closed_missing = 0
    if close_missing:
        open_now = cat.load(namespace, table).filter(F.col("is_current"))
        missing = open_now.join(
            snapshot.select(*key_cols).distinct(), key_cols, "left_anti"
        ).select(*key_cols).withColumn("is_current", F.lit(True))
        closed_missing = missing.count()
        if closed_missing:
            cat.merge_into(
                namespace,
                table,
                missing,
                on=[*key_cols, "is_current"],
                when_matched_update={
                    "valid_to": F.lit(effective).cast("timestamp"),
                    "is_current": F.lit(False),
                },
                when_not_matched_insert=False,
            )

    # 2. open the new versions (changed + brand-new keys) in one append
    snap = None
    if n_changed + n_new:
        snap = cat.append(namespace, table, _with_meta(delta_src, effective))
    return {
        "changed": n_changed,
        "inserted": n_new,
        "closed_missing": closed_missing,
        "snapshot": snap,
    }


def scd2_current(cat: LakehouseCatalog, namespace: str, table: str) -> DataFrame:
    """The dimension as it stands now (open versions only)."""
    return cat.load(namespace, table).filter(F.col("is_current"))


def scd2_as_of(
    cat: LakehouseCatalog, namespace: str, table: str, ts: _dt.datetime
) -> DataFrame:
    """Point-in-time reconstruction: the version of each key whose
    validity interval covers ``ts``."""
    t = F.lit(ts).cast("timestamp")
    return cat.load(namespace, table).filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )
