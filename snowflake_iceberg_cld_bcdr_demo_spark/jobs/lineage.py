"""Training-run reproducibility: pin the exact snapshot of every input
table, read through the pin, and detect drift between snapshots.

A training run that just says ``load("corpus")`` is unreproducible the
moment the next ingest commits.  The pin is the run manifest's data
section: (table → snapshot id + table uuid), resolved once at launch;
every read then goes through ``VERSION AS OF``.  The uuid guards against
the table being dropped and re-created between pin and read (same name,
different lineage) — the same check the streaming cursors use.

Scale: pinning is metadata-only (one manifest read per table); pinned
reads cost exactly what a head read costs.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.lakehouse import LakehouseCatalog


def pin_inputs(
    cat: LakehouseCatalog, tables: list[tuple[str, str]]
) -> dict:
    """Resolve the current snapshot of every (namespace, table) into a
    reproducibility pin: ``{"pinned_at", "inputs": {ns.table:
    {snapshot_id, table_uuid, row_count}}}`` — store it alongside the
    model checkpoint."""
    pin: dict = {"pinned_at": time.time(), "inputs": {}}
    for ns, t in tables:
        snap = cat.current_snapshot(ns, t)
        pin["inputs"][f"{ns}.{t}"] = {
            "snapshot_id": snap.snapshot_id,
            "table_uuid": cat.table_uuid(ns, t),
            "row_count": snap.row_count,
        }
    return pin


def load_pinned(
    cat: LakehouseCatalog, pin: dict, namespace: str, table: str
) -> DataFrame:
    """Read a table AT ITS PINNED SNAPSHOT, refusing if the table was
    re-created since the pin (uuid mismatch = same name, different
    data lineage — a silent-wrong-data hazard, not a time-travel case)."""
    key = f"{namespace}.{table}"
    entry = pin["inputs"].get(key)
    if entry is None:
        raise KeyError(f"{key} is not in this pin")
    current_uuid = cat.table_uuid(namespace, table)
    if current_uuid != entry["table_uuid"]:
        raise ValueError(
            f"{key} was re-created since the pin (uuid {entry['table_uuid']} "
            f"-> {current_uuid}); the pinned snapshots no longer exist"
        )
    return cat.load(namespace, table, snapshot_id=entry["snapshot_id"])


def snapshot_psi(
    cat: LakehouseCatalog,
    namespace: str,
    table: str,
    value_col: str,
    baseline_snapshot_id: int,
    current_snapshot_id: int | None = None,
    n_bins: int = 10,
    bin_width: float | None = None,
) -> dict:
    """Population Stability Index of ``value_col`` between two snapshots
    of the SAME table — "has the distribution of what we ingest drifted
    since the pinned baseline?".  Bins are fixed-width from the baseline
    snapshot's min/max (deterministic given the snapshots); missing bins
    get the conventional 1e-6 floor; PSI > 0.2 is the standard
    actionable threshold.

    Scale: two snapshot scans each reduce to O(n_bins) rows in one
    map-side-combined aggregation; everything after is driver-trivial."""
    base_df = cat.load(namespace, table, snapshot_id=baseline_snapshot_id)
    cur_df = cat.load(namespace, table, snapshot_id=current_snapshot_id)
    lo, hi = base_df.agg(
        F.min(value_col).cast("double"), F.max(value_col).cast("double")
    ).collect()[0]
    if lo is None or hi is None or hi <= lo:
        raise ValueError(f"{value_col} has no usable baseline range")
    width = bin_width if bin_width is not None else (hi - lo) / n_bins

    def binned(df: DataFrame) -> dict[int, int]:
        rows = (
            df.select(
                F.least(
                    F.greatest(
                        F.floor((F.col(value_col).cast("double") - lo) / width),
                        F.lit(0),
                    ),
                    F.lit(n_bins - 1),
                ).cast("int").alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {r.bin: r.n for r in rows if r.bin is not None}

    import math

    b, c = binned(base_df), binned(cur_df)
    tb, tc = sum(b.values()), sum(c.values())
    psi = 0.0
    for i in range(n_bins):
        p = max(b.get(i, 0) / tb, 1e-6)
        q = max(c.get(i, 0) / tc, 1e-6)
        psi += (q - p) * math.log(q / p)
    return {
        "psi": round(psi, 8),
        "drifted": psi > 0.2,
        "baseline_rows": tb,
        "current_rows": tc,
        "bins": n_bins,
    }
