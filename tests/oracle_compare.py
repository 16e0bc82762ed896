"""Local replica of the driver's Spark-vs-DuckDB comparison: row count +
column names + order-insensitive stringified-value multiset."""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr(), exactly as the driver stringifies (tools/driver_sim.py):
        # 196.0 must NOT equal 196 — the r7 approx_percentile_audit bug
        # shipped because the old "%.9g" normalization hid the type skew.
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _type_class(v) -> str:
    """Coarse value-type class used to assert Spark and DuckDB agree on
    column TYPES, not just stringified values (int vs float is the class
    the hash comparison is most sensitive to)."""
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, dt.datetime):
        return "datetime"
    if isinstance(v, dt.date):
        return "date"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (list, tuple)):
        return "list"
    return type(v).__name__


def _column_classes(rows: list[tuple], ncols: int) -> list[str | None]:
    out: list[str | None] = [None] * ncols
    for r in rows:
        for i in range(ncols):
            if out[i] is None and r[i] is not None:
                out[i] = _type_class(r[i])
        if all(c is not None for c in out):
            break
    return out


def canonical(rows: list[tuple], columns: list[str]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    # type-class agreement per (name-sorted) column: a Spark DOUBLE vs
    # DuckDB BIGINT mismatch stringifies differently under the driver's
    # repr() hashing even when values are numerically equal.
    so = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
    do = sorted(range(len(d_cols)), key=lambda i: d_cols[i].lower())
    sc = _column_classes([tuple(r[i] for i in so) for r in s_rows], len(s_cols))
    dc = _column_classes([tuple(r[i] for i in do) for r in d_rows], len(d_cols))
    for k, (a, b) in enumerate(zip(sc, dc)):
        if a is not None and b is not None and a != b:
            col = sorted(c.lower() for c in s_cols)[k]
            return False, f"type class differs on '{col}': spark={a} duck={b}"
    cs = canonical(s_rows, [c.lower() for c in s_cols])
    cd = canonical(d_rows, [c.lower() for c in d_cols])
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"values differ; first diffs: {diffs}"
    return True, "ok"
