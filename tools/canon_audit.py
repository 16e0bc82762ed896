"""Audit every oracle-bearing query for driver-canonicalization hazards.

The driver compares Spark vs DuckDB results *through pandas* (sort columns
by name, sort_values over rows, hash cell values).  Two hazard classes got
past the value-level driver_sim in round 4:

1. dtype drift — DuckDB returns HUGEINT for an uncast SUM(int); pandas
   widens that to float64, so ``1234.0`` hashes differently from Spark's
   int64 ``1234`` even though the values are equal.
2. unhashable cells — an ``array<...>`` output column makes the driver's
   ``sort_values`` throw ``unhashable type: 'list'``.

This tool replays BOTH engines into pandas and flags:
  * any list/ndarray-valued cell on either side,
  * numeric-kind mismatches (int vs float vs decimal object) per column,
  * any sort_values failure, the driver's actual crash mode.

Usage: python tools/canon_audit.py [query ...]   (default: all oracles)
"""
import sys
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .appName("canon-audit").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def kind(series: pd.Series) -> str:
    """Collapse a pandas dtype to the driver-visible hash kind."""
    k = series.dtype.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    if k == "O":
        vals = series.dropna()
        if len(vals) == 0:
            return "object(empty)"
        v = vals.iloc[0]
        if isinstance(v, (list, np.ndarray)):
            return "LIST"
        import decimal
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, str):
            return "str"
        return f"object({type(v).__name__})"
    return str(series.dtype)


def canon_check(df: pd.DataFrame, side: str, name: str) -> list[str]:
    issues = []
    for c in df.columns:
        k = kind(df[c])
        if k == "LIST":
            issues.append(f"{side}.{c}: LIST-valued (driver sort_values crashes)")
    try:
        df.sort_values(by=sorted(df.columns))
    except Exception as ex:
        issues.append(f"{side}: sort_values raised {type(ex).__name__}: {ex}")
    return issues


qs, osql = e.queries(), e.oracle_sql()
names = sys.argv[1:] or [n for n in qs if n in osql]
flagged = {}
for name in names:
    if name not in osql:
        print(f"{name}: no oracle, skipped", flush=True)
        continue
    issues = []
    try:
        sdf = qs[name](spark, SF).toPandas()
    except Exception as ex:
        flagged[name] = [f"spark raised {type(ex).__name__}: {ex}"]
        print(f"{name}: SPARK ERROR {ex}", flush=True)
        continue
    try:
        ddf = con.sql(osql[name]).df()
    except Exception as ex:
        flagged[name] = [f"oracle raised {type(ex).__name__}: {ex}"]
        print(f"{name}: ORACLE ERROR {ex}", flush=True)
        continue
    issues += canon_check(sdf, "spark", name)
    issues += canon_check(ddf, "duck", name)
    scols = {c.lower(): c for c in sdf.columns}
    dcols = {c.lower(): c for c in ddf.columns}
    if sorted(scols) != sorted(dcols):
        issues.append(f"column sets differ: spark={sorted(scols)} duck={sorted(dcols)}")
    else:
        for lc in scols:
            sk, dk = kind(sdf[scols[lc]]), kind(ddf[dcols[lc]])
            if sk != dk and {sk, dk} - {"object(empty)"}:
                # str vs object(empty) etc is fine only when one side empty
                if "object(empty)" in (sk, dk) or {sk, dk} == {"int", "bool"}:
                    pass
                else:
                    issues.append(f"col {lc}: kind spark={sk} duck={dk}")
    if issues:
        flagged[name] = issues
        print(f"{name}: " + "; ".join(issues), flush=True)
    else:
        print(f"{name}: clean ({len(sdf)} rows)", flush=True)

print(f"\nFLAGGED {len(flagged)}/{len(names)}:", flush=True)
for n, iss in flagged.items():
    print(f"  {n}: {iss}")
