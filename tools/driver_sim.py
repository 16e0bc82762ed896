"""Simulate the driver: plain SparkSession, entry() smoke, all queries()
vs oracle_sql() at sf0.01 via DuckDB, like CORRECTNESS_r{N}.json."""
import sys, time, math, datetime as dt
sys.path.insert(0, "/root/repo")
import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print(f"ENTRY OK: {len(rows)} rows, schema={[f.name for f in df.schema.fields]}", flush=True)

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, (dt.datetime, dt.date)): return v.isoformat()
    return str(v)

qs, osql = e.queries(), e.oracle_sql()
if len(sys.argv) > 1:  # optional: check only the named queries
    qs = {n: b for n, b in qs.items() if n in sys.argv[1:]}
fails = []
for name, build in qs.items():
    t0 = time.time()
    sdf = build(spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    if name not in osql:
        print(f"{name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)", flush=True)
        continue
    rel = con.sql(osql[name]); dcols = [c.lower() for c in rel.columns]; drows = rel.fetchall()
    status = "OK"
    if sorted(scols) != sorted(dcols):
        status = f"COLS spark={sorted(scols)} duck={sorted(dcols)}"
    elif len(srows) != len(drows):
        status = f"ROWS spark={len(srows)} duck={len(drows)}"
    else:
        o1 = sorted(range(len(scols)), key=lambda i: scols[i])
        o2 = sorted(range(len(dcols)), key=lambda i: dcols[i])
        c1 = sorted(tuple(norm(r[i]) for i in o1) for r in srows)
        c2 = sorted(tuple(norm(r[i]) for i in o2) for r in drows)
        if c1 != c2:
            diffs = [(a,b) for a,b in zip(c1,c2) if a!=b][:2]
            status = f"VALUES {diffs}"
    if status != "OK": fails.append(name)
    print(f"{name}: {status} ({len(srows)} rows, {time.time()-t0:.1f}s)", flush=True)

print(f"\nRESULT: {len(qs)-len(fails)}/{len(qs)} ok; fails={fails}", flush=True)
