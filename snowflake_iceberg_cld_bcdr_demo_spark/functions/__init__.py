"""Column-expression helpers (all JVM-side `pyspark.sql.functions`
compositions — no Python UDFs in any hot path)."""
