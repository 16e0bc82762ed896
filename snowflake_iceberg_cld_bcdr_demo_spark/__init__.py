"""PySpark-native analytics engine with the capabilities of the
``sfc-gh-smitchener-1/snowflake-iceberg-cld-bcdr-demo`` reference workload.

The reference is a Snowflake + Apache Iceberg BCDR demo: a seeded advertising
data generator, Iceberg ingestion into a shared catalog, a dual-catalog access
layer, an analytics view layer, scheduled sync/heartbeat/drift jobs, and a
validation corpus.  This package re-expresses all of that Spark-first:

- ``session``    — SparkSession factory (AQE on, UTC, dual-catalog config)
- ``sources``    — lakehouse catalog (snapshot-tracked parquet tables,
                   Iceberg-compatible API), typed readers, testdata loaders
- ``functions``  — scalar/text/vector column helpers (JVM-side exprs only)
- ``operators``  — dedup / similarity-search / text-analysis operators
- ``plans``      — the query registry (driver contract) + advertising views
- ``ads``        — the advertising star-schema engine (generator, views,
                   sync, heartbeat, drift, replication)
- ``streaming``  — scheduler with non-overlap semantics + incremental reads
"""

__version__ = "0.1.0"
