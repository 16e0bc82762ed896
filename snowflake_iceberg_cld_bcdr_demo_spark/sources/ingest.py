"""CSV/Parquet ingestion + export — the reference's loader surface.

Covers S1-S4 and S12 (SURVEY.md §2.1): the generator's CSV sink
(`02_generate_iceberg_data.py:332-335`), the loader's CSV scan with
declared-schema type coercion (`03_load_iceberg_aws.py:181-192`), the
Parquet conversion (`03:194`), and the stage export/import handoff the
drift job uses cross-account (`33_schema_sync_task.sql:528-540`).

Spark-first: the declared StructType is given to the CSV reader, so type
coercion happens inside the scan (one pass, no per-column cast chain) and
malformed rows surface via PERMISSIVE/FAILFAST mode instead of silently
truncating like a pandas ``astype`` would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .lakehouse import LakehouseCatalog


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """CSV sink (S1 — `02:332-335`)."""
    df.write.mode("overwrite").option("header", header).csv(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV scan with declared-schema coercion (S3 — `03:181-192`).

    ``FAILFAST`` mirrors the loader's intent (it validated and coerced
    every column explicitly); pass ``PERMISSIVE`` to quarantine bad rows
    via ``_corrupt_record`` instead."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", mode)
        .csv(path)
    )


def csv_to_lakehouse(
    spark: SparkSession,
    csv_path: str,
    schema: StructType,
    catalog: LakehouseCatalog,
    namespace: str,
    table: str,
    partition_by: list[str] | None = None,
) -> int:
    """The full 03-loader path (S3→S4→S5): CSV → typed DataFrame →
    partitioned lakehouse table.  Returns row count (the loader's
    post-create verification count, `03:262-268`)."""
    df = read_csv(spark, csv_path, schema)
    catalog.create_table(namespace, table, df, partition_by=partition_by, mode="overwrite")
    return catalog.load(namespace, table).count()


def export_stage(df: DataFrame, stage_path: str) -> None:
    """Stage export (S12 — `33:528-540`): CSV handoff directory shared
    between the two logical accounts."""
    df.write.mode("overwrite").option("header", True).csv(stage_path)


def import_stage(spark: SparkSession, stage_path: str, schema: StructType) -> DataFrame:
    """Stage import (S12) — schema-declared read of the handoff."""
    return read_csv(spark, stage_path, schema, mode="PERMISSIVE")
