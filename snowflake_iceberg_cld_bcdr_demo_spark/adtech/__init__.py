"""Advertising-domain layer: the reference workload's data model —
schemas, seeded generator, view layer — re-expressed Spark-first.

Reference: `scripts/02_generate_iceberg_data.py` + `scripts/03_load_iceberg_aws.py`
(see SURVEY.md §1.3 and FIXTURES.md).
"""
