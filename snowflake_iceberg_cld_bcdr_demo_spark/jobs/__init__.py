"""Scheduled-job layer: the reference's stored procedures (F1-F4) and
task wrappers (F5) as plain Python jobs over the DataFrame API.

All reference Python is driver-side orchestration (SURVEY.md §2.9) — so
these are ordinary functions taking a SparkSession + catalog handles, not
UDFs; row-level work stays in Catalyst.
"""
