"""Query plans: the driver-contract registry and the advertising view layer."""

from .registry import QUERY_SPECS, QuerySpec, queries, oracle_sql

__all__ = ["QUERY_SPECS", "QuerySpec", "queries", "oracle_sql"]
