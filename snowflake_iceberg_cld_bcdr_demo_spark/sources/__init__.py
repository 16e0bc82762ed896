"""Sources & sinks: lakehouse catalog, typed readers, testdata loaders."""

from .testdata import TESTDATA_TABLES, table

__all__ = ["TESTDATA_TABLES", "table"]
