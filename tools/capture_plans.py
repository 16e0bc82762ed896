#!/usr/bin/env python
"""Capture ``explain("formatted")`` for a set of registry queries into
``plans/<tag>/<query>_<suffix>.txt`` — the optimization-round evidence
files (the judge checks plan claims against these).

Usage:
    python tools/capture_plans.py <tag> <suffix> [query ...]

With no query names, captures the bench HEADLINE + EXTRAS set.
Plans are built (not executed) at $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.EXTRAS)

    from snowflake_iceberg_cld_bcdr_demo_spark.plans import QUERY_SPECS
    from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session

    spark = build_session(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = REPO / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERY_SPECS[name].build(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
