#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and print ONE JSON line with per-query wall
seconds.

Each query executes through Spark's built-in ``noop`` sink, which
materializes every output column on the executors without collecting to
the driver — the closest local analog of a cluster job writing results.
(A plain ``count()`` would let Catalyst prune the computed columns and
under-measure map-heavy queries.)

Noise control: every query first runs ONCE UNTIMED (the cold run pays
JIT, codegen-compile and page-cache warm-up — r10's drift adjudication
traced every "regression" to cold-first medians), then is timed
``$SPARK_GRAFT_BENCH_RUNS`` times (default 3) and the MEDIAN is
reported; sub-second queries (where host noise is proportionally
largest) extend to median-of-5.  Per-run detail lands in the ``runs``
field.

Scale check: unless ``SPARK_GRAFT_SF1_SPOT=0``, the heaviest queries
also run ONCE at a deterministic 10x scale-up of sf0.1 (generated into
``.bench_sf1/`` on first use — no sf1 testdata ships) and the output
carries an ``sf1_spot`` section with the observed time over
10x-the-sf0.1-median ratio (1.0 = perfectly linear scaling).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
SF1_SPOT = os.environ.get("SPARK_GRAFT_SF1_SPOT", "1") != "0"
SF1_DIR = str(REPO / ".bench_sf1")
SF1_MULT = 10
#: skip the sf1 spot-check when the headline runs already consumed this
#: much wall clock — keeps the whole bench safely inside a 15-minute
#: harness timeout even on a noisy host
SF1_BUDGET_S = int(os.environ.get("SPARK_GRAFT_SF1_BUDGET_S", "420"))
T_START = time.perf_counter()

#: Headline set: the flagship + the heaviest relational shapes + one of
#: each pipeline family (dedup / similarity / text).
HEADLINE = [
    "order_performance",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "fanout_count_distinct",
    "minhash_near_dup_pairs",
    "ann_cosine_topk",
    "text_quality",
    "dedup_exact_groups",
    "window_topk_per_group",
    "asof_click_to_view",
    "corpus_pipeline_report",
    "stats_corr_by_flag",
    "session_window_rollup",
    "html_extract_stats",
    "resample_linear_daily",
    "winnow_shared_spans",
    "neardup_skewsafe_pairs",
    "dedup_block_removal",
]

#: Per-query wall-clock budgets (seconds, sf0.1 medians): ~3x the
#: round-8 recorded medians — generous enough for host noise, tight
#: enough that a structural regression (r7's winnow_shared_spans ran
#: 2.5-4x its median after a plan-shape change went unnoticed) lands in
#: ``budget_breaches`` of the bench JSON the same round it ships.
#: tests/test_bench_budget.py enforces the winnow budget in pytest.
BUDGETS = {
    "order_performance": 6.5,
    "q1_pricing_summary": 4.0,
    "q3_top_orders": 2.5,
    "q5_region_revenue": 3.0,
    "fanout_count_distinct": 5.5,
    "minhash_near_dup_pairs": 4.5,
    "ann_cosine_topk": 1.5,
    "text_quality": 1.2,
    "dedup_exact_groups": 0.8,
    "window_topk_per_group": 1.2,
    "asof_click_to_view": 1.5,
    "corpus_pipeline_report": 8.5,
    "stats_corr_by_flag": 4.0,
    "session_window_rollup": 2.0,
    "html_extract_stats": 1.5,
    "resample_linear_daily": 1.5,
    "winnow_shared_spans": 4.5,
    "neardup_skewsafe_pairs": 6.0,
    "dedup_block_removal": 4.5,
}

#: Extras: measured and budget-guarded but NOT part of the headline
#: total (the headline metric's composition is frozen across rounds so
#: round-over-round totals stay comparable).  curated_corpus_report is
#: the composed-pipeline flagship — its cost is the sum of its eleven
#: chained gates (r10 added ExactSubstr/PII/blocklist), so it gets its
#: own visibility row; curated_incremental_admit is the r10 daily
#: re-curation path.
EXTRAS = ["curated_corpus_report", "curated_incremental_admit"]
#: Streaming extra: the continuous-ingest flagship
#: (`streaming.curation.stream_curated_admission`) has no QuerySpec —
#: it is a PIPELINE with side effects (temp warehouse + checkpoint), so
#: it is measured ONCE end-to-end: build the admission index from a
#: third of the documents, then stream the other two thirds in as two
#: waves (wave 2 gating against wave 1's admissions through the
#: persisted state).  The measured window covers the two stream runs
#: only — state build is the ship-time cost the batch extras already
#: show.
STREAM_EXTRA = "stream_curated_admission_two_waves"

EXTRA_BUDGETS = {
    # ~2x the r10 recorded median (was a loose 30s placeholder in r9)
    "curated_corpus_report": 40.0,
    # ~2.5x the r11 measured two-wave wall (14.7 s, see BASELINE.md)
    STREAM_EXTRA: 35.0,
    # ~2x the measured median (~12-13 s warm).  The query runs the
    # STATE path: the admission index stages once per scale (ship-time
    # posture, memoized across builds) so run 1 pays the one-time build
    # (~35 s) and the median measures the DAILY admission cost; the
    # scrub chain is lineage-cut so ES/boiler evaluate once, not once
    # per downstream gate (was ~22 s warm before the cut; the 10 s
    # first guess predated any real bench run and breached immediately).
    "curated_incremental_admit": 25.0,
}

#: sf1 spot-check set: the most expensive headline queries, plus the
#: curated pipeline (the single most expensive certified query — its
#: superlinear risk must be measured, not assumed).
SF1_SPOT_QUERIES = [
    "order_performance",
    "minhash_near_dup_pairs",
    "corpus_pipeline_report",
    "fanout_count_distinct",
    "q1_pricing_summary",
    "winnow_shared_spans",
    "neardup_skewsafe_pairs",
    "curated_corpus_report",
    "curated_incremental_admit",
]

#: queries whose FIRST build at a scale pays a one-time ship cost (the
#: staged, memoized admission state): the spot warms them once untimed
#: so ratio_vs_linear measures the RECURRING daily cost — the quantity
#: that must scale — not the ship cost (visible separately as the
#: extras' cold first run at sf0.1).
SF1_WARM_FIRST = {"curated_incremental_admit"}


def _time_once(spec, spark, sf_dir: str) -> float:
    # drop any DataFrame a previous run left persisted (e.g. a query's
    # internal signature-matrix cache): repeat runs must measure the
    # PLAN, not a warm cache — JVM/JIT/page-cache warm-up may stay
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _time_query(spec, spark, sf_dir: str) -> tuple[float, list[float]]:
    """Discard one cold run, then median of RUNS timed runs — extended
    to median-of-5 when the query is sub-second (noise is
    proportionally largest there)."""
    _time_once(spec, spark, sf_dir)  # cold discard: JIT/codegen/page cache
    rs = [_time_once(spec, spark, sf_dir) for _ in range(RUNS)]
    if statistics.median(rs) < 1.0 and len(rs) < 5:
        rs += [_time_once(spec, spark, sf_dir) for _ in range(5 - len(rs))]
    return round(statistics.median(rs), 3), rs


def _time_stream_admission(spark, sf_dir: str) -> float:
    """Two-wave streaming curated admission, end-to-end wall seconds.

    Setup (untimed): a corpus of every third document, its persisted
    admission index, and wave 1 landed as a parquet file.  Timed: stream
    run 1 (gates + admits wave 1, updates the index), land wave 2,
    stream run 2 (wave 2 gates against wave 1's admissions through the
    PERSISTED state — the cross-batch statefulness that makes this the
    production ingest shape).  Fresh warehouse + checkpoint per call, so
    repeat invocations measure work, not batch-id no-op replays."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from snowflake_iceberg_cld_bcdr_demo_spark.operators import corpus as corpus_ops
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.lakehouse import (
        LakehouseCatalog,
    )
    from snowflake_iceberg_cld_bcdr_demo_spark.sources.testdata import table
    from snowflake_iceberg_cld_bcdr_demo_spark.streaming import curation as C
    from snowflake_iceberg_cld_bcdr_demo_spark.streaming import events as S

    tmp = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        docs = table(spark, sf_dir, "documents").select("doc_id", "source", "text")
        corpus_docs = docs.filter(F.col("doc_id") % 3 == 0)
        sources = [r.source for r in docs.select("source").distinct().collect()]
        shares = {s: 1.0 / len(sources) for s in sources}
        cat = LakehouseCatalog(spark, os.path.join(tmp, "wh"), name="bench_stream")
        cat.create_table("db", "corpus", corpus_docs)
        C.save_admission_state(
            cat, "db", "adm",
            corpus_ops.admission_state(corpus_docs, F.lit(True), nb_top_frac=1.0),
        )
        src = os.path.join(tmp, "src")
        ckpt = os.path.join(tmp, "ckpt")
        schema = docs.schema
        docs.filter(F.col("doc_id") % 3 == 1).write.mode("append").parquet(src)

        def run_wave() -> None:
            C.stream_curated_admission(
                S.read_file_stream(spark, src, schema),
                cat, "db", "corpus", "adm", ckpt,
                token_budget=1_000_000_000, shares=shares,
            ).awaitTermination()

        t0 = time.perf_counter()
        run_wave()
        docs.filter(F.col("doc_id") % 3 == 2).write.mode("append").parquet(src)
        run_wave()
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    from snowflake_iceberg_cld_bcdr_demo_spark.plans import QUERY_SPECS
    from snowflake_iceberg_cld_bcdr_demo_spark.session import build_session

    spark = build_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so per-query numbers measure the
    # plans, not session startup.
    QUERY_SPECS["scalar_row_counts"].build(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        timings[name], runs[name] = _time_query(QUERY_SPECS[name], spark, SF_DIR)
        print(
            f"# {name}: median {timings[name]:.3f}s of {runs[name]}",
            file=sys.stderr,
        )

    extras: dict[str, float] = {}
    for name in EXTRAS:
        # the cold discard also absorbs the admit's one-time staged
        # state build, so the median measures the recurring daily cost
        extras[name], rs = _time_query(QUERY_SPECS[name], spark, SF_DIR)
        print(f"# extra {name}: median {extras[name]:.3f}s of {rs}", file=sys.stderr)

    extras[STREAM_EXTRA] = _time_stream_admission(spark, SF_DIR)
    print(f"# extra {STREAM_EXTRA}: {extras[STREAM_EXTRA]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    breaches = {
        n: {"median": timings[n], "budget": BUDGETS[n]}
        for n in timings
        if n in BUDGETS and timings[n] > BUDGETS[n]
    }
    breaches.update(
        {
            n: {"median": extras[n], "budget": EXTRA_BUDGETS[n]}
            for n in extras
            if n in EXTRA_BUDGETS and extras[n] > EXTRA_BUDGETS[n]
        }
    )
    for n, b in breaches.items():
        print(f"# BUDGET BREACH {n}: {b['median']}s > {b['budget']}s", file=sys.stderr)
    out = {
        "metric": "headline_queries_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extras": extras,
        "runs": runs,
        "budget_breaches": breaches,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    elapsed = time.perf_counter() - T_START
    if SF1_SPOT and elapsed > SF1_BUDGET_S:
        out["sf1_spot"] = {
            "skipped": f"headline runs took {elapsed:.0f}s (> {SF1_BUDGET_S}s budget)"
        }
    elif SF1_SPOT:
        try:
            if not os.path.exists(os.path.join(SF1_DIR, "lineitem.parquet")):
                print(f"# generating {SF1_MULT}x scale-up -> {SF1_DIR}", file=sys.stderr)
                sys.path.insert(0, str(REPO / "tools"))
                from make_scaled_sf import make_scaled

                make_scaled(spark, SF_DIR, SF1_DIR, mult=SF1_MULT)
            spot: dict[str, float] = {}
            ratio: dict[str, float] = {}
            for name in SF1_SPOT_QUERIES:
                if name in SF1_WARM_FIRST:
                    _time_once(QUERY_SPECS[name], spark, SF1_DIR)
                spot[name] = _time_once(QUERY_SPECS[name], spark, SF1_DIR)
                # floor the base at the timer resolution: a legitimate
                # 0.000 median (sub-ms query) must not divide by ~0 and
                # flag a false anomaly (extras carry their own medians)
                base = max(timings.get(name, extras.get(name, 0.0)), 0.001)
                ratio[name] = round(spot[name] / (SF1_MULT * base), 2)
                print(
                    f"# sf1_spot {name}: {spot[name]:.3f}s "
                    f"({ratio[name]:.2f}x of linear)",
                    file=sys.stderr,
                )
            # streaming spot runs LAST and only when wall budget
            # remains (a two-wave sf1 ingest is minutes); a skip is
            # recorded, and BASELINE.md carries a measured number
            stream_skip = None
            if time.perf_counter() - T_START <= SF1_BUDGET_S:
                spot[STREAM_EXTRA] = _time_stream_admission(spark, SF1_DIR)
                base = max(extras.get(STREAM_EXTRA, 0.0), 0.001)
                ratio[STREAM_EXTRA] = round(spot[STREAM_EXTRA] / (SF1_MULT * base), 2)
                print(
                    f"# sf1_spot {STREAM_EXTRA}: {spot[STREAM_EXTRA]:.3f}s "
                    f"({ratio[STREAM_EXTRA]:.2f}x of linear)",
                    file=sys.stderr,
                )
            else:
                stream_skip = f"{STREAM_EXTRA}: wall budget exhausted"
            out["sf1_spot"] = {
                "scale_multiple": SF1_MULT,
                "queries": spot,
                "ratio_vs_linear": ratio,
                "anomalies": [n for n, r in ratio.items() if r > 3.0],
            }
            if stream_skip:
                out["sf1_spot"]["skipped_queries"] = [stream_skip]
        except Exception as ex:  # spot-check is best-effort; never break bench
            out["sf1_spot"] = {"error": f"{type(ex).__name__}: {ex}"}
            print(f"# sf1_spot failed: {ex}", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
