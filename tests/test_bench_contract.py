"""Driver-record size contract (round-13, after BENCH_r12.json landed
``parsed: null``): the driver captures only the last ~2,000 chars of
bench.py's stdout, and r12's hardened bench emitted a 4,170-char final
line — the round of record lost its headline total.  bench.py now
writes full diagnostics to BENCH_DETAIL.json and prints a COMPACT last
line; this test pins a fully-populated worst case under 1,800 chars so
the record can never silently outgrow the capture again.
"""

from __future__ import annotations

import json


def _worst_case_out():
    import bench

    all_q = list(bench.HEADLINE)
    extras = list(bench.EXTRAS) + list(bench.SERVE_EXTRAS) + [bench.STREAM_EXTRA]
    spot_q = (
        list(bench.SF1_SPOT_QUERIES)
        + [bench.STREAM_EXTRA]
        # the serve-path spots run last, wall permitting (r14)
        + ["admit_media_assets", "bm25_search_many_served"]
    )
    # worst realistic shapes: three-digit medians, several breaches
    # (all coload-annotated), full spot with anomalies + a skip note
    out = {
        "metric": "headline_queries_wall",
        "value": 123.456,
        "unit": "sec",
        "queries": {n: 123.456 for n in all_q},
        "extras": {n: 123.456 for n in extras},
        "runs": {n: [123.4, 123.5, 123.6] for n in all_q + extras},
        "loadavg": {n: [31.99, 31.98, 31.97] for n in all_q + extras},
        "loadavg_start": 31.99,
        "loadavg_end": 31.99,
        "cpus": 32,
        "budget_breaches": {
            n: {
                "median": 123.456,
                "best": 123.456,
                "budget": 99.9,
                "coload": True,
                "loadavg_at_best": 31.99,
            }
            for n in list(bench.BUDGETS)[:5]
        },
        "sf": 0.1,
        "sf1_spot": {
            "scale_multiple": 10,
            "queries": {n: 123.456 for n in spot_q},
            "ratio_vs_linear": {n: 12.34 for n in spot_q},
            "loadavg": {n: [31.99] for n in spot_q},
            "anomalies": spot_q[:4],
            "degraded": "sf0.1 phase took 999s (> 600s): reduced to headline-only spot set",
            "skipped_queries": [f"{bench.STREAM_EXTRA}: wall budget exhausted"],
        },
    }
    return out


def test_compact_record_fits_driver_capture():
    import bench

    rec = bench._compact_record(_worst_case_out())
    line = json.dumps(rec, separators=(",", ":"))
    assert len(line) < 1800, f"compact record {len(line)} chars (driver keeps 2000)"
    # the facts the round of record must carry survive compaction
    assert rec["value"] == 123.456
    assert set(rec["queries"]) == set(bench.HEADLINE)
    assert rec["budget_breaches"] and all(
        set(b) <= {"best", "budget", "coload"} for b in rec["budget_breaches"].values()
    )
    assert "ratio_vs_linear" in rec["sf1_spot"]
    assert "anomalies" in rec["sf1_spot"]
    # bulky diagnostics stay in the side file only
    assert "runs" not in rec and "loadavg" not in rec
    assert rec["detail"] == "BENCH_DETAIL.json"


def test_compact_record_sheds_before_overflow():
    """Even a pathological record (every budget breached) shrinks by
    shedding the lightest per-query medians, never the adjudication."""
    import bench

    out = _worst_case_out()
    out["budget_breaches"] = {
        n: {"median": 123.456, "best": 123.456, "budget": 99.9, "coload": True}
        for n in {**bench.BUDGETS, **bench.EXTRA_BUDGETS}
    }
    rec = bench._compact_record(out)
    line = json.dumps(rec, separators=(",", ":"))
    assert len(line) <= 1900
    # every breach survives (possibly in the terse [best, budget] form)
    assert set(rec["budget_breaches"]) == set({**bench.BUDGETS, **bench.EXTRA_BUDGETS})
    assert rec["sf1_spot"]["anomalies"]


class _FakeSpec:
    name = "fake"

    def __init__(self):
        self.calls = 0


def _scripted_time_once(seq):
    """Stand-in for bench._time_once returning a scripted run sequence."""
    it = iter(seq)

    def fake(spec, spark, sf_dir):
        spec.calls += 1
        return next(it)

    return fake


def test_time_query_settle_discards_session_warmup(monkeypatch):
    """r13 protocol: the first query of a session discards until the
    cold runs stop falling steeply (<=3 discards), so session-wide JVM
    warm-up cannot inflate the first median (the r13 mid-round bench
    recorded a 14.7s median for a 3.2s-warm query from exactly this)."""
    import bench

    # falling steeply twice (15.9 -> 6.1 -> 4.9), then warm runs
    monkeypatch.setattr(
        bench, "_time_once",
        _scripted_time_once([15.9, 6.1, 4.9, 3.1, 3.0, 3.2]),
    )
    spec = _FakeSpec()
    median, rs, _ = bench._time_query(spec, None, "sf", settle=True)
    assert bench.DISCARDS["fake"] == [15.9, 6.1, 4.9]  # 3 discards, capped
    assert rs == [3.1, 3.0, 3.2]
    assert median == 3.1

    # already-warm session: second discard is within 1.5x -> stop at 2
    monkeypatch.setattr(
        bench, "_time_once",
        _scripted_time_once([3.3, 3.1, 3.0, 3.1, 3.2]),
    )
    median, rs, _ = bench._time_query(_FakeSpec(), None, "sf", settle=True)
    assert bench.DISCARDS["fake"] == [3.3, 3.1]
    assert rs == [3.0, 3.1, 3.2]


def test_time_query_breach_earns_settle_runs(monkeypatch):
    """r13 protocol: a pending budget breach (every run above budget)
    earns up to 2 extra timed runs — transient host noise cannot
    manufacture a breach, a structural regression still breaches."""
    import bench

    # transient: first runs spike above the 7.5 budget, extras settle
    monkeypatch.setattr(
        bench, "_time_once",
        _scripted_time_once([9.0, 8.5, 8.1, 8.0, 4.0]),
    )
    median, rs, _ = bench._time_query(_FakeSpec(), None, "sf", budget=7.5)
    assert rs == [8.5, 8.1, 8.0, 4.0]  # stopped after the first sub-budget run
    assert min(rs) < 7.5  # breach cleared

    # structural: every run above budget -> exactly 2 extras, still breached
    monkeypatch.setattr(
        bench, "_time_once",
        _scripted_time_once([9.0, 8.5, 8.1, 8.0, 8.2, 8.3]),
    )
    median, rs, _ = bench._time_query(_FakeSpec(), None, "sf", budget=7.5)
    assert len(rs) == 5  # 3 base + 2 extras
    assert min(rs) > 7.5  # breach stands
