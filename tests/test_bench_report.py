"""Bench report invariants — no Spark needed.

Round 4's bench went unrecorded because the single output line (117
queries + spreads, ~7 KB) blew past the driver's bounded stdout tail.
The fix is structural: ``bench.summarize`` builds a short summary dict
that is printed LAST. These tests pin (a) the summary stays well under
2 KB at full registry width even with adversarially long names/values,
(b) it is valid JSON, and (c) cold/warm are reported per VERDICT r5
("report run-1 as cold and median-of-warm as warm").
"""

from __future__ import annotations

import json

import bench


def _fake_registry(n: int) -> tuple[dict, dict, dict]:
    # worst realistic case: every watch query present, long names for the
    # rest, large float values (xx.xxxx formats widest)
    names = list(bench.WATCH) + [
        f"synthetic_query_with_a_long_name_{i:03d}" for i in range(n - len(bench.WATCH))
    ]
    warm = {k: 99.1234 for k in names}
    cold = {k: 99.9876 for k in names}
    spread = {k: 12.3456 for k in names}
    return warm, cold, spread


def test_summary_line_parses_and_fits_driver_cap():
    warm, cold, spread = _fake_registry(180)  # headroom over today's 165
    endpoints = {
        f"get_discussions_by_a_long_route_{i}": {"cold": 99.1234, "warm": 0.000123}
        for i in range(5)
    }
    detail, summary = bench.summarize(
        warm, cold, spread, 0.1, 12.3456, endpoints=endpoints
    )
    line = json.dumps(summary)
    assert json.loads(line)["metric"] == "query_suite_wall_seconds"
    assert len(line) < 2048, f"summary line {len(line)}B >= 2KB driver cap"
    # detail carries the full per-query cold/warm/spread maps
    assert set(detail["queries"]) == set(warm)
    assert set(detail["cold"]) == set(cold)
    # the serving wire path is a first-class artifact (VERDICT r9 #7)
    assert summary["endpoints"] == endpoints and detail["endpoints"] == endpoints


def test_summary_reports_cold_and_store_build():
    warm = {"q_fast": 0.1, "q_fit_heavy": 0.2, "q_mid": 0.3}
    cold = {"q_fast": 0.12, "q_fit_heavy": 6.2, "q_mid": 1.3}
    detail, summary = bench.summarize(warm, cold, {}, 0.1, 3.5)
    assert summary["cold_total_sec"] == round(sum(cold.values()), 4)
    assert summary["store_build_sec"] == 3.5
    # worst cold-vs-warm offenders surface, cold≈warm queries don't
    assert "q_fit_heavy" in summary["cold_top"]
    assert "q_fast" not in summary["cold_top"]
    assert list(summary["cold_top"])[0] == "q_fit_heavy"  # sorted by delta
    assert detail["cold_total_sec"] == summary["cold_total_sec"]


def test_r01_subset_is_inclusion_pinned():
    warm = {"discussions_by_created": 1.0, "not_in_r1_set": 50.0}
    _, summary = bench.summarize(warm, dict(warm), {}, 0.1, 0.0)
    assert summary["r01_subset_sec"] == 1.0


def test_calibration_normalizes_machine_skew():
    """VERDICT r8 #1: the 2x acceptance gate must survive machine noise.
    A calibration reading 2x the pinned constant means the machine ran
    2x slow — the normalized subset halves; a fast machine (0.5x) doubles
    it; both raw and normalized are emitted so nothing is hidden."""
    warm = {"discussions_by_created": 10.0}
    for cal, expect in [
        (bench.CAL_PINNED_SEC, 10.0),          # reference machine: no-op
        (2 * bench.CAL_PINNED_SEC, 5.0),       # 2x-slow machine
        (0.5 * bench.CAL_PINNED_SEC, 20.0),    # 2x-fast machine
        (100 * bench.CAL_PINNED_SEC, 2.5),     # clamp: at most /4
        (0.0, 20.0),                           # clamp: at least /0.5
    ]:
        detail, summary = bench.summarize(warm, dict(warm), {}, 0.1, 0.0, cal)
        assert summary["r01_subset_sec"] == 10.0  # raw untouched
        assert summary["r01_subset_normalized_sec"] == expect
        assert detail["r01_subset_normalized_sec"] == expect
        assert summary["calibration_sec"] == cal
        assert summary["calibration_pinned_sec"] == bench.CAL_PINNED_SEC


def test_summary_schema_pins_calibration_fields():
    """The driver parses the LAST JSON line; these keys are the round-9
    contract BENCH_r09.json must carry (VERDICT r8 #1 'Done =')."""
    warm, cold, spread = _fake_registry(150)
    _, summary = bench.summarize(warm, cold, spread, 0.1, 1.0, 1.7)
    for key in (
        "r01_subset_sec",
        "r01_subset_normalized_sec",
        "calibration_sec",
        "calibration_pinned_sec",
    ):
        assert key in summary, key
    assert len(json.dumps(summary)) < 2048


def test_regression_gate_is_calibration_normalized():
    """r10 roadmap #4: the per-query 2x gate lives in the artifact,
    normalized by the same machine factor as the subset total. A 2x-slow
    machine (calibration 2x the pin) must NOT flag a query whose raw time
    merely doubled with the machine; a genuine 4x raw blowup still flags
    at ratio ~2 after normalization."""
    pinned = bench.R1_PER_QUERY["trending_tags"]  # 1.3916 — above the floor
    warm = {"trending_tags": 2 * pinned}
    # reference machine: raw 2x IS a regression... but exactly 2.0 is not
    # "> 2x"; nudge above
    gate = bench.regression_gate({"trending_tags": 2.01 * pinned}, 1.0)
    assert gate == {"trending_tags": 2.01}
    # 2x-slow machine: the same raw number normalizes back to 1.005x — clean
    assert bench.regression_gate({"trending_tags": 2.01 * pinned}, 2.0) == {}
    # raw 4.2x on the 2x-slow machine: still a genuine 2.1x regression
    assert bench.regression_gate({"trending_tags": 4.2 * pinned}, 2.0) == {
        "trending_tags": 2.1
    }
    # sub-floor queries never flag on ratio alone (0.0992 s pinned: 2.9x
    # is still < +0.1 s to the normalized time)
    assert bench.regression_gate({"text_token_counts": 0.19}, 1.0) == {}
    # unpinned names are ignored, absent names don't raise
    assert bench.regression_gate({"not_an_r1_query": 99.0}, 1.0) == {}
    del warm


def test_summary_regressions_bounded_detail_complete():
    """When every pinned query blows up (the adversarial registry times
    every query at 99 s), the SUMMARY line carries only the 5 worst so
    the driver cap holds, while the DETAIL artifact carries all of them."""
    warm, cold, spread = _fake_registry(150)
    detail, summary = bench.summarize(warm, cold, spread, 0.1, 1.0, 1.6)
    assert len(detail["regressions"]) == len(set(warm) & set(bench.R1_PER_QUERY))
    assert len(detail["regressions"]) > 5  # the cap below is actually binding
    assert len(summary["regressions"]) == 5
    # worst-first: the summary's 5 are the detail's first 5
    assert list(summary["regressions"]) == list(detail["regressions"])[:5]
    assert len(json.dumps(summary)) < 2048
    # a clean round reads regressions == {} in both artifacts
    clean = {k: v for k, v in bench.R1_PER_QUERY.items()}
    d2, s2 = bench.summarize(clean, dict(clean), {}, 0.1, 0.0, 1.6)
    assert d2["regressions"] == {} and s2["regressions"] == {}


def test_r01_subset_names_still_registered():
    """A renamed query would silently vanish from the round-over-round
    subtotal (the inclusion list keeps additions out, but can't notice
    deletions) — pin every anchor name to the live registry."""
    from distribution_engine_smt_spark.driver_queries import QUERIES

    missing = sorted(bench.R1_QUERIES - set(QUERIES))
    assert not missing, f"r01 anchor queries missing from registry: {missing}"
    watch_missing = sorted(set(bench.WATCH) - set(QUERIES))
    assert not watch_missing, f"watchlist names not registered: {watch_missing}"


def test_regression_recheck_separates_hiccup_from_plan():
    """VERDICT r10 #2: a provisional flag is only RECORDED if the query
    breaches again in its own re-measure window (best-of-3 + adjacent
    calibration). BENCH_r10 flagged two byte-unchanged plans because one
    calibration factor covered a drifting 4-minute suite."""
    pinned = bench.R1_PER_QUERY["trending_tags"]
    provisional = {"trending_tags": 2.3}
    # machine hiccup: the re-measure window reads a clean time
    clean_rc = {"trending_tags": {"warm": 1.1 * pinned, "cal": bench.CAL_PINNED_SEC}}
    assert bench.confirm_regressions(provisional, clean_rc) == {}
    # true regression: the re-measure still breaches -> recorded at the
    # re-measured ratio (the confirmation is the number of record)
    bad_rc = {"trending_tags": {"warm": 2.5 * pinned, "cal": bench.CAL_PINNED_SEC}}
    assert bench.confirm_regressions(provisional, bad_rc) == {"trending_tags": 2.5}
    # the re-measure window normalizes by ITS OWN calibration: a 2x-slow
    # window with a raw 2.5x reading normalizes to 1.25x -> clean
    slow_rc = {"trending_tags": {"warm": 2.5 * pinned, "cal": 2 * bench.CAL_PINNED_SEC}}
    assert bench.confirm_regressions(provisional, slow_rc) == {}
    # a flagged query that somehow got no recheck entry stays flagged
    # (fail shut, never silently dropped)
    assert bench.confirm_regressions(provisional, {}) == provisional
    # no recheck pass at all (recheck=None): provisional IS the record
    assert bench.confirm_regressions(provisional, None) == provisional
    assert bench.confirm_regressions({}, None) == {}


def test_summarize_records_provisional_and_recheck_in_detail():
    """The detail artifact must separate "plan regressed" from "machine
    hiccuped": provisional flags and their re-measure windows are both
    recorded even when the final regressions map is empty."""
    pinned = bench.R1_PER_QUERY["trending_tags"]
    warm = {"trending_tags": 2.4 * pinned}
    rc = {"trending_tags": {"warm": 1.0 * pinned, "cal": bench.CAL_PINNED_SEC}}
    detail, summary = bench.summarize(
        warm, dict(warm), {}, 0.1, 0.0, bench.CAL_PINNED_SEC, recheck=rc
    )
    assert summary["regressions"] == {}
    assert detail["regressions"] == {}
    assert detail["regressions_provisional"] == {"trending_tags": 2.4}
    assert detail["regression_recheck"] == rc


def test_summary_records_stores_prebuilt_and_r1_subset_guard():
    """VERDICT r11 'what's wrong' #1/#2 (roadmap #6): (a) the artifact
    labels whether store_build_sec paid a real build or inherited
    stores built earlier in the environment — so a 0.42 s no-op can't
    be misread as the cold-build price; (b) the pinned r1 subset must
    be a subset of the live registry, asserted loud at bench start."""
    warm, cold, spread = _fake_registry(150)
    detail, summary = bench.summarize(
        warm, cold, spread, 0.1, 1.0, 1.7, stores_prebuilt=True
    )
    assert summary["stores_prebuilt"] is True
    assert detail["stores_prebuilt"] is True
    _, summary2 = bench.summarize(warm, cold, spread, 0.1, 1.0, 1.7)
    assert summary2["stores_prebuilt"] is False  # default: not claimed
    assert len(json.dumps(summary)) < 2048
    # (b): the guard's premise — every pinned name registered
    import distribution_engine_smt_spark.pipeline  # noqa: F401
    from distribution_engine_smt_spark.driver_queries import QUERIES

    assert bench.R1_QUERIES <= set(QUERIES)


def test_endpoint_drive_list_covers_the_long_tail():
    """VERDICT r11 #7: the recursive (get_thread), semi-join (get_feed)
    and offset (get_account_history) wire paths are in the bench's
    endpoint drive list — pinned by source inspection so a refactor
    can't silently drop them."""
    import inspect

    src = inspect.getsource(bench.bench_endpoints)
    for route in ("get_thread", "get_feed", "get_account_history"):
        assert f'"{route}"' in src, route


def test_summary_endpoint_payload_degrades_under_the_cap():
    """The endpoint list grew to 9 entries in r12 (~300 B of headroom
    left); the summary must degrade deterministically (drop warm, then
    point at the detail artifact) instead of ever crossing the 2 KB
    driver cap — the round-4 unrecorded-bench failure mode."""
    warm, cold, spread = _fake_registry(180)
    endpoints = {
        f"get_some_long_route_name_number_{i:02d}": {
            "cold": 99.1234, "warm": 0.000123,
        }
        for i in range(40)  # adversarial: far more routes than today
    }
    detail, summary = bench.summarize(
        warm, cold, spread, 0.1, 12.3456, endpoints=endpoints
    )
    assert len(json.dumps(summary)) < 2048
    # detail always carries the full endpoint map
    assert detail["endpoints"] == endpoints
    # today's real width (9 entries) survives intact
    endpoints9 = {
        f"get_route_{i}": {"cold": 1.2345, "warm": 1e-05} for i in range(9)
    }
    _, summary9 = bench.summarize(
        warm, cold, spread, 0.1, 12.3456, endpoints=endpoints9
    )
    assert summary9["endpoints"] == endpoints9
    assert len(json.dumps(summary9)) < 2048


def test_detail_labels_memoized_queries():
    """VERDICT r12 #8: the detail artifact must carry a ``memoized`` list
    naming every registry query whose top-level callable is plan-memoized
    (their warm numbers measure execution only). Detail-only — the driver
    summary line must NOT grow (2 KB cap)."""
    import distribution_engine_smt_spark.pipeline  # noqa: F401
    from distribution_engine_smt_spark import driver_queries

    warm = {n: 0.1 for n in driver_queries.QUERIES}
    detail, summary = bench.summarize(warm, dict(warm), {}, 0.1, 1.0)
    assert "memoized" in detail and "memoized" not in summary
    memo = detail["memoized"]
    assert memo == sorted(memo)
    # ground truth: exactly the @memoize_df-wrapped registry callables
    expect = sorted(
        n
        for n, f in driver_queries.QUERIES.items()
        if getattr(f, "_memoized", False)
    )
    assert memo == expect
    # the flag rides the wrapper, so the list can't be empty while
    # memoize_df is in use (thread_tree et al. have been memoized
    # since r12)
    assert "thread_tree" in memo
