"""Unit tests for bench.py's stall/re-rep decision policy (VERDICT r6 #2).

The bench harness is a deliverable: a wrong policy misreports the engine by
4-10x (BENCH_r06). These pin the two trigger shapes against the real rep
lists that motivated them, without needing a SparkSession.
"""

from __future__ import annotations

import bench


def test_single_outlier_gets_exactly_one_confirmation_rep():
    # real shape: [1.44, 1.71, 5.2] — healthy median, one stalled rep
    times = [1.44, 1.71, 5.2]
    assert bench.needs_rerep(times, extra=0)
    times.append(1.5)  # confirmation rep comes back steady
    assert not bench.needs_rerep(times, extra=1)


def test_median_inflation_keeps_the_full_budget():
    # real shape (BENCH r7 validation run): cc_clusters [3.1, 7.4, 8.0] —
    # no rep trips 3x-of-min, but the median is 2.4x the demonstrated speed
    times = [3.1, 7.4, 8.0]
    assert bench.needs_rerep(times, extra=0)
    times.append(3.2)
    assert bench.needs_rerep(times, extra=1), "median still inflated"
    times.append(3.0)
    # median of [3.0, 3.1, 3.2, 7.4, 8.0] = 3.2 — re-anchored, stop
    assert not bench.needs_rerep(times, extra=2)


def test_steady_reps_never_rerep():
    assert not bench.needs_rerep([2.0, 2.1, 2.2], extra=0)


def test_tiny_query_jitter_is_not_a_stall():
    # 0.1 s-class query with 4x ratio but under the absolute floor
    assert not bench.needs_rerep([0.1, 0.12, 0.4], extra=0)
    assert not bench.is_stall(0.4, 0.1)


def test_budget_exhaustion_stops_rereps():
    assert not bench.needs_rerep([1.0, 9.0, 9.0, 9.0, 9.0, 9.0], extra=bench.EXTRA_REPS)


def test_stall_classification_matches_policy():
    assert bench.is_stall(7.0, 2.0)
    assert not bench.is_stall(5.9, 2.0)  # under 3x
    assert bench.median_of([3.0, 1.0, 2.0]) == 2.0
    assert bench.median_of([1.0, 2.0, 3.0, 4.0]) == 2.5


def test_subset_runs_write_a_separate_detail_file():
    """A SPARK_GRAFT_BENCH_ONLY run must not clobber or impersonate the
    full-registry BENCH_DETAIL record."""
    import bench

    assert bench.detail_file_and_metric(None) == (
        "BENCH_DETAIL.json",
        "headline_queries_total",
    )
    assert bench.detail_file_and_metric("") == (
        "BENCH_DETAIL.json",
        "headline_queries_total",
    )
    assert bench.detail_file_and_metric("dedup_exact") == (
        "BENCH_SUBSET.json",
        "subset_queries_total",
    )


def test_normalized_medians_divide_by_bracketing_probes():
    """VERDICT r9 #2b: each query's median divides by the mean of the two
    fixed-probe timings bracketing its run position, so a query recorded
    inside a degradation window (inflated probes around it) normalizes
    back to its steady-state ratio."""
    names = [f"q{i}" for i in range(12)]
    medians = {n: 2.0 for n in names}
    # probes: before q0, before q10, after the last query
    calibration = [0.2, 0.4, 0.4]
    norm = bench.normalized_medians(names, medians, calibration, 10)
    # q0..q9 bracketed by (0.2, 0.4) -> 2.0 / 0.3
    assert norm["q0"] == norm["q9"] == round(2.0 / 0.3, 2)
    # q10, q11 bracketed by (0.4, 0.4) -> 2.0 / 0.4
    assert norm["q10"] == norm["q11"] == 5.0
    # a query inside a 2x-degraded window with a 2x-inflated median
    # normalizes to the calm-window figure
    calm = bench.normalized_medians(["a"], {"a": 2.0}, [0.2, 0.2], 10)["a"]
    hot = bench.normalized_medians(["a"], {"a": 4.0}, [0.4, 0.4], 10)["a"]
    assert calm == hot


def test_normalized_medians_skip_missing_and_zero_cal():
    norm = bench.normalized_medians(["a", "b"], {"a": 1.0}, [0.0, 0.0], 10)
    assert norm == {}  # zero probes -> no ratio rather than a div-by-zero


def test_rotation_pick_least_recently_benched_first():
    """VERDICT r12 #5: never-benched queries (no ledger entry) outrank any
    benched one; among equals the name breaks ties deterministically; the
    pick is capped at n."""
    cands = ["e", "d", "c", "b", "a"]
    last = {"a": 3, "b": 1, "c": 2}
    # d, e never benched -> first (name order), then b (run 1), then c
    assert bench.rotation_pick(cands, last, n=4) == ["d", "e", "b", "c"]
    assert bench.rotation_pick(cands, last, n=2) == ["d", "e"]
    # empty ledger: pure name order
    assert bench.rotation_pick(cands, {}, n=3) == ["a", "b", "c"]


def _pin_trailing(monkeypatch, tmp_path, cal_list):
    """Point the ceiling computation at a synthetic canonical record."""
    import json

    if cal_list is not None:
        (tmp_path / "BENCH_DETAIL.json").write_text(
            json.dumps({"calibration": cal_list})
        )
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))


def test_calibration_ceiling_gate(monkeypatch, tmp_path):
    """VERDICT r14/r15: a full-registry run whose environment probe median
    exceeds the ceiling must park in the degraded sidecar instead of
    overwriting the canonical BENCH_DETAIL/ROTATION ledgers."""
    monkeypatch.delenv("SPARK_GRAFT_CAL_CEILING", raising=False)
    # no canonical record at all -> absolute fallback
    _pin_trailing(monkeypatch, tmp_path, None)
    assert bench.cal_ceiling() == bench.CAL_CEILING
    assert bench.is_degraded_window(0.32)
    assert not bench.is_degraded_window(0.31)  # at the ceiling is fine
    assert not bench.is_degraded_window(0.26)
    # explicit ceiling argument wins
    assert bench.is_degraded_window(0.28, ceiling=0.25)
    # env override, including 0 = disabled (deliberately loaded host)
    monkeypatch.setenv("SPARK_GRAFT_CAL_CEILING", "0.5")
    assert not bench.is_degraded_window(0.4)
    monkeypatch.setenv("SPARK_GRAFT_CAL_CEILING", "0")
    assert not bench.is_degraded_window(9.9)
    assert bench.DEGRADED_SIDECAR != bench.detail_file_and_metric(None)[0]
    # malformed/empty env must fall back to the computed ceiling instead of
    # raising a ValueError AFTER the 30-minute run and losing the record
    for bad in ("", "0,31", "abc"):
        monkeypatch.setenv("SPARK_GRAFT_CAL_CEILING", bad)
        assert bench.cal_ceiling() == bench.CAL_CEILING
        assert bench.is_degraded_window(0.32) and not bench.is_degraded_window(0.26)


def test_calibration_ceiling_tracks_trailing_canonical_floor(monkeypatch, tmp_path):
    """VERDICT r17 #3: the ceiling is CAL_CEILING_FACTOR x the probe median
    of the last canonical record, floored at the absolute CAL_CEILING — a
    2-5% host-floor drift (r17: 0.256 -> 0.29-0.32) must not park honest
    full runs for a whole round, while multi-x co-tenant windows still do."""
    monkeypatch.delenv("SPARK_GRAFT_CAL_CEILING", raising=False)
    # r17 shape: canonical floor 0.30 -> ceiling 0.375; the 0.32 drift run
    # that the absolute gate parked now qualifies, a 0.6 window still parks
    _pin_trailing(monkeypatch, tmp_path, [0.30, 0.30, 0.30])
    assert bench.cal_ceiling() == 0.375
    assert not bench.is_degraded_window(0.32)
    assert bench.is_degraded_window(0.6)
    # a FAST canonical floor never tightens the gate below the absolute
    # floor (a lucky 0.20 record must not start parking healthy 0.28 runs)
    (tmp_path / "BENCH_DETAIL.json").write_text('{"calibration": [0.2, 0.2, 0.2]}')
    assert bench.cal_ceiling() == bench.CAL_CEILING
    assert not bench.is_degraded_window(0.28)
    # unreadable / empty / non-numeric records fall back to the absolute
    for body in ("{not json", '{"calibration": []}', '{"calibration": ["x"]}'):
        (tmp_path / "BENCH_DETAIL.json").write_text(body)
        assert bench.cal_ceiling() == bench.CAL_CEILING
    # degenerate non-positive medians are rejected, not used
    (tmp_path / "BENCH_DETAIL.json").write_text('{"calibration": [0.0, 0.0]}')
    assert bench.cal_ceiling() == bench.CAL_CEILING


def test_calibration_ceiling_capped_against_ratchet(monkeypatch, tmp_path):
    """ADVICE r18 #3: the relative ceiling must not ratchet without bound.
    Each canonical run up to 1.25x the trailing record qualifies and
    becomes the new floor, so <=25%-per-round co-tenant drift could walk
    the gate up indefinitely; CAL_CEILING_MAX pins it. A slower genuine
    re-provision is an explicit env override, not a silent walk."""
    monkeypatch.delenv("SPARK_GRAFT_CAL_CEILING", raising=False)
    # a drifted-but-accepted 0.48 record would compute 0.6 uncapped
    _pin_trailing(monkeypatch, tmp_path, [0.48, 0.48, 0.48])
    assert bench.cal_ceiling() == bench.CAL_CEILING_MAX
    assert bench.is_degraded_window(0.55)
    # simulate the unbounded walk: every next record 1.24x the last —
    # the capped ceiling converges instead of growing round over round
    cal = 0.31
    for _ in range(10):
        cal = round(1.24 * cal, 3)
        _pin_trailing(monkeypatch, tmp_path, [cal] * 3)
        assert bench.cal_ceiling() <= bench.CAL_CEILING_MAX
    # records inside the healthy band are unaffected by the cap
    _pin_trailing(monkeypatch, tmp_path, [0.30, 0.30, 0.30])
    assert bench.cal_ceiling() == 0.375
    # the explicit override still wins above the cap (re-provisioned host)
    monkeypatch.setenv("SPARK_GRAFT_CAL_CEILING", "0.8")
    assert bench.cal_ceiling() == 0.8
