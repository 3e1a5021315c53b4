"""Unit checks for the benchmarking helpers (no Spark needed)."""

import json
import sys


def test_bw_at_reports_median_of_valid_readings(monkeypatch):
    """Round-6 advice: bw_at must not keep the MAX of its probe readings
    (upward bias on the attainable-speedup denominator) — it filters
    sub-10 GB/s transients, returns the median of the valid readings,
    and exposes the raw readings for the campaign JSON."""
    sys.path.insert(0, "/root/repo")
    import bench_scaling as bs

    canned = iter([2.1, 30.0, 70.0])

    class FakeOut:
        stdout = ""

    def fake_run(*_a, **_k):
        out = FakeOut()
        out.stdout = json.dumps({"width": 1, "bw_gbps": next(canned)})
        return out

    monkeypatch.setattr(bs.subprocess, "run", fake_run)
    v = bs.bw_at(1, tries=3)
    assert v == 50.0  # median of the two valid readings, not max 70
    assert bs.bw_at.last_readings == [2.1, 30.0, 70.0]


def test_bw_at_all_transient_returns_best_transient(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench_scaling as bs

    canned = iter([0.1, 2.0, 1.5])

    class FakeOut:
        stdout = ""

    def fake_run(*_a, **_k):
        out = FakeOut()
        out.stdout = json.dumps({"width": 1, "bw_gbps": next(canned)})
        return out

    monkeypatch.setattr(bs.subprocess, "run", fake_run)
    assert bs.bw_at(1, tries=3) == 2.0


def test_bench_quiet_gate(monkeypatch):
    """bench.wait_for_quiet: proceeds gated the moment the canary clears
    0.85x the (CPUS-scaled) floor, polls while it doesn't, and falls
    through ungated at the deadline — recording the last reading."""
    sys.path.insert(0, "/root/repo")
    import bench

    monkeypatch.setattr(bench, "CPUS", 32)
    monkeypatch.setattr(bench, "CANARY_FLOOR", 200.0)
    monkeypatch.setattr(bench.time, "sleep", lambda _s: None)

    readings = iter([120.0, 150.0, 180.0])  # third clears 0.85*200=170
    monkeypatch.setattr(bench, "canary_mips", lambda: next(readings))
    gated, canary, waits = bench.wait_for_quiet()
    assert (gated, canary, waits) == (True, 180.0, 2)

    # never quiet: bounded by the deadline, reports ungated + last canary
    monkeypatch.setattr(bench, "canary_mips", lambda: 100.0)
    t = iter([0.0, 1.0, 2.0, 999.0, 1000.0, 1001.0, 1002.0])
    monkeypatch.setattr(bench.time, "time", lambda: next(t))
    monkeypatch.setattr(bench, "QUIET_WAIT_SEC", 50.0)
    gated, canary, waits = bench.wait_for_quiet()
    assert gated is False and canary == 100.0
