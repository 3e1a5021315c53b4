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
