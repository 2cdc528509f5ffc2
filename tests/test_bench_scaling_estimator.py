"""run_scaling must report the per-leg MEDIAN, not best-of.

Best-of-N is robust only to slow outliers: one lucky fast sample on the
LOW leg divides the efficiency ratio down (measured 2026-08-18 — a
330k ev/s fluke against a 245-250k cluster at 2 cpus reported 0.739
where the median of the identical repeats was 0.881). These tests
replay that exact repeat pattern through run_scaling with the
subprocess legs canned. No Ray needed."""

import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_runner(samples_by_cpus):
    """subprocess.run stand-in feeding canned per-leg events_per_sec."""
    cursors = {c: iter(vals) for c, vals in samples_by_cpus.items()}

    def fake_run(cmd, **kwargs):
        cpus = int(cmd[cmd.index("--cpus") + 1])
        line = json.dumps(
            {"events_per_sec": next(cursors[cpus]), "events": 10_200_000}
        )
        return types.SimpleNamespace(returncode=0, stdout=line + "\n", stderr="")

    return fake_run


def test_median_ignores_fast_low_leg_outlier(monkeypatch):
    # the 2026-08-18 degraded-window repeats, verbatim
    low = [330157.5, 249180.0, 248262.4, 241995.6, 233342.3]
    high = [874823.6, 957253.5, 975520.7, 854344.9, 589862.3]
    monkeypatch.setattr(bench, "_ensure_scaling_wal", lambda: bench.SCALING_WAL)
    monkeypatch.setattr(
        bench.subprocess, "run", _fake_runner({2: low, 8: high})
    )
    out = bench.run_scaling(2, 8, repeats=3)
    # best-of over these repeats (+adaptive extras) reported 0.739;
    # the median lands at the healthy-window value with NO extras needed
    assert out["value"] >= 0.8, out
    assert out["events_per_sec_low"] == 249180.0  # median of 3, not 330157.5
    assert len(out["repeats_low"]) == 3  # healthy median -> no extras
    # every raw repeat stays visible
    assert out["repeats_low"][0] == 330157.5


def test_adaptive_extras_trigger_on_median(monkeypatch):
    # base repeats give median ratio < 0.82 -> two extra repeats per leg
    low = [250_000.0] * 5
    high = [700_000.0, 700_000.0, 700_000.0, 820_000.0, 830_000.0]
    monkeypatch.setattr(bench, "_ensure_scaling_wal", lambda: bench.SCALING_WAL)
    monkeypatch.setattr(
        bench.subprocess, "run", _fake_runner({2: low, 8: high})
    )
    out = bench.run_scaling(2, 8, repeats=3)
    assert len(out["repeats_low"]) == 5 and len(out["repeats_high"]) == 5
    assert out["events_per_sec_high"] == 700_000.0  # median of 5
    assert out["value"] == round(700_000.0 / (4 * 250_000.0), 3)
