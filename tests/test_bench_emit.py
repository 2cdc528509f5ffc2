"""bench._emit must print ONE JSON line that fits the driver's
2000-char stdout tail capture (the r3/r4 artifacts both front-truncated
into unparseable fragments), with the untrimmed result in a sidecar.
No Ray needed."""

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _capture_emit(out):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._emit(out)
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 1
    return lines[0]


def test_emit_small_passthrough():
    out = {"metric": "m", "value": 1.0, "unit": "sec", "queries": {"a": 0.5}}
    line = _capture_emit(out)
    assert json.loads(line) == out


def test_emit_oversized_fits_capture_and_keeps_sidecar(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "REPO", str(tmp_path))
    queries = {f"query_name_{i:04d}": 0.123456 + i * 0.013 for i in range(150)}
    out = {
        "metric": "cdc_replay_wall_sec", "value": 9.376, "unit": "sec",
        "queries": queries, "sf": "/x", "num_cpus": 32,
        "scaling": {"value": 1.038, "repeats_low": [1.0, 2.0, 3.0]},
    }
    line = _capture_emit(out)
    assert len(line) <= bench._CAPTURE_LIMIT
    d = json.loads(line)
    # headline fields survive intact
    assert d["metric"] == "cdc_replay_wall_sec" and d["value"] == 9.376
    assert d["scaling"]["value"] == 1.038
    # the SLOWEST walls survive (fastest drop first)
    kept = set(d["queries"])
    slowest = max(queries, key=queries.get)
    assert slowest in kept
    assert d["queries_omitted"] == len(queries) - len(kept) > 0
    # untrimmed sidecar
    full = json.load(open(tmp_path / "BENCH_full.json"))
    assert full["queries"].keys() == queries.keys()
