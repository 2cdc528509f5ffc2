"""Logging idempotence (the reference's
tests/test_utils_logging.py:7-15 discipline) and malformed-WAL-file
reader policy."""

from __future__ import annotations

import logging

import pytest

from image_report_ray.logging_setup import setup_logging


def test_setup_logging_idempotent(tmp_path):
    log = logging.getLogger("image_report_ray_test_idem")
    f = str(tmp_path / "x.log")
    setup_logging(logging.INFO, logging.DEBUG, f, logger=log)
    n1 = len(log.handlers)
    setup_logging(logging.INFO, logging.DEBUG, f, logger=log)
    assert len(log.handlers) == n1  # no duplicates on re-init
    assert n1 == 2  # stream + file


def test_setup_logging_stream_only():
    log = logging.getLogger("image_report_ray_test_stream")
    setup_logging(logging.WARNING, logger=log)
    assert len(log.handlers) == 1
    assert log.handlers[0].level == logging.WARNING


def _write_wal_with_garbage(tmp_path):
    from image_report_ray.sources.synth import write_wal

    wal = str(tmp_path / "wal")
    write_wal(wal, n_epochs=1, epoch_size=300, seed=17, n_convs=20, max_turns=6)
    bad = tmp_path / "wal" / "epoch=00000" / "part-zzz.parquet"
    bad.write_bytes(b"this is not parquet at all")
    return wal


def test_malformed_wal_file_fail_fast(ray_session, tmp_path):
    import ray

    from image_report_ray.config import EngineConfig
    from image_report_ray.pipelines.cdc import run_job

    wal = _write_wal_with_garbage(tmp_path)
    with pytest.raises(ray.exceptions.RayTaskError):
        run_job(str(tmp_path / "lake"), wal, EngineConfig(num_partitions=2))


def test_malformed_wal_file_keep_going(ray_session, tmp_path):
    from image_report_ray.config import EngineConfig
    from image_report_ray.pipelines.cdc import canonical_state_table, run_job
    from image_report_ray.sources.synth import full_changelog
    from image_report_ray.state.manifest import Lake
    from image_report_ray.state.oracle import apply_naive

    wal = _write_wal_with_garbage(tmp_path)
    cfg = EngineConfig(num_partitions=2, continue_on_error=True)
    summary = run_job(str(tmp_path / "lake"), wal, cfg)
    assert summary["events_received"] == 300  # good file fully applied
    want = apply_naive(full_changelog(1, 300, seed=17, n_convs=20, max_turns=6))
    assert canonical_state_table(Lake(str(tmp_path / "lake"))).equals(want)


def test_jsonl_wal_replays_identically(ray_session, tmp_path):
    """A JSONL WAL (newline-delimited change events, ISO timestamps)
    replays to the exact same committed state as the equivalent Parquet
    WAL — the second supported source format."""
    import json as _json
    import os

    import pyarrow.parquet as pq

    from image_report_ray.config import EngineConfig
    from image_report_ray.pipelines.cdc import canonical_state_table, run_job
    from image_report_ray.sources.synth import write_wal
    from image_report_ray.state.manifest import Lake

    pq_wal = str(tmp_path / "wal_pq")
    paths = write_wal(pq_wal, n_epochs=2, epoch_size=300, seed=17,
                      n_convs=30, max_turns=6, dup_rate=0.05)

    # rewrite the same epochs as JSONL
    js_wal = str(tmp_path / "wal_js")
    for p in paths:
        epoch_dir = os.path.basename(os.path.dirname(p))
        d = os.path.join(js_wal, epoch_dir)
        os.makedirs(d, exist_ok=True)
        t = pq.read_table(p)
        out = os.path.join(
            d, os.path.basename(p).replace(".parquet", ".jsonl")
        )
        with open(out, "w") as f:
            for r in t.to_pylist():
                if r["ts"] is not None:
                    r["ts"] = r["ts"].isoformat()
                f.write(_json.dumps(r) + "\n")

    cfg = EngineConfig(num_partitions=4)
    run_job(str(tmp_path / "lake_pq"), pq_wal, cfg)
    run_job(str(tmp_path / "lake_js"), js_wal, cfg)
    a = canonical_state_table(Lake(str(tmp_path / "lake_pq")))
    b = canonical_state_table(Lake(str(tmp_path / "lake_js")))
    assert a.equals(b)
    assert a.num_rows > 0
