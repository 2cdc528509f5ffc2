"""CLI contract tests (the reference's parse_args/test discipline,
/root/reference/tests/test_parse_args.py): validation errors exit, the
lifecycle commands compose, validate audits honestly."""

from __future__ import annotations

import json
import os

import pytest

from image_report_ray.cli import build_parser, cmd_gen, cmd_validate, main


def test_parser_rejects_bad_values():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["gen", "w", "--epoch-size", "0"])
    with pytest.raises(SystemExit):
        p.parse_args(["gen", "w", "--dup-rate", "1.5"])
    with pytest.raises(SystemExit):
        p.parse_args(["nonsense"])


def test_gen_run_validate_roundtrip(ray_session, tmp_path):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    assert main(["gen", wal, "--epochs", "2", "--epoch-size", "300",
                 "--conversations", "40", "--parts", "2"]) == 0
    assert main(["run", lake, wal, "--partitions", "4"]) == 0
    # resume is a no-op
    assert main(["run", lake, wal, "--partitions", "4"]) == 0
    assert main(["validate", lake]) == 0


def test_validate_detects_corruption(ray_session, tmp_path, capsys):
    wal = str(tmp_path / "wal")
    lake = str(tmp_path / "lake")
    main(["gen", wal, "--epochs", "1", "--epoch-size", "200",
          "--conversations", "20", "--parts", "1"])
    main(["run", lake, wal, "--partitions", "2"])
    capsys.readouterr()
    # corrupt one committed state file: drop a row
    import pyarrow.parquet as pq

    from image_report_ray.state.manifest import Lake

    lk = Lake(lake)
    pid, entry = next(iter(lk.current_entries().items()))
    path = os.path.join(lk.root, entry["file"])
    t = pq.read_table(path)
    pq.write_table(t.slice(1), path)
    assert main(["validate", lake]) == 1
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["problems"]
