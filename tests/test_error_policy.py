"""Error-containment policy tests (the reference's fail-fast vs
keep-going gate, /root/reference/ir:500-506, 596-619) and merge-task
idempotence under Ray retries."""

from __future__ import annotations

import pyarrow as pa
import pytest

from image_report_ray.config import EngineConfig
from image_report_ray.pipelines.cdc import (
    apply_epoch,
    canonical_state_table,
    merge_partition_kernel,
    prepare_and_split,
)
from image_report_ray.stages.derive import ValidationError, validate_changes
from image_report_ray.state.manifest import Lake
from image_report_ray.state.merge import merge_state_with_changes


def _bad_batch() -> pa.Table:
    return pa.table(
        {
            "lsn": pa.array([1, None, 3], pa.int64()),
            "op": pa.array(["I", "I", "X"]),
            "conv_id": pa.array(["a", "b", "c"]),
            "turn_idx": pa.array([0, 0, 0], pa.int32()),
            "role": pa.array(["user"] * 3),
            "text": pa.array(["t1", "t2", "t3"]),
            "tool": pa.array([None, None, None], pa.string()),
            "ts": pa.array([None, None, None], pa.timestamp("us")),
        }
    )


def test_validate_fail_fast_raises():
    with pytest.raises(ValidationError, match="2 invalid"):
        validate_changes(_bad_batch(), continue_on_error=False)


def test_validate_keep_going_drops_and_keeps_valid():
    out = validate_changes(_bad_batch(), continue_on_error=True)
    assert out.num_rows == 1
    assert out.column("conv_id").to_pylist() == ["a"]


def test_pipeline_continue_on_error_end_to_end(ray_session, tmp_path):
    import pyarrow.parquet as pq

    p = str(tmp_path / "wal.parquet")
    pq.write_table(_bad_batch(), p)
    lake = Lake(str(tmp_path / "lake"), num_partitions=2)
    cfg = EngineConfig(num_partitions=2, continue_on_error=True)
    stats = apply_epoch(lake, 0, [p], cfg)
    assert sum(s.received for s in stats.values()) == 1
    state = canonical_state_table(lake)
    assert state.column("conv_id").to_pylist() == ["a"]


def test_pipeline_fail_fast_propagates(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray

    p = str(tmp_path / "wal.parquet")
    pq.write_table(_bad_batch(), p)
    lake = Lake(str(tmp_path / "lake"), num_partitions=2)
    cfg = EngineConfig(num_partitions=2, continue_on_error=False)
    with pytest.raises(ray.exceptions.RayTaskError):
        apply_epoch(lake, 0, [p], cfg)
    # nothing committed: the failed epoch left no visible state
    assert lake.committed_epochs() == []


def test_merge_kernel_idempotent_rewrite(tmp_path):
    """A Ray retry re-runs the whole merge task; the deterministic staged
    path + tmp/rename overwrite must produce identical bytes and stats."""
    from image_report_ray.sources.synth import gen_epoch

    t = gen_epoch(0, 500, seed=9, n_convs=25, max_turns=6, dup_rate=0.1)
    parts = list(prepare_and_split(t, 2))
    root = str(tmp_path)
    r1 = merge_partition_kernel(0, [parts[0]], None, -1, root, 0, 3)
    import pathlib

    path = pathlib.Path(root) / r1["file"]
    bytes1 = path.read_bytes()
    r2 = merge_partition_kernel(0, [parts[0]], None, -1, root, 0, 3)
    assert path.read_bytes() == bytes1
    for k in ("received", "applied", "rows_live", "digest", "last_lsn"):
        assert r1[k] == r2[k]
