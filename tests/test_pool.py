"""Warm stage-worker pool tests (stages/pool.py): one pool per session,
stage classes constructed once per actor and cached, reuse across
pipelines."""

from __future__ import annotations

import pyarrow as pa


def _token_stage():
    # defined inside a function so cloudpickle ships it by VALUE to the
    # pool actors (a module-level test class would need an import there)
    class TokenStage:
        def __init__(self, scale: int = 1) -> None:
            import time

            self.token = time.monotonic_ns()
            self.scale = scale

        def __call__(self, t: pa.Table) -> pa.Table:
            import numpy as np

            return pa.table(
                {
                    "x": pa.array(
                        t.column("x").to_numpy() * self.scale, pa.int64()
                    ),
                    "token": pa.array(
                        np.full(t.num_rows, self.token, np.int64)
                    ),
                }
            )

    return TokenStage


def test_pool_is_shared_and_stages_construct_once(ray_session):
    import ray

    from image_report_ray.stages.pool import gather_tables, pool_map, warm_pool

    p1 = warm_pool(2, 0.5)
    p2 = warm_pool(2, 0.5)
    assert [a._actor_id for a in p1] == [a._actor_id for a in p2]

    stage = _token_stage()
    block = ray.put(pa.table({"x": pa.array([1, 2, 3], pa.int64())}))
    a = gather_tables(pool_map(stage, [block], size=2, num_cpus=0.5,
                               batch_size=2))
    b = gather_tables(pool_map(stage, [block], size=2, num_cpus=0.5,
                               batch_size=2))
    # same actor, same cached instance -> same construction token
    assert set(a.column("token").to_pylist()) == set(b.column("token").to_pylist())
    assert a.column("x").to_pylist() == [1, 2, 3]


def test_pool_passes_none_through_chains(ray_session):
    import ray

    from image_report_ray.stages.pool import gather_tables, pool_map

    stage = _token_stage()
    empty = ray.put(pa.table({"x": pa.array([], pa.int64())}))
    refs = pool_map(stage, [empty], size=2, num_cpus=0.5, batch_size=2)
    # chain a second pool stage over the (None) outputs
    refs2 = pool_map(stage, refs, size=2, num_cpus=0.5, batch_size=2)
    assert gather_tables(refs2).num_rows == 0


def test_pool_rebuilds_after_cluster_restart_same_ids(ray_session):
    """A shutdown/init cycle kills the actors while a fresh local
    cluster may reuse the same job id — the cache must detect the dead
    pool (liveness ping) and rebuild instead of submitting into it."""
    import ray

    from image_report_ray.stages.pool import _POOLS, gather_tables, pool_map

    stage = _token_stage()
    block_t = pa.table({"x": pa.array([1, 2], pa.int64())})
    a = gather_tables(
        pool_map(stage, [ray.put(block_t)], size=2, num_cpus=0.5, batch_size=2)
    )
    assert a.num_rows == 2
    # simulate the failure mode without restarting the fixture cluster:
    # poison the cached entries with dead handles under the CURRENT key
    for key, (session, actors) in list(_POOLS.items()):
        for act in actors:
            ray.kill(act)
    b = gather_tables(
        pool_map(stage, [ray.put(block_t)], size=2, num_cpus=0.5, batch_size=2)
    )
    assert b.column("x").to_pylist() == [1, 2]


def test_pool_rebuilds_when_one_actor_dies(ray_session):
    """ADVICE r4: a SINGLE dead pooled actor (OOM/crash, not a cluster
    restart) must be detected by the all-actor liveness ping — waves
    routed round-robin would otherwise hit the corpse forever."""
    import ray

    from image_report_ray.stages.pool import (
        _POOLS,
        gather_tables,
        pool_map,
        warm_pool,
    )

    stage = _token_stage()
    block_t = pa.table({"x": pa.array([3, 4], pa.int64())})
    gather_tables(
        pool_map(stage, [ray.put(block_t)], size=2, num_cpus=0.5, batch_size=2)
    )
    actors = warm_pool(2, 0.5)
    ray.kill(actors[1])  # only ONE of the two dies
    rebuilt = warm_pool(2, 0.5)
    assert rebuilt[0] is not actors[0] or rebuilt[1] is not actors[1]
    out = gather_tables(
        pool_map(stage, [ray.put(block_t)] * 4, size=2, num_cpus=0.5, batch_size=2)
    )
    assert out.column("x").to_pylist() == [3, 4] * 4
