"""Session-scoped warm actor pool for stateful batch stages.

``Dataset.map_batches(Cls, concurrency=N)`` spins a FRESH actor pool on
every execution — measured ~1.4 s of pool startup per query on this box
against ~26 ms of media compute, so a suite that runs several queries
over the same stateful stages pays the spin-up again and again. A real
deployment amortizes that cost in one long job; this module gives short
queries the same economics: ONE pool of generic stage workers per Ray
session (``warm_pool``), where each worker constructs a stage instance
the first time it sees the class (setup-once-per-actor, the map_batches
actor contract unchanged) and caches it for every later pipeline.

A single shared pool — rather than one pool per stage class — also
keeps the session's reserved CPU footprint constant (size x cpu_share)
no matter how many stage classes run: per-class pools would accumulate
reservations until the task pools starve, the chained-actor deadlock
documented in ``pipelines/multimodal.py``.

The pool is tagged with the Ray job id, so a ``ray.shutdown()`` /
``ray.init()`` cycle in the same process transparently rebuilds the
dead pool instead of calling into it.
"""

from __future__ import annotations

import pyarrow as pa

_POOLS: dict = {}
_ACTOR_CLS = None


class _StageWorker:
    """Generic pooled actor: constructs each stage class ONCE (first
    block it sees for that class) and applies it per block in
    ``batch_size`` slices — the memory-aware batch contract of the
    original map_batches shape."""

    def __init__(self) -> None:
        self._stages: dict = {}

    def apply(self, cls, kwargs, block, batch_size: int, drop_cols=None):
        # None rides through chained pool stages (an upstream empty block)
        if block is None or block.num_rows == 0:
            return None
        key = (
            cls.__module__,
            cls.__qualname__,
            tuple(sorted((kwargs or {}).items())),
        )
        fn = self._stages.get(key)
        if fn is None:
            fn = self._stages[key] = cls(**(kwargs or {}))
        outs = []
        for i in range(0, block.num_rows, batch_size):
            t = fn(block.slice(i, batch_size))
            if drop_cols:
                t = t.drop_columns(list(drop_cols))
            outs.append(t)
        return pa.concat_tables(outs, promote_options="default")


def warm_pool(size: int, num_cpus: float) -> list:
    """The session's shared stage-worker pool — created on first use,
    reused for every later stage/pipeline with the same shape.

    Staleness guard: a ``ray.shutdown()``/``ray.init()`` cycle in the
    same process kills the actors, and a fresh LOCAL cluster restarts
    job-id numbering at the same value — so the cache key is
    (node id, job id) AND a cached pool answers a liveness ping before
    being reused; a dead pool rebuilds transparently."""
    global _ACTOR_CLS
    import ray

    ctx = ray.get_runtime_context()
    session = (ctx.get_node_id(), ctx.get_job_id())
    key = (size, num_cpus)
    cached = _POOLS.get(key)
    if cached is not None and cached[0] == session:
        try:
            # ping EVERY actor: a single dead worker (OOM/crash) would
            # otherwise fail each pool_map wave routed to it forever
            ray.get(
                [a.apply.remote(None, {}, None, 1) for a in cached[1]],
                timeout=10,
            )
            return cached[1]
        except Exception:
            pass  # actors died (e.g. cluster restarted on the same ids)
    if _ACTOR_CLS is None:
        _ACTOR_CLS = ray.remote(_StageWorker)
    actors = [
        _ACTOR_CLS.options(num_cpus=num_cpus).remote() for _ in range(size)
    ]
    _POOLS[key] = (session, actors)
    return actors


def pool_map(
    cls,
    block_refs: list,
    *,
    size: int,
    num_cpus: float,
    batch_size: int,
    drop_cols=None,
    ctor_kwargs: dict | None = None,
) -> list:
    """Round-robin the block refs over the warm pool; returns one output
    ref per input block (``None`` results filtered by
    :func:`gather_tables`)."""
    pool = warm_pool(size, num_cpus)
    return [
        pool[i % len(pool)].apply.remote(
            cls, ctor_kwargs or {}, r, batch_size, drop_cols
        )
        for i, r in enumerate(block_refs)
    ]


def gather_tables(refs: list) -> pa.Table:
    import ray

    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs, promote_options="default").combine_chunks()
