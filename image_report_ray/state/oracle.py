"""Naive single-process changelog applier — the golden oracle.

The engine's correctness story is randomized equivalence against a naive
reference implementation, the same technique the reference uses to validate
its vectorized neighbor-count kernel against an O(n^2) loop
(/root/reference/tests/test_hashing_config.py:12-39). This applier is a
plain Python dict keyed by ``(conv_id, turn_idx)``; events are applied in
ascending ``lsn`` order with last-writer-wins and tombstones; duplicate
``lsn`` deliveries for a key are ignored. The engine's final table must
equal its output bit-for-bit (per-turn text equality under stable
``(conv_id, turn_idx)`` ordering — the north-rule invariant).
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import KEY_COLUMNS


def apply_naive(changes: pa.Table) -> pa.Table:
    """Replay a whole changelog through a dict; return the canonical table.

    Payload columns = all columns except ``lsn``/``op``. Output is sorted by
    ``(conv_id, turn_idx)`` and contains live rows only.
    """
    payload_cols = [c for c in changes.column_names if c not in ("lsn", "op")]
    rows = changes.sort_by([("lsn", "ascending")]).to_pylist()

    state: dict[tuple, dict] = {}
    seen_lsn: dict[tuple, set[int]] = {}
    for row in rows:
        key = (row["conv_id"], row["turn_idx"])
        lsns = seen_lsn.setdefault(key, set())
        if row["lsn"] in lsns:
            continue  # duplicate delivery
        lsns.add(row["lsn"])
        if row["op"] == "D":
            state[key] = None  # tombstone (kept so later stale ops stay dead)
        else:
            state[key] = {c: row[c] for c in payload_cols}

    live = sorted((k, v) for k, v in state.items() if v is not None)
    schema = pa.schema([changes.schema.field(c) for c in payload_cols])
    if not live:
        return schema.empty_table()
    cols = {c: [v[c] for _, v in live] for c in payload_cols}
    return pa.Table.from_pydict(cols, schema=schema)
