"""Changelog derivation from the driver's ``events`` table.

For the correctness gate the engine needs a changelog whose derivation is
expressible both as vectorized Arrow kernels (the Ray side) and as ANSI SQL
over the same parquet (the DuckDB oracle). Every expression below is pure
int64 / string arithmetic so both sides produce identical values:

* ``lsn      = event_id``
* ``op       = I/U/D by (event_id * 7919) % 10  (<6 / <9 / else)``
* ``conv_id  = 'c' || user_id``
* ``turn_idx = event_id % 8``
* ``role     = [user, assistant, assistant, tool][event_id % 4]``
* ``text     = props``            (NULL for D — tombstones carry no payload)
* ``tool     = event_type if role == 'tool'`` (NULL otherwise / for D)
* ``ts       = ts``               (NULL for D)

The matching SQL fragment lives in ``__ray_entry__.CHANGELOG_SQL``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ROLE_BY_MOD4 = ("user", "assistant", "assistant", "tool")


def events_to_changelog(batch: pa.Table, *, evolve_from_lsn: int | None = None) -> pa.Table:
    """Vectorized events -> change-events projection (see module doc).

    With ``evolve_from_lsn`` set, rows with ``lsn >= evolve_from_lsn`` also
    carry an additive ``meta = 'm' || lsn`` column (schema-evolution
    exercise); callers split the stream there so earlier batches genuinely
    lack the column.
    """
    eid = batch.column("event_id")
    if isinstance(eid, pa.ChunkedArray):
        eid = eid.combine_chunks()
    e = eid.to_numpy(zero_copy_only=False).astype(np.int64)

    h = (e * 7919) % 10
    op = np.full(len(e), "U", dtype="U1")
    op[h < 6] = "I"
    op[h >= 9] = "D"
    is_d = op == "D"

    uid = batch.column("user_id")
    if isinstance(uid, pa.ChunkedArray):
        uid = uid.combine_chunks()
    conv_id = np.char.add("c", uid.to_numpy(zero_copy_only=False).astype("U20"))

    turn_idx = (e % 8).astype(np.int32)
    role = np.array(ROLE_BY_MOD4)[(e % 4)]
    is_tool = role == "tool"

    props = batch.column("text") if "text" in batch.column_names else batch.column("props")
    etype = batch.column("event_type")
    ts = batch.column("ts")

    d_mask = pa.array(is_d)
    tool_null = pa.array(~(is_tool & ~is_d))

    out = {
        "lsn": pa.array(e, type=pa.int64()),
        "op": pa.array(op),
        "conv_id": pa.array(conv_id),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pc.if_else(d_mask, pa.nulls(len(e), pa.string()), pa.array(role)),
        "text": pc.if_else(d_mask, pa.nulls(len(e), pa.string()), props),
        "tool": pc.if_else(tool_null, pa.nulls(len(e), pa.string()), etype),
        "ts": pc.if_else(d_mask, pa.nulls(len(e), pa.timestamp("us")), ts),
    }
    t = pa.table(out)
    if evolve_from_lsn is not None:
        meta = np.char.add("m", e.astype("U20"))
        valid = (~is_d) & (e >= evolve_from_lsn)
        t = t.append_column(
            "meta", pc.if_else(pa.array(~valid), pa.nulls(len(e), pa.string()), pa.array(meta))
        )
    return t


def changelog_dataset(sf_dir: str, *, evolve_from_lsn: int | None = None):
    """events parquet -> streaming changelog Dataset (column-pruned read)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
    )
    return ds.map_batches(
        lambda t: events_to_changelog(t, evolve_from_lsn=evolve_from_lsn),
        batch_format="pyarrow",
    )


def max_event_id(sf_dir: str) -> int:
    """Cheap driver-side scalar from parquet row-group statistics."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    md = pq.read_metadata(path)
    mx = None
    for rg in range(md.num_row_groups):
        for ci in range(md.row_group(rg).num_columns):
            col = md.row_group(rg).column(ci)
            if col.path_in_schema != "event_id":
                continue
            if col.statistics is None or not col.statistics.has_min_max:
                mx = None
                break
            mx = col.statistics.max if mx is None else max(mx, col.statistics.max)
        if mx is None:
            break
    if mx is None:  # no usable stats: scan just the one column
        t = pq.read_table(path, columns=["event_id"])
        mx = pc.max(t.column("event_id")).as_py()
    return int(mx)
