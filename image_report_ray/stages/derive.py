"""Stateless pre-shuffle stages: validation and partition routing.

These are plain ``pa.Table -> pa.Table`` functions used via
``Dataset.map_batches(batch_format="pyarrow")`` — the engine analogue of
the reference's cheap per-record projections computed once and shared by
all downstream extractors (/root/reference/ir:334-335).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import PID_COL, VALID_OPS


class ValidationError(ValueError):
    """A change batch violates the changelog contract."""


def validate_changes(batch: pa.Table, *, continue_on_error: bool = False) -> pa.Table:
    """Contract checks on a raw change batch.

    ``lsn``/``op``/``conv_id``/``turn_idx`` must be non-null and ``op`` in
    {I, U, D}. Fail-fast raises (the reference's default exit-code policy,
    /root/reference/ir:596-619); ``continue_on_error`` drops offending rows
    instead (/root/reference/ir:500-506's keep-going mode).
    """
    required = ("lsn", "op", "conv_id", "turn_idx")
    ok = pa.array(np.ones(batch.num_rows, dtype=bool))
    for col in required:
        ok = pc.and_(ok, pc.is_valid(batch.column(col)))
    ok = pc.and_(ok, pc.is_in(batch.column("op"), value_set=pa.array(VALID_OPS)))
    n_bad = batch.num_rows - int(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
    if n_bad == 0:
        return batch
    if not continue_on_error:
        raise ValidationError(f"{n_bad} invalid change rows in batch")
    return batch.filter(ok)


def conv_hash(conv_ids: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized stable hash of conv_id strings.

    Dictionary-encodes the column (few unique conversations per batch) and
    crc32s each *unique* string once — crc32 is stable across platforms,
    Python versions and runs, which partition routing requires (resume must
    route a key to the same partition forever).
    """
    if isinstance(conv_ids, pa.ChunkedArray):
        conv_ids = conv_ids.combine_chunks()
    de = pc.dictionary_encode(conv_ids)
    uniques = de.dictionary.to_pylist()
    codes = de.indices.to_numpy(zero_copy_only=False)
    uhash = np.fromiter(
        (zlib.crc32(u.encode("utf-8")) for u in uniques), dtype=np.int64, count=len(uniques)
    )
    return uhash[codes]


def make_add_pid(
    num_partitions: int,
    salt_keys: frozenset[str] = frozenset(),
    salt_factor: int = 4,
):
    """Build the routing stage: ``pid = crc32(conv_id) % P``.

    Hot-conversation skew handling: conversations in ``salt_keys`` are
    salted by ``turn_idx % salt_factor`` so one huge conversation spreads
    over ``salt_factor`` partitions. Because the engine's merge key is
    ``(conv_id, turn_idx)`` the salted route is still per-key consistent —
    every version of a key lands in the same partition. The salt set is
    fixed at lake creation and persisted in the lake config, so routing is
    stable across epochs and resumes (a key's state row and its future
    updates must co-locate forever).
    """
    salt_list = sorted(salt_keys)

    def add_pid(batch: pa.Table) -> pa.Table:
        h = conv_hash(batch.column("conv_id"))
        if salt_list:
            turns = batch.column("turn_idx")
            if isinstance(turns, pa.ChunkedArray):
                turns = turns.combine_chunks()
            tnp = turns.to_numpy(zero_copy_only=False).astype(np.int64)
            hot = pc.is_in(batch.column("conv_id"), value_set=pa.array(salt_list))
            hot_np = hot.combine_chunks().to_numpy(zero_copy_only=False) if isinstance(hot, pa.ChunkedArray) else hot.to_numpy(zero_copy_only=False)
            salted = h + (tnp % salt_factor) * np.int64(0x9E3779B1)
            h = np.where(hot_np, salted, h)
        pid = (h % num_partitions).astype(np.int64)
        return batch.append_column(PID_COL, pa.array(pid))

    return add_pid
