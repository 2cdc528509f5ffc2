"""Last-writer-wins merge kernels — the engine's core operator.

Semantic ancestry: the reference's non-max suppression keeps the single
authoritative detection among overlapping candidates by processing them in
a deterministic sort order and suppressing the rest
(/root/reference/utils.py:270-319). Here "overlapping detections" become
conflicting versions of a key ``(conv_id, turn_idx)``: events are ordered
by ``lsn``, the max-lsn version wins, tombstones (``op == "D"``) suppress,
and duplicate ``lsn`` deliveries are dropped and *counted* (exactly-once
accounting, the analogue of the reference's input dedup at
/root/reference/ir:549-557).

Everything in this module is a pure ``pyarrow.Table -> pyarrow.Table``
function importable and testable without Ray (the reference's
library-surface discipline, SURVEY.md §3 entry point 3). Kernels are
vectorized: Arrow sort + numpy boundary/reduceat group ops; no Python
row loops.

LWW is associative given the total lsn order: the global winner of a key is
the winner among per-batch winners. That makes :func:`compact_changes` a
safe pre-shuffle combiner — it folds each batch down to one surviving event
per key while carrying exact per-op received counts, so the shuffle moves
O(keys) rows instead of O(events) and lineage ledgers stay exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schema import (
    DELETED_COL,
    KEY_COLUMNS,
    LSN_COL,
    SchemaEvolutionError,
    concat_evolving,
    conform,
    unify_additive,
)

# Combiner accounting columns (carried through the shuffle; see module doc).
SEEN_I, SEEN_U, SEEN_D, DUPS = "_seen_i", "_seen_u", "_seen_d", "_dups"
ACCT_COLS = (SEEN_I, SEEN_U, SEEN_D, DUPS)
SRC_COL = "_src"  # 0 = incoming event, 1 = existing state (wins lsn ties)


def _np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _key_codes(table: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Dense integer codes for conv_id plus turn_idx values."""
    conv = table.column("conv_id")
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    codes = pc.dictionary_encode(conv).indices.to_numpy(zero_copy_only=False)
    turns = _np(table.column("turn_idx"))
    return codes, turns


def _group_layout(table_sorted: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(group_starts, winner_indices) for a table sorted by key then lsn."""
    n = table_sorted.num_rows
    codes, turns = _key_codes(table_sorted)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    np.not_equal(codes[1:], codes[:-1], out=new_key[1:])
    np.logical_or(new_key[1:], turns[1:] != turns[:-1], out=new_key[1:])
    starts = np.flatnonzero(new_key)
    winners = np.concatenate([starts[1:] - 1, [n - 1]])
    return starts, winners


def _ensure_accounting(changes: pa.Table) -> pa.Table:
    """Attach per-op received counters to a raw (uncompacted) changelog."""
    if SEEN_I in changes.column_names:
        return changes
    op = changes.column("op")
    for name, code in ((SEEN_I, "I"), (SEEN_U, "U"), (SEEN_D, "D")):
        flag = pc.cast(pc.equal(op, code), pa.int64())
        changes = changes.append_column(name, flag)
    return changes.append_column(
        DUPS, pa.nulls(changes.num_rows, pa.int64()).fill_null(0)
    )


def compact_changes(changes: pa.Table) -> pa.Table:
    """Pre-shuffle combiner: one surviving event per key, exact accounting.

    Keeps, per ``(conv_id, turn_idx)``, the event with the greatest ``lsn``;
    drops duplicate-lsn deliveries (counted into ``_dups``); folds the
    superseded events' op counts into the survivor's ``_seen_*`` columns.
    Idempotent: re-compacting compacted output is a no-op.
    """
    if changes.num_rows == 0:
        return _ensure_accounting(changes)
    changes = _ensure_accounting(changes)
    # Grouping via numpy lexsort over dictionary CODES (first-appearance
    # order, not lexicographic — compaction only needs keys contiguous,
    # and the final state sort in merge_state_with_changes restores the
    # lexicographic contract). ~40% cheaper than an Arrow multi-key string
    # sort + full-table take: only the winner rows are materialized.
    codes, turns = _key_codes(changes)
    lsn = _np(changes.column("lsn"))
    order = np.lexsort((lsn, turns, codes))
    c, t_, l = codes[order], turns[order], lsn[order]
    n = len(c)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    np.not_equal(c[1:], c[:-1], out=new_key[1:])
    np.logical_or(new_key[1:], t_[1:] != t_[:-1], out=new_key[1:])
    starts = np.flatnonzero(new_key)
    winners = np.concatenate([starts[1:] - 1, [n - 1]])
    # Duplicate lsn within a key: consecutive rows with equal (key, lsn).
    dup_mask = np.zeros(n, dtype=bool)
    dup_mask[1:] = (~new_key[1:]) & (l[1:] == l[:-1])

    out_cols: dict[str, pa.Array] = {}
    for name in ACCT_COLS:
        vals = _np(changes.column(name)).astype(np.int64, copy=False)[order]
        if name == DUPS:
            # a duplicate delivery IS received (counted under its op);
            # _dups additionally records how many of those were dups
            vals = vals + dup_mask
        out_cols[name] = pa.array(np.add.reduceat(vals, starts), type=pa.int64())

    winner_tbl = changes.take(pa.array(order[winners]))
    for name in ACCT_COLS:
        i = winner_tbl.column_names.index(name)
        winner_tbl = winner_tbl.set_column(i, name, out_cols[name])
    return winner_tbl


@dataclass
class MergeStats:
    """Conservation ledger for one partition-epoch merge.

    Invariants (asserted by lineage validators, the graft of the v2
    conservation ledger /root/reference/docs/report-schema-v2.md:121-137):

    * ``received == applied + stale_skipped + dup_skipped``
    * ``rows_live + tombstoned == keys_total``
    """

    received: int = 0
    received_i: int = 0
    received_u: int = 0
    received_d: int = 0
    applied: int = 0
    stale_skipped: int = 0
    dup_skipped: int = 0
    rows_live: int = 0
    tombstoned: int = 0
    keys_total: int = 0
    last_lsn: int = -1
    hot_keys: list[tuple[str, int]] = field(default_factory=list)

    def check(self) -> None:
        assert self.received == self.applied + self.stale_skipped + self.dup_skipped, self
        assert self.rows_live + self.tombstoned == self.keys_total, self


def changes_to_state_rows(changes: pa.Table) -> pa.Table:
    """Project changelog rows to state layout: payload + _lsn + _deleted."""
    drop = [c for c in ("lsn", "op") if c in changes.column_names]
    payload = changes.drop_columns(drop)
    payload = payload.append_column(LSN_COL, changes.column("lsn").cast(pa.int64()))
    payload = payload.append_column(DELETED_COL, pc.equal(changes.column("op"), "D"))
    return payload


def merge_state_with_changes(
    state: pa.Table | None,
    changes: pa.Table,
    *,
    prior_last_lsn: int = -1,
    track_hot_keys: int = 0,
) -> tuple[pa.Table, MergeStats]:
    """Apply a compacted-or-raw change batch to a partition's state table.

    ``state`` layout: payload columns + ``_lsn`` + ``_deleted`` (tombstones
    retained — late or duplicate deliveries for a deleted key must not
    resurrect it). Ties on ``lsn`` between an incoming event and existing
    state resolve to state (the event is a re-delivery: skipped, counted).
    Schemas may differ additively (evolution: null-fill via unify).
    """
    stats = MergeStats(last_lsn=prior_last_lsn)
    changes = compact_changes(changes)

    seen_i = int(pc.sum(changes.column(SEEN_I)).as_py() or 0) if changes.num_rows else 0
    seen_u = int(pc.sum(changes.column(SEEN_U)).as_py() or 0) if changes.num_rows else 0
    seen_d = int(pc.sum(changes.column(SEEN_D)).as_py() or 0) if changes.num_rows else 0
    dup_in = int(pc.sum(changes.column(DUPS)).as_py() or 0) if changes.num_rows else 0
    stats.received_i, stats.received_u, stats.received_d = seen_i, seen_u, seen_d
    stats.received = seen_i + seen_u + seen_d
    stats.dup_skipped = dup_in

    if track_hot_keys and changes.num_rows:
        # Top-k hottest conversations by folded event count — the lineage
        # analogue of the reference's top-3 ranked candidates
        # (/root/reference/ir:86-97). Vectorized: Arrow hash-group-by +
        # sort, ties broken by conv_id descending (heapq.nlargest order).
        total = pc.add(
            pc.add(changes.column(SEEN_I), changes.column(SEEN_U)),
            changes.column(SEEN_D),
        )
        agg = pa.table({"conv_id": changes.column("conv_id"), "n": total}).group_by(
            "conv_id"
        ).aggregate([("n", "sum")])
        idx = pc.sort_indices(
            agg, sort_keys=[("n_sum", "descending"), ("conv_id", "descending")]
        )[:track_hot_keys]
        top = agg.take(idx)
        stats.hot_keys = list(
            zip(top.column("conv_id").to_pylist(),
                (int(x) for x in top.column("n_sum").to_pylist()))
        )

    incoming = changes_to_state_rows(
        changes.drop_columns([c for c in ACCT_COLS if c in changes.column_names])
    )
    if changes.num_rows:
        stats.last_lsn = max(prior_last_lsn, int(pc.max(changes.column("lsn")).as_py()))

    if state is None or state.num_rows == 0:
        merged_input = incoming
        src = np.zeros(incoming.num_rows, dtype=np.int8)
        target_schema = incoming.schema
    else:
        target_schema = unify_additive(state.schema, incoming.schema)
        state_c = conform(state, target_schema)
        incoming_c = conform(incoming, target_schema)
        merged_input = pa.concat_tables([incoming_c, state_c])
        src = np.concatenate(
            [np.zeros(incoming_c.num_rows, dtype=np.int8), np.ones(state_c.num_rows, dtype=np.int8)]
        )

    if merged_input.num_rows == 0:
        empty = merged_input
        stats.check()
        return empty, stats

    merged_input = merged_input.append_column(SRC_COL, pa.array(src))
    idx = pc.sort_indices(
        merged_input,
        sort_keys=[
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            (LSN_COL, "ascending"),
            (SRC_COL, "ascending"),  # state after events at equal lsn -> state wins
        ],
    )
    t = merged_input.take(idx)
    _, winners = _group_layout(t)

    win_src = _np(t.column(SRC_COL))[winners]
    applied_keys = int((win_src == 0).sum())

    new_state = t.take(pa.array(winners)).drop_columns([SRC_COL])
    deleted = _np(new_state.column(DELETED_COL))
    stats.keys_total = new_state.num_rows
    stats.tombstoned = int(deleted.sum())
    stats.rows_live = stats.keys_total - stats.tombstoned
    stats.applied = applied_keys
    stats.stale_skipped = stats.received - stats.dup_skipped - stats.applied
    stats.check()
    return new_state, stats


def fold_state_tables(tables: "list[pa.Table | None]") -> pa.Table | None:
    """LWW-fold state-layout tables (base + deltas, oldest first) into one.

    The read-side half of merge-on-read: each table already holds at most
    one row per key with its ``_lsn``/``_deleted`` metadata; the fold
    keeps, per key, the row with the greatest ``_lsn`` (ties — identical
    re-delivered content — resolve to the latest table). Schemas may
    differ additively."""
    tables = [t for t in tables if t is not None and t.num_rows]
    if not tables:
        return None
    if len(tables) == 1:
        return tables[0]
    target = unify_additive(*[t.schema for t in tables])
    conformed = [conform(t, target) for t in tables]
    src = np.concatenate(
        [np.full(t.num_rows, i, dtype=np.int32) for i, t in enumerate(conformed)]
    )
    merged = pa.concat_tables(conformed).append_column(SRC_COL, pa.array(src))
    idx = pc.sort_indices(
        merged,
        sort_keys=[
            ("conv_id", "ascending"),
            ("turn_idx", "ascending"),
            (LSN_COL, "ascending"),
            (SRC_COL, "ascending"),
        ],
    )
    t = merged.take(idx)
    _, winners = _group_layout(t)
    return t.take(pa.array(winners)).drop_columns([SRC_COL])


def export_canonical(state: pa.Table) -> pa.Table:
    """Canonical materialized table: live rows, payload columns only,
    sorted by ``(conv_id, turn_idx)`` — the stable-turn-ordering half of
    the north-rule invariant (deterministic reading order, the graft of
    /root/reference/analysis.py:68-70 and docs/report-schema-v2.md:93-96).
    """
    live = state.filter(pc.invert(state.column(DELETED_COL)))
    keep = [c for c in live.column_names if c not in (LSN_COL, DELETED_COL, SRC_COL, *ACCT_COLS)]
    live = live.select(keep)
    idx = pc.sort_indices(
        live, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return live.take(idx)


def table_digest(table: pa.Table, columns: list[str] | None = None) -> str:
    """Order-independent content digest of a table (merkle-style sketch).

    Per-row 64-bit hashes combined by (sum mod 2^64, xor, count) —
    commutative, so two partitions' digests can be compared without a
    global sort, and incremental maintenance (digest(A ∪ B) from digest
    components) is possible. Row hashing is polars ``hash_rows``
    (vectorized, C speed); the pandas object-hash fallback is ~20x slower
    on string columns. This is the distributed-equality sketch
    checkpointed per partition; bit-for-bit equality in tests still
    compares real bytes.
    """
    if columns is not None:
        table = table.select(columns)
    if table.num_rows == 0:
        return "0:0:0"
    try:
        import polars as pl

        h = pl.from_arrow(table).hash_rows(seed=0).to_numpy().astype(np.uint64)
    except ImportError:  # pragma: no cover - polars is in the base image
        import pandas as pd

        df = table.to_pandas(types_mapper=None)
        h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
    s = int(np.sum(h, dtype=np.uint64))
    x = int(np.bitwise_xor.reduce(h))
    return f"{s:016x}:{x:016x}:{len(h)}"
