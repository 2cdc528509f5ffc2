"""The CDC pipeline: WAL tail -> hash-partitioned LWW upsert -> lake.

Engine lifecycle (SURVEY.md §3), one epoch::

    read_parquet(wal/epoch=K)                    # source (S1/S3: epoch order)
      .map_batches(validate_changes)             # contract checks
      .map_batches(compact_changes)              # pre-shuffle combiner (A2 partials)
      .map_batches(add_pid)                      # salt-aware hash routing
      .groupby(_pid).map_groups(merge_task)      # the ONLY shuffle; stateful merge
      -> per-partition state parquet (staged, deterministic names)
      -> lineage XML per partition               # the reference's report graft
      -> atomic commit manifest                  # exactly-once promotion

Scale notes (100 TB design): the shuffle key is a small integer pid with
P fixed, so the exchange is a bounded hash partition, never a global sort;
the combiner folds each batch to one row per key before the shuffle, so
the exchange moves O(distinct keys/epoch), not O(events); partition state
lives in committed Parquet files (merge-on-write per partition per epoch),
not in actor memory, so state size is bounded by disk, resume is free, and
any worker can merge any partition. Epochs stream through the Ray Data
streaming executor with backpressure; nothing materializes the full WAL.
"""

from __future__ import annotations

import json
import os
import re
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..schema import DELETED_COL, LSN_COL, PID_COL
from ..stages.derive import make_add_pid, validate_changes
from ..state.manifest import Lake
from ..state.merge import (
    ACCT_COLS,
    MergeStats,
    compact_changes,
    export_canonical,
    merge_state_with_changes,
    table_digest,
)
from ..xmlreport import build_partition_report, write_report

_EPOCH_DIR_RE = re.compile(r"^epoch=(\d+)$")


def discover_epochs(wal_dir: str) -> dict[int, list[str]]:
    """WAL source discovery: ``wal_dir/epoch=K/*.parquet`` in ascending
    epoch order (the reference's sorted-deterministic input discipline,
    /root/reference/ir:549-557)."""
    out: dict[int, list[str]] = {}
    if not os.path.isdir(wal_dir):
        return out
    for name in sorted(os.listdir(wal_dir)):
        m = _EPOCH_DIR_RE.match(name)
        if not m:
            continue
        epoch = int(m.group(1))
        d = os.path.join(wal_dir, name)
        files = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
        )
        if files:
            out[epoch] = files
    return dict(sorted(out.items()))


def _make_merge_task(
    lake_root: str,
    epoch: int,
    current_files: dict[int, str],
    checkpoints: dict[int, int],
    track_hot_keys: int,
):
    """Group-merge task: one invocation per partition present in the epoch.

    Reads the partition's committed state file, applies the (compacted)
    changes, writes the new state file under a deterministic staged name,
    and returns a one-row stats table. Side effects are idempotent: a Ray
    retry overwrites the same path via tmp+rename, and visibility waits
    for the driver's commit.
    """

    def merge_task(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pid = int(group.column(PID_COL)[0].as_py())
        changes = group.drop_columns([PID_COL])
        prior = pq.read_table(current_files[pid]) if pid in current_files else None
        prior_lsn = checkpoints.get(pid, -1)
        new_state, stats = merge_state_with_changes(
            prior, changes, prior_last_lsn=prior_lsn, track_hot_keys=track_hot_keys
        )
        digest = table_digest(new_state)

        rel = os.path.join("data", f"epoch={epoch:05d}", f"pid={pid:05d}.parquet")
        Lake.write_state_file(new_state, os.path.join(lake_root, rel))

        # Turn-index occupancy profile over live rows — the engine's
        # projection profile (/root/reference/analysis.py:107-108),
        # RLE-encoded into lineage by the driver.
        live_turns = new_state.filter(pc.invert(new_state.column(DELETED_COL))).column(
            "turn_idx"
        )
        tnp = live_turns.combine_chunks().to_numpy(zero_copy_only=False)
        profile = np.bincount(tnp, minlength=0).tolist() if len(tnp) else []

        duration = time.perf_counter() - t0
        row = {
            "pid": pid,
            "file": rel,
            "duration_sec": duration,
            "digest": digest,
            "turn_profile": json.dumps(profile),
            "hot_keys": json.dumps(stats.hot_keys),
            **{
                k: getattr(stats, k)
                for k in (
                    "received", "received_i", "received_u", "received_d",
                    "applied", "stale_skipped", "dup_skipped",
                    "rows_live", "tombstoned", "keys_total", "last_lsn",
                )
            },
        }
        return pa.Table.from_pylist([row])

    return merge_task


def apply_epoch(
    lake: Lake,
    epoch: int,
    wal: "str | list[str] | ray.data.Dataset",
    cfg: EngineConfig | None = None,
) -> dict[int, MergeStats] | None:
    """Apply one epoch exactly-once. Returns per-pid stats, or ``None`` if
    the epoch was already committed (idempotent redelivery, D1/S2)."""
    import ray.data as rd

    cfg = cfg or EngineConfig(num_partitions=lake.num_partitions)
    if lake.is_committed(epoch):
        return None

    if isinstance(wal, (str, list)):
        # partitioning=None: the WAL's epoch=K directory names are delivery
        # metadata, not data — hive inference must not inject an `epoch`
        # column into the changelog schema (it would masquerade as an
        # additive schema-evolution column downstream).
        ds = rd.read_parquet(wal, partitioning=None)
    else:
        ds = wal
    cont = cfg.continue_on_error
    ds = ds.map_batches(
        lambda t: validate_changes(t, continue_on_error=cont),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
    ds = ds.map_batches(compact_changes, batch_format="pyarrow", batch_size=cfg.batch_size)
    ds = ds.map_batches(
        make_add_pid(lake.num_partitions, lake.salt_keys, lake.salt_factor),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )

    merge_task = _make_merge_task(
        lake.root, epoch, lake.current_files(),
        {pid: e["last_lsn"] for pid, e in lake.current_entries().items()},
        track_hot_keys=3,
    )
    stats_rows = (
        ds.groupby(PID_COL).map_groups(merge_task, batch_format="pyarrow").take_all()
    )

    entries: dict[int, dict] = {}
    out_stats: dict[int, MergeStats] = {}
    for row in stats_rows:
        pid = int(row["pid"])
        stats = MergeStats(
            **{
                k: int(row[k])
                for k in (
                    "received", "received_i", "received_u", "received_d",
                    "applied", "stale_skipped", "dup_skipped",
                    "rows_live", "tombstoned", "keys_total", "last_lsn",
                )
            },
            hot_keys=[tuple(x) for x in json.loads(row["hot_keys"])],
        )
        out_stats[pid] = stats
        report = build_partition_report(
            pid=pid,
            epoch=epoch,
            stats=stats,
            digest=row["digest"],
            duration_sec=float(row["duration_sec"]),
            turn_profile=json.loads(row["turn_profile"]),
            params={
                "num_partitions": lake.num_partitions,
                "salt_factor": lake.salt_factor,
                "salted_keys": len(lake.salt_keys),
            },
        )
        write_report(report, lake.lineage_path(epoch, pid))
        entries[pid] = {
            "file": row["file"],
            "last_lsn": int(row["last_lsn"]),
            "rows_live": int(row["rows_live"]),
            "tombstoned": int(row["tombstoned"]),
            "keys_total": int(row["keys_total"]),
            "digest": row["digest"],
            "received": int(row["received"]),
            "applied": int(row["applied"]),
        }

    lake.commit(epoch, entries)
    return out_stats


def run_job(
    lake_dir: str,
    wal_dir: str,
    cfg: EngineConfig | None = None,
    *,
    salt_keys: frozenset[str] = frozenset(),
) -> dict:
    """Tail the whole WAL: apply every epoch in order, skipping committed
    ones (resume). Returns the run summary (events/s, counts) — the
    engine's version of the reference's end-of-run summary
    (/root/reference/ir:606-617)."""
    cfg = cfg or EngineConfig()
    lake = Lake(
        lake_dir,
        num_partitions=cfg.num_partitions,
        salt_keys=salt_keys,
        salt_factor=cfg.salt_factor,
    )
    epochs = discover_epochs(wal_dir)
    t0 = time.perf_counter()
    applied_epochs, skipped_epochs, events = 0, 0, 0
    for epoch, files in epochs.items():
        res = apply_epoch(lake, epoch, files, cfg)
        if res is None:
            skipped_epochs += 1
        else:
            applied_epochs += 1
            events += sum(s.received for s in res.values())
    dt = time.perf_counter() - t0
    return {
        "epochs_applied": applied_epochs,
        "epochs_skipped": skipped_epochs,
        "events_received": events,
        "duration_sec": dt,
        "events_per_sec": events / dt if dt > 0 else 0.0,
    }


# ---- canonical state export ------------------------------------------


def canonical_state_dataset(lake: Lake):
    """Streaming canonical view: live rows, payload columns only.

    No global sort — ordering is per-conversation and achieved at read
    time by the within-partition sort the merge wrote (O3's stable
    reading-order contract)."""
    import ray.data as rd

    files = sorted(lake.current_files().values())
    if not files:
        raise ValueError("lake has no committed state")
    ds = rd.read_parquet(files)

    def to_canonical(t: pa.Table) -> pa.Table:
        return export_canonical(t)

    return ds.map_batches(to_canonical, batch_format="pyarrow")


def canonical_state_table(lake: Lake) -> pa.Table:
    """Globally sorted canonical table — small-scale testing/export only
    (the oracle-equality comparison surface)."""
    files = sorted(lake.current_files().values())
    if not files:
        return pa.table({})
    tables = [export_canonical(pq.read_table(f)) for f in files]
    from ..schema import concat_evolving

    t = concat_evolving(tables)
    return t.take(
        pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )
