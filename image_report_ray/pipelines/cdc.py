"""The CDC pipeline: WAL tail -> hash-partitioned LWW upsert -> lake.

Engine lifecycle (SURVEY.md §3), one epoch::

    WAL files / changelog Dataset                  # source (S1/S3: epoch order)
      -> map stage (Ray tasks, one per ~map_task_rows of input):
           validate -> compact (combiner) -> route -> split into P sub-tables
           (returned as P+1 separate objects: P slices + a skip count)
      -> reduce stage (P Ray tasks): per-partition LWW merge against the
           committed prior state, staged Parquet write, stats row
      -> per-partition lineage XML                 # the reference's report graft
      -> atomic commit manifest                    # exactly-once promotion

Why raw Ray tasks for the exchange instead of ``Dataset.groupby``: the
epoch is a *transaction* — every merge must see exactly the prior epoch's
committed state, so each epoch ends at a commit barrier.  Under Ray Data's
streaming executor that barrier turns the sort-based ``groupby`` shuffle
into a serial choke point (the executor also reserves CPU slots per
operator, so a 4-operator pipeline at small CPU counts runs each phase
~2-wide; measured: 2->8 CPUs gave only 1.26x).  The two-stage object-store
exchange here is the textbook map/reduce shuffle — map tasks return P
slices (``num_returns=P``), reduce tasks consume one column of the ref
matrix — and measures 2.9x from 2->8 CPUs on the same input.  Dataset
remains the API for sources and stateless stages; a changelog Dataset is
accepted directly (its blocks feed the same split tasks).

Scale notes (100 TB design): the exchange moves O(distinct keys/epoch)
rows because the combiner folds each map task's input to one surviving
event per key before the split; partition state lives in committed Parquet,
not actor memory, so state is bounded by disk, resume is free, and any
worker can merge any partition. Two merge modes (``EngineConfig.merge_mode``):
``cow`` rewrites the partition's full state each epoch (rich per-epoch
ledger; cost O(state)); ``mor`` writes only the epoch's sorted delta and
folds the base+delta chain at read time, compacting every
``compact_every`` epochs (cost O(delta) — the 10^10-event path; measured
1.7x faster on a 40M-event / 12.8M-key replay). ``run_job`` keeps a
bounded lookahead of map stages in flight so epoch K+1 reads/compacts
while epoch K merges — the WAL never materializes fully.
"""

from __future__ import annotations

import json
import logging
import os
import re
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..config import EngineConfig
from ..schema import DELETED_COL, LSN_COL, PID_COL, concat_evolving
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

_STATS_FIELDS = (
    "received", "received_i", "received_u", "received_d",
    "applied", "stale_skipped", "dup_skipped",
    "rows_live", "tombstoned", "keys_total", "last_lsn",
)


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
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith((".parquet", ".jsonl", ".json"))
        )
        if files:
            out[epoch] = files
    return dict(sorted(out.items()))


# ---- pure kernels (importable & testable without Ray) -----------------


def _split_by_pid(
    t: pa.Table,
    num_partitions: int,
    salt_keys: frozenset[str] = frozenset(),
    salt_factor: int = 4,
) -> tuple[pa.Table, ...]:
    """Route rows by the conv hash and slice into P sub-tables — THE
    routing kernel, shared by the epoch map stage, reshard and
    bootstrap so migrated lakes route identically to live ingest."""
    t = make_add_pid(num_partitions, salt_keys, salt_factor)(t)
    pid = t.column(PID_COL)
    if isinstance(pid, pa.ChunkedArray):
        pid = pid.combine_chunks()
    pid_np = pid.to_numpy(zero_copy_only=False)
    order = np.argsort(pid_np, kind="stable")
    t = t.take(pa.array(order)).drop_columns([PID_COL])
    bounds = np.searchsorted(pid_np[order], np.arange(num_partitions + 1))
    return tuple(
        t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(num_partitions)
    )


def prepare_and_split(
    changes: pa.Table,
    num_partitions: int,
    salt_keys: frozenset[str] = frozenset(),
    salt_factor: int = 4,
    *,
    continue_on_error: bool = False,
) -> tuple[pa.Table, ...]:
    """validate -> compact (combiner) -> route -> split into P sub-tables.

    The map side of the exchange. Output slice ``i`` holds partition i's
    surviving events (payload + accounting columns, no pid column — the
    reducer knows its pid positionally)."""
    t = validate_changes(changes, continue_on_error=continue_on_error)
    t = compact_changes(t)
    return _split_by_pid(t, num_partitions, salt_keys, salt_factor)


def merge_partition_kernel(
    pid: int,
    parts: list[pa.Table],
    prior: pa.Table | None,
    prior_lsn: int,
    lake_root: str,
    epoch: int,
    track_hot_keys: int,
    metric_names: tuple[str, ...] = ("turn_profile", "lsn_span", "live_ratio"),
    view_names: tuple[str, ...] = (),
    prior_views: "dict[str, pa.Table] | None" = None,
    affected_extra: "np.ndarray | None" = None,
) -> dict | None:
    """The reduce side: apply one partition's change slices to its state.

    Writes the new state file under its deterministic staged name and
    returns a JSON-able stats row. Idempotent: a Ray retry overwrites the
    same path via tmp+rename, and visibility waits for the driver's commit
    (two-phase, manifest.py). Selected lineage metrics (the extractor
    registry, functions/metrics.py) run here over the post-merge state."""
    from ..functions.metrics import compute_metrics

    t0 = time.perf_counter()
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    changes = concat_evolving(parts)
    new_state, stats = merge_state_with_changes(
        prior, changes, prior_last_lsn=prior_lsn, track_hot_keys=track_hot_keys
    )
    digest = table_digest(new_state)

    rel = os.path.join("data", f"epoch={epoch:05d}", f"pid={pid:05d}.parquet")
    Lake.write_state_file(new_state, os.path.join(lake_root, rel))

    # materialized views: computed over the SAME post-merge state, staged
    # under deterministic names, published by the same commit — never
    # observable inconsistent with the state (state/views.py). With a
    # previous view file available, maintenance is INCREMENTAL: only the
    # conversations touched since that view's snapshot re-aggregate, the
    # rest carry forward — view cost scales with the delta, not the state.
    view_files: dict[str, str] = {}
    if view_names:
        from ..state.views import maintain_view

        affected = None
        if prior_views:
            conv = changes.column("conv_id")
            if isinstance(conv, pa.ChunkedArray):
                conv = conv.combine_chunks()
            aff = conv.to_numpy(zero_copy_only=False).astype(object)
            if affected_extra is not None and len(affected_extra):
                aff = np.concatenate([aff, affected_extra.astype(object)])
            affected = pa.array(np.unique(aff), pa.string())
        for vname in view_names:
            pv = (prior_views or {}).get(vname)
            vt = maintain_view(
                vname, new_state, pv, affected if pv is not None else None
            )
            vrel = os.path.join(
                "views", vname, f"epoch={epoch:05d}", f"pid={pid:05d}.parquet"
            )
            Lake.write_state_file(vt, os.path.join(lake_root, vrel))
            view_files[vname] = vrel

    m0 = time.perf_counter()
    results, computed, failed = compute_metrics(new_state, set(metric_names))
    metrics = {name: (r.text, r.attrs) for name, r in results.items()}

    return {
        "pid": pid,
        "file": rel,
        "views": view_files,
        "duration_sec": time.perf_counter() - t0,
        "digest": digest,
        "metrics": metrics,
        "metrics_computed": computed,
        "metrics_failed": failed,
        "metrics_duration_sec": time.perf_counter() - m0,
        "hot_keys": stats.hot_keys,
        **{k: getattr(stats, k) for k in _STATS_FIELDS},
    }


# ---- Ray remote wrappers (built lazily; the library never inits Ray) --

def read_wal_file(path: str) -> pa.Table:
    """Read one WAL file in either supported source format: Parquet or
    JSONL (newline-delimited change events — the log-shipping format
    most CDC relays emit). JSONL columns are cast to the change schema
    (ints narrowed, ISO timestamps parsed); columns beyond the schema
    (additive evolution) pass through untouched."""
    if not path.endswith((".jsonl", ".json")):
        return pq.read_table(path)
    from pyarrow import json as pa_json

    from ..schema import CHANGE_SCHEMA

    t = pa_json.read_json(path)
    cols = {}
    for field in CHANGE_SCHEMA:
        if field.name in t.column_names:
            cols[field.name] = t.column(field.name).cast(field.type)
        else:
            cols[field.name] = pa.nulls(t.num_rows, field.type)
    out = pa.table(cols)
    for c in t.column_names:
        if c not in CHANGE_SCHEMA.names:
            out = out.append_column(c, t.column(c))
    return out


_REMOTES: dict | None = None


def _remotes() -> dict:
    global _REMOTES
    if _REMOTES is None:
        import ray

        @ray.remote
        def map_files(files: list[str], P: int, salt_keys, salt_factor, cont: bool):
            # Malformed-file policy mirrors the reference's unreadable-image
            # handling (/root/reference/ir:384-388 None-check + counted
            # failure): keep-going skips and logs the bad file; fail-fast
            # propagates and the epoch never commits. OSError covers files
            # that vanished or are unreadable at the filesystem level —
            # the skip policy is about *unreadable inputs*, not just
            # malformed Parquet. The final return slot carries the skip
            # count so the run summary (and exit code) can report it
            # honestly (/root/reference/ir:606-619 failed-count policy).
            tables = []
            skipped = 0
            for f in files:
                try:
                    tables.append(read_wal_file(f))
                except (pa.ArrowInvalid, OSError) as exc:
                    if not cont:
                        raise
                    skipped += 1
                    import logging

                    logging.getLogger("image_report_ray").warning(
                        "skipping unreadable WAL file %s: %s", f, exc
                    )
            if not tables:
                return tuple(pa.table({}) for _ in range(P)) + (skipped,)
            t = concat_evolving(tables)
            return prepare_and_split(
                t, P, salt_keys, salt_factor, continue_on_error=cont
            ) + (skipped,)

        @ray.remote
        def map_block(block: pa.Table, P: int, salt_keys, salt_factor, cont: bool):
            return prepare_and_split(
                block, P, salt_keys, salt_factor, continue_on_error=cont
            ) + (0,)

        @ray.remote
        def merge_part(pid, prior_paths, prior_lsn, lake_root, epoch, hot_k,
                       mnames, vnames, view_rels, *parts):
            """COW / MOR-compaction leg: fold the prior composition
            (base + deltas) and apply the epoch on top, writing a full
            state file (+ any registered materialized views — only this
            leg has the full state to compute them from).
            ``prior_paths`` empty/None -> fresh partition. ``view_rels``
            maps view name -> the previous committed view file (relative)
            so maintenance can run incrementally; the conversations in
            the MOR deltas (``prior_paths[1:]``, changes folded since
            that view's snapshot) join the affected set."""
            from ..state.merge import fold_state_tables

            prior_tabs = (
                [pq.read_table(p) for p in prior_paths] if prior_paths else []
            )
            prior = fold_state_tables(prior_tabs) if prior_tabs else None
            prior_views: dict[str, pa.Table] = {}
            for vname, rel in (view_rels or {}).items():
                try:
                    prior_views[vname] = pq.read_table(
                        os.path.join(lake_root, rel)
                    )
                except (pa.ArrowInvalid, OSError):
                    pass  # missing/corrupt previous view -> full recompute
            affected_extra = None
            if prior_views and len(prior_tabs) > 1:
                affected_extra = np.unique(
                    np.concatenate(
                        [
                            t.column("conv_id").to_numpy(zero_copy_only=False)
                            for t in prior_tabs[1:]
                        ]
                    ).astype(object)
                )
            return merge_partition_kernel(
                pid, list(parts), prior, prior_lsn, lake_root, epoch, hot_k,
                metric_names=mnames, view_names=vnames,
                prior_views=prior_views, affected_extra=affected_extra,
            )

        @ray.remote
        def delta_part(pid, prior_lsn, lake_root, epoch, hot_k, mnames, *parts):
            """MOR delta leg: NO prior read — the epoch's compacted
            winners become a sorted delta file; cross-epoch resolution
            happens at fold time (read/compaction). Epoch cost is
            O(delta), the property that makes a 10^10-event changelog
            tractable (Hudi/Iceberg merge-on-read, public design)."""
            return merge_partition_kernel(
                pid, list(parts), None, prior_lsn, lake_root, epoch, hot_k,
                metric_names=mnames,
            )

        _REMOTES = {
            "map_files": map_files,
            "map_block": map_block,
            "merge": merge_part,
            "delta": delta_part,
        }
    return _REMOTES


def _group_files(files: list[str], target_rows: int) -> list[list[str]]:
    """Greedy grouping of WAL files into ~target_rows map tasks using
    Parquet footer row counts (metadata only — no data read)."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_rows = 0
    for f in files:
        try:
            n = pq.read_metadata(f).num_rows
        except (pa.ArrowInvalid, OSError):
            n = 0  # unreadable: still forwarded; the map task applies policy
        if cur and cur_rows + n > target_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(f)
        cur_rows += n
    if cur:
        groups.append(cur)
    return groups


def submit_map_stage(
    lake: Lake, wal: "str | list[str] | object", cfg: EngineConfig
) -> list:
    """Launch the epoch's map tasks; returns the list of per-task ref
    tuples (each has P+1 object refs: one per partition, plus the task's
    skipped-file count in the last slot). ``num_returns`` is always
    >= 2, so Ray returns a real list even at ``num_partitions=1``."""
    R = _remotes()
    P = lake.num_partitions
    args = (P, lake.salt_keys, lake.salt_factor, cfg.continue_on_error)
    if isinstance(wal, str):
        wal = [wal]
    if isinstance(wal, list):
        groups = _group_files(wal, cfg.map_task_rows)
        return [
            R["map_files"].options(num_returns=P + 1).remote(g, *args)
            for g in groups
        ]
    # a ray.data.Dataset: execute its (lazy) plan; blocks feed split tasks.
    refs = wal.to_arrow_refs()
    return [R["map_block"].options(num_returns=P + 1).remote(r, *args) for r in refs]


def apply_epoch(
    lake: Lake,
    epoch: int,
    wal: "str | list[str] | object",
    cfg: EngineConfig | None = None,
    *,
    map_refs: list | None = None,
) -> dict[int, MergeStats] | None:
    """Apply one epoch exactly-once. Returns per-pid stats, or ``None`` if
    the epoch was already committed (idempotent redelivery, D1/S2).

    ``map_refs`` lets ``run_job`` pre-submit the map stage (lookahead
    pipelining); correctness is unaffected because map tasks don't touch
    state — only merges read the prior commit."""
    import ray

    cfg = cfg or EngineConfig(num_partitions=lake.num_partitions)
    if lake.is_committed(epoch):
        return None

    R = _remotes()
    mats = map_refs if map_refs is not None else submit_map_stage(lake, wal, cfg)

    from ..functions.metrics import select_metrics

    mnames = tuple(sorted(select_metrics(cfg.metrics)))
    current = lake.current_entries()
    file_sets = {
        pid: [os.path.join(lake.root, r) for r in (e.get("files") or [e["file"]])]
        for pid, e in current.items()
    }
    rel_sets = {
        pid: list(e.get("files") or [e["file"]]) for pid, e in current.items()
    }
    lsns = {pid: e["last_lsn"] for pid, e in current.items()}

    stat_refs = []
    compacted: dict[int, bool] = {}
    for pid in range(lake.num_partitions):
        prior = file_sets.get(pid, [])
        # MOR writes a delta unless the composition is due for compaction;
        # COW always folds-and-rewrites (compaction every epoch). The
        # row-based policy (size-tiered: hot partitions compact as soon
        # as their delta chain outgrows compact_rows_factor x base rows,
        # cold ones coast to the chain-length cap) reads only parquet
        # FOOTERS — metadata, never data.
        compact = cfg.merge_mode == "cow" or len(prior) + 1 >= cfg.compact_every
        if (
            not compact
            and cfg.compact_rows_factor is not None
            and len(prior) > 1
        ):
            try:
                base_rows = pq.read_metadata(prior[0]).num_rows
                delta_rows = sum(
                    pq.read_metadata(p).num_rows for p in prior[1:]
                )
                compact = delta_rows >= cfg.compact_rows_factor * max(
                    base_rows, 1
                )
            except (pa.ArrowInvalid, OSError):
                pass  # unreadable footer: fall back to the length cap
        compacted[pid] = compact
        if compact:
            view_rels = {
                v: rel
                for v, rel in (current.get(pid, {}).get("views") or {}).items()
                if v in cfg.views
            }
            stat_refs.append(
                R["merge"].remote(
                    pid, prior, lsns.get(pid, -1), lake.root, epoch, 3, mnames,
                    tuple(cfg.views), view_rels,
                    *[m[pid] for m in mats],
                )
            )
        else:
            stat_refs.append(
                R["delta"].remote(
                    pid, lsns.get(pid, -1), lake.root, epoch, 3, mnames,
                    *[m[pid] for m in mats],
                )
            )
    rows = [r for r in ray.get(stat_refs) if r is not None]

    entries: dict[int, dict] = {}
    out_stats: dict[int, MergeStats] = {}
    for row in rows:
        pid = int(row["pid"])
        stats = MergeStats(
            **{k: int(row[k]) for k in _STATS_FIELDS},
            hot_keys=[tuple(x) for x in row["hot_keys"]],
        )
        out_stats[pid] = stats
        report = build_partition_report(
            pid=pid,
            epoch=epoch,
            stats=stats,
            digest=row["digest"],
            duration_sec=float(row["duration_sec"]),
            metrics=row["metrics"],
            metrics_computed=int(row["metrics_computed"]),
            metrics_failed=int(row["metrics_failed"]),
            metrics_duration_sec=float(row["metrics_duration_sec"]),
            params={
                "num_partitions": lake.num_partitions,
                "salt_factor": lake.salt_factor,
                "salted_keys": len(lake.salt_keys),
            },
        )
        write_report(report, lake.lineage_path(epoch, pid))
        entries[pid] = {
            "file": row["file"],
            # composition that folds to current state: a compacted entry
            # replaces everything; a delta entry appends to the chain
            "files": (
                [row["file"]]
                if compacted[pid]
                else rel_sets.get(pid, []) + [row["file"]]
            ),
            "last_lsn": int(row["last_lsn"]),
            "rows_live": int(row["rows_live"]),
            "tombstoned": int(row["tombstoned"]),
            "keys_total": int(row["keys_total"]),
            "digest": row["digest"],
            "received": int(row["received"]),
            "applied": int(row["applied"]),
            # view files written this epoch, else carried from the last
            # commit (MOR delta epochs — the documented view lag)
            "views": (
                row.get("views")
                or (current.get(pid, {}).get("views") or {})
            ),
        }

    lake.commit(epoch, entries)
    return out_stats


# below-watermark advisories already emitted, keyed by
# (lake root, watermark, epoch set) — a follower (tail_job polls run_job
# every poll_interval) must not re-log the same advisory forever
_BELOW_WATERMARK_WARNED: set = set()


def _should_warn_below_watermark(
    lake: Lake, committed: list[int], high: int, below: list[int]
) -> bool:
    """The below-watermark advisory is suppressed for the one LEGITIMATE
    shape — a migrated (resharded/bootstrapped) lake, whose single
    migration commit at the source's max epoch covers every earlier WAL
    epoch (received==applied==0 in every partition entry) — and is
    otherwise logged ONCE per distinct (lake, watermark, epoch set), not
    on every tail poll."""
    if len(committed) == 1 and committed[0] == high:
        try:
            parts = lake.read_commit(high).get("partitions", {})
        except Exception:
            parts = {}
        if parts and all(
            e.get("received", -1) == 0 and e.get("applied", -1) == 0
            for e in parts.values()
        ):
            return False  # migration commit — documented-legitimate
    key = (lake.root, high, tuple(below))
    if key in _BELOW_WATERMARK_WARNED:
        return False
    _BELOW_WATERMARK_WARNED.add(key)
    return True


def run_job(
    lake_dir: str,
    wal_dir: str,
    cfg: EngineConfig | None = None,
    *,
    salt_keys: frozenset[str] = frozenset(),
) -> dict:
    """Tail the whole WAL: apply every epoch in order, skipping committed
    ones (resume). Map stages for up to ``cfg.epoch_lookahead`` future
    epochs run while the current epoch merges/commits — the streaming
    overlap that keeps workers busy across the per-epoch commit barrier.
    Returns the run summary (events/s, counts) — the engine's version of
    the reference's end-of-run summary (/root/reference/ir:606-617)."""
    import ray

    cfg = cfg or EngineConfig()
    lake = Lake(
        lake_dir,
        num_partitions=cfg.num_partitions,
        salt_keys=salt_keys,
        salt_factor=cfg.salt_factor,
    )
    P = lake.num_partitions
    epochs = discover_epochs(wal_dir)
    # skip everything at or below the newest commit, not just exact
    # members: commits are sequential so the set is a prefix in normal
    # operation, but a resharded lake carries ONE migration commit at
    # the source's max epoch that covers everything before it
    committed = lake.committed_epochs()
    high = max(committed) if committed else -1
    pending = [
        e for e in epochs if e > high and not lake.is_committed(e)
    ]
    # Below-watermark epochs that were never actually committed are NOT
    # idempotent redeliveries — they are mis-numbered / back-filled
    # producer output (legitimate only for the single reshard
    # migration-commit case). Count them separately so silent data loss
    # is observable in the summary, not folded into epochs_skipped.
    below_watermark = sorted(
        e for e in epochs if e <= high and not lake.is_committed(e)
    )
    if below_watermark and _should_warn_below_watermark(
        lake, committed, high, below_watermark
    ):
        logging.getLogger("image_report_ray").warning(
            "%d WAL epoch(s) below commit watermark %d but never "
            "committed (mis-numbered producer?): %s",
            len(below_watermark), high, below_watermark[:10],
        )
    t0 = time.perf_counter()
    applied_epochs, skipped_epochs, events, files_skipped = 0, 0, 0, 0
    skipped_epochs = len(epochs) - len(pending)

    inflight: dict[int, list] = {}
    hot_totals: dict[str, int] = {}
    for e in pending[: cfg.epoch_lookahead + 1]:
        inflight[e] = submit_map_stage(lake, epochs[e], cfg)
    for i, e in enumerate(pending):
        nxt = i + cfg.epoch_lookahead + 1
        if nxt < len(pending) and pending[nxt] not in inflight:
            inflight[pending[nxt]] = submit_map_stage(lake, epochs[pending[nxt]], cfg)
        refs = inflight.pop(e)
        res = apply_epoch(lake, e, epochs[e], cfg, map_refs=refs)
        # last return slot of every map task = its unreadable-file skip
        # count (keep-going policy); surfaced in the summary + exit code
        files_skipped += sum(ray.get([m[P] for m in refs]))
        if res is None:
            skipped_epochs += 1
        else:
            applied_epochs += 1
            events += sum(s.received for s in res.values())
            for s in res.values():
                for conv, n in s.hot_keys:
                    hot_totals[conv] = max(hot_totals.get(conv, 0), n)
    dt = time.perf_counter() - t0
    # Skew advisory: conversations whose single-epoch event count crossed
    # the salt threshold. The salt set is immutable per lake (routing must
    # stay stable), so these are surfaced for the NEXT lake / a re-shard —
    # the operational loop behind --salt-key.
    salt_candidates = sorted(
        c for c, n in hot_totals.items()
        if n > cfg.salt_threshold and c not in lake.salt_keys
    )
    return {
        "epochs_applied": applied_epochs,
        "epochs_skipped": skipped_epochs,
        "epochs_below_watermark": len(below_watermark),
        "events_received": events,
        "files_skipped": files_skipped,
        "duration_sec": dt,
        "events_per_sec": events / dt if dt > 0 else 0.0,
        "salt_candidates": salt_candidates,
    }


# ---- tombstone GC -----------------------------------------------------


def gc_tombstones(lake: Lake, *, before_lsn: int) -> dict:
    """Drop tombstones with ``_lsn < before_lsn`` from every partition's
    current state (the Delta-VACUUM analogue for CDC deletes).

    CONTRACT: the caller guarantees no event with ``lsn < before_lsn``
    will ever be delivered again (the retention watermark). A late
    delivery below the watermark for a GC'd key would re-apply instead of
    being suppressed by its tombstone — that is the retention trade-off,
    the same one every CDC lake makes.

    Publishes as a ``gc=N`` commit record that folds after the epochs it
    compacted and before any later WAL epoch (see
    ``Lake.current_entries``); crash before the record lands leaves only
    invisible staging files. Rewrites run as one Ray task per partition.
    """
    import ray

    R = _gc_remote()
    entries_now = lake.current_entries()
    if not entries_now:
        return {"partitions": 0, "tombstones_dropped": 0}
    after_epoch = max(e["epoch"] for e in entries_now.values())
    seq = (lake.gc_seqs()[-1] + 1) if lake.gc_seqs() else 0
    refs = {
        pid: R.remote(
            pid,
            [os.path.join(lake.root, r) for r in (e.get("files") or [e["file"]])],
            lake.root, seq, before_lsn, e,
        )
        for pid, e in sorted(entries_now.items())
    }
    results = {pid: ray.get(r) for pid, r in refs.items()}
    new_entries = {pid: res[0] for pid, res in results.items()}
    dropped = sum(res[1] for res in results.values())
    lake.commit_gc(seq, after_epoch, new_entries)
    return {
        "partitions": len(new_entries),
        "tombstones_dropped": dropped,
        "gc_seq": seq,
        "before_lsn": before_lsn,
    }


_GC_REMOTE = None


def _gc_remote():
    global _GC_REMOTE
    if _GC_REMOTE is None:
        import ray

        @ray.remote
        def gc_partition(pid, paths, lake_root, seq, before_lsn, old_entry):
            from ..schema import DELETED_COL, LSN_COL
            from ..state.merge import fold_state_tables

            # GC implies compaction: fold the composition, then drop
            t = fold_state_tables([pq.read_table(p) for p in paths])
            drop = pc.and_(
                t.column(DELETED_COL),
                pc.less(t.column(LSN_COL), before_lsn),
            )
            kept = t.filter(pc.invert(drop))
            n_dropped = t.num_rows - kept.num_rows
            rel = os.path.join("data", f"gc={seq:05d}", f"pid={pid:05d}.parquet")
            Lake.write_state_file(kept, os.path.join(lake_root, rel))
            deleted = kept.column(DELETED_COL)
            tomb = int(pc.sum(pc.cast(deleted, pa.int64())).as_py() or 0)
            entry = {
                **{k: old_entry[k] for k in ("last_lsn", "received", "applied")},
                "file": rel,
                "files": [rel],
                "rows_live": kept.num_rows - tomb,
                "tombstoned": tomb,
                "keys_total": kept.num_rows,
                "digest": table_digest(kept),
            }
            return entry, n_dropped

        _GC_REMOTE = gc_partition
    return _GC_REMOTE


# ---- canonical state export ------------------------------------------


_FOLD_REMOTE = None


def _fold_remote():
    global _FOLD_REMOTE
    if _FOLD_REMOTE is None:
        import ray

        @ray.remote
        def fold_canonical(paths: list[str]) -> pa.Table:
            from ..state.merge import fold_state_tables

            folded = fold_state_tables([pq.read_table(p) for p in paths])
            return export_canonical(folded) if folded is not None else pa.table({})

        _FOLD_REMOTE = fold_canonical
    return _FOLD_REMOTE


def canonical_state_dataset(lake: Lake, as_of: int | None = None):
    """Streaming canonical view: live rows, payload columns only.

    One fold task per partition (base + deltas LWW-folded there); the
    refs become Dataset blocks. No global sort — ordering is
    per-conversation within a partition (O3's stable reading-order
    contract). ``as_of`` reads the manifest's epoch snapshot (time
    travel) instead of the head."""
    import ray.data as rd

    sets = lake.current_file_sets(as_of)
    if not sets:
        raise ValueError("lake has no committed state")
    fold = _fold_remote()
    refs = [fold.remote(paths) for _, paths in sorted(sets.items())]
    return rd.from_arrow_refs(refs)


def canonical_state_table(lake: Lake, as_of: int | None = None) -> pa.Table:
    """Globally sorted canonical table — small-scale testing/export only
    (the oracle-equality comparison surface). ``as_of`` reads the
    manifest's epoch snapshot (time travel) instead of the head."""
    from ..state.merge import fold_state_tables

    sets = lake.current_file_sets(as_of)
    if not sets:
        return pa.table({})
    tables = []
    for _, paths in sorted(sets.items()):
        folded = fold_state_tables([pq.read_table(p) for p in paths])
        if folded is not None:
            tables.append(export_canonical(folded))
    if not tables:
        return pa.table({})
    t = concat_evolving(tables)
    return t.take(
        pc.sort_indices(t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")])
    )


def expire_turns(
    lake: Lake, before_ts_us: int, cfg: EngineConfig | None = None
) -> dict:
    """TTL retention: physically drop every LIVE turn whose ``ts`` is
    older than ``before_ts_us`` (epoch microseconds) from the current
    state — the data-retention / PII-expiry maintenance pass a
    transcript lake runs on schedule.

    Shape: a GC-style rewrite (one Ray task per partition folds its
    composition, filters the expired rows, writes a compacted file)
    published as a ``gc=N`` commit — NOT a tombstone epoch. That keeps
    the lsn space untouched: expiry consumes no event lsns and no WAL
    epoch number, so a future change event can never lose LWW to an
    expiry artifact — a later insert legitimately re-creates the key,
    while redeliveries at or below the unchanged ``last_lsn`` watermark
    still dedup. Existing delete tombstones are kept (late-duplicate
    safety). Idempotent: nothing to expire -> no commit. Views are
    dropped from the gc entries (recomputed at the next epoch commit),
    never served stale. Compliance note: the rewrite removes expired
    rows from the CURRENT state and from any snapshot at or after the
    gc fold point; older epoch FILES are immutable and still hold the
    bytes — physical destruction additionally needs a file vacuum.

    ``cfg`` is accepted for interface symmetry; the rewrite derives
    everything from the lake itself."""
    import ray

    entries_now = lake.current_entries()
    if not entries_now:
        return {"expired": 0, "gc_seq": None}
    after_epoch = max(e["epoch"] for e in entries_now.values())
    seq = (lake.gc_seqs()[-1] + 1) if lake.gc_seqs() else 0

    @ray.remote
    def expire_partition(pid, paths, lake_root, seq_, cutoff_us, old_entry):
        from ..state.merge import fold_state_tables

        t = fold_state_tables([pq.read_table(p) for p in paths])
        drop = pc.and_(
            pc.invert(t.column(DELETED_COL)),
            pc.fill_null(
                pc.less(
                    t.column("ts"), pa.scalar(cutoff_us, pa.timestamp("us"))
                ),
                False,
            ),
        )
        kept = t.filter(pc.invert(drop))
        n_dropped = t.num_rows - kept.num_rows
        rel = os.path.join("data", f"gc={seq_:05d}", f"pid={pid:05d}.parquet")
        Lake.write_state_file(kept, os.path.join(lake_root, rel))
        tomb = int(
            pc.sum(pc.cast(kept.column(DELETED_COL), pa.int64())).as_py() or 0
        )
        entry = {
            **{k: old_entry[k] for k in ("last_lsn", "received", "applied")},
            "file": rel,
            "files": [rel],
            "rows_live": kept.num_rows - tomb,
            "tombstoned": tomb,
            "keys_total": kept.num_rows,
            "digest": table_digest(kept),
        }
        return entry, n_dropped

    refs = {
        pid: expire_partition.remote(
            pid,
            [os.path.join(lake.root, r) for r in (e.get("files") or [e["file"]])],
            lake.root, seq, before_ts_us, e,
        )
        for pid, e in sorted(entries_now.items())
    }
    results = {pid: ray.get(r) for pid, r in refs.items()}
    n_expired = sum(res[1] for res in results.values())
    if n_expired == 0:
        # nothing expired anywhere: no commit (staged files of this
        # no-op stay invisible, same as any crash-before-commit orphan)
        return {"expired": 0, "gc_seq": None}
    lake.commit_gc(seq, after_epoch, {p: r[0] for p, r in results.items()})
    return {"expired": int(n_expired), "gc_seq": int(seq)}


def _commit_migration(lake: Lake, epoch: int, rows: list, params: dict) -> int:
    """Shared tail of the state migrations (reshard / bootstrap): build
    each partition's MergeStats + lineage report + commit entry from its
    writer row, publish the commit; returns total keys written."""
    entries: dict[int, dict] = {}
    total = 0
    for row in rows:
        if row is None:
            continue
        pid = int(row["pid"])
        stats = MergeStats(
            **{k: 0 for k in _STATS_FIELDS
               if k not in ("rows_live", "tombstoned", "keys_total", "last_lsn")},
            rows_live=int(row["rows_live"]),
            tombstoned=int(row["tombstoned"]),
            keys_total=int(row["keys_total"]),
            last_lsn=int(row["last_lsn"]),
            hot_keys=[],
        )
        report = build_partition_report(
            pid=pid, epoch=epoch, stats=stats, digest=row["digest"],
            duration_sec=float(row["duration_sec"]), params=params,
        )
        write_report(report, lake.lineage_path(epoch, pid))
        total += int(row["keys_total"])
        entries[pid] = {
            "file": row["file"],
            "files": [row["file"]],
            "last_lsn": int(row["last_lsn"]),
            "rows_live": int(row["rows_live"]),
            "tombstoned": int(row["tombstoned"]),
            "keys_total": int(row["keys_total"]),
            "digest": row["digest"],
            "received": 0,
            "applied": 0,
            "views": {},
        }
    lake.commit(epoch, entries)
    return total


def reshard_lake(src: Lake, dst_root: str, new_partitions: int) -> dict:
    """Migrate the lake's CURRENT state to a NEW lake with a different
    partition count. P is immutable for a lake's lifetime (manifest.py
    enforces it), so growing a deployment is a state MIGRATION — this is
    that migration, expressed as the engine's own exchange shape.

    One remote task per SOURCE partition folds its state chain and
    splits it into ``new_partitions`` slices under the same crc32
    routing (``num_returns`` object-store exchange); one task per DEST
    partition concats its column of slices in src-pid order, re-sorts to
    the canonical (conv_id, turn_idx) state order, writes its state file
    and computes its commit entry. Per-row lsns and tombstones migrate
    untouched and every dest checkpoint carries the GLOBAL max
    ``last_lsn``, so LWW, staleness and exactly-once semantics hold for
    anything delivered after the cutover. The migration commits at the
    source's max committed epoch, so the WAL stream resumes at the next
    epoch number with no renumbering."""
    import ray

    src_entries = src.current_entries()
    if not src_entries:
        raise ValueError("source lake has no committed state")
    global_lsn = max(int(e["last_lsn"]) for e in src_entries.values())
    epoch = max(src.committed_epochs())
    dst = Lake(dst_root, num_partitions=new_partitions)

    @ray.remote
    def split_src(paths: list, P: int):
        from ..state.merge import fold_state_tables

        folded = fold_state_tables([pq.read_table(p) for p in paths])
        if folded is None:
            return tuple(pa.table({}) for _ in range(P))
        return _split_by_pid(folded, P)

    @ray.remote
    def write_dst(pid: int, lsn: int, root: str, ep: int, *slices) -> dict:
        t0 = time.perf_counter()
        parts = [s for s in slices if s.num_rows]
        if not parts:  # empty dest partition: absent from the manifest
            return None
        t = concat_evolving(parts)
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("conv_id", "ascending"),
                           ("turn_idx", "ascending")],
            )
        )
        rel = os.path.join("data", f"epoch={ep:05d}", f"pid={pid:05d}.parquet")
        Lake.write_state_file(t, os.path.join(root, rel))
        tomb = int(
            pc.sum(pc.cast(t.column(DELETED_COL), pa.int64())).as_py() or 0
        )
        return {
            "pid": pid,
            "file": rel,
            "rows_live": t.num_rows - tomb,
            "tombstoned": tomb,
            "keys_total": t.num_rows,
            "last_lsn": lsn,
            "digest": table_digest(t),
            "duration_sec": time.perf_counter() - t0,
        }

    sets = src.current_file_sets()
    cols = [
        split_src.options(num_returns=new_partitions).remote(paths, new_partitions)
        for _, paths in sorted(sets.items())
    ]
    if new_partitions == 1:  # num_returns=1 yields a bare ref
        cols = [[c] for c in cols]
    entry_refs = [
        write_dst.remote(
            pid, global_lsn, dst.root, epoch, *[col[pid] for col in cols]
        )
        for pid in range(new_partitions)
    ]
    moved = _commit_migration(
        dst, epoch, ray.get(entry_refs),
        {"num_partitions": new_partitions,
         "resharded_from": src.num_partitions},
    )
    return {
        "epoch": int(epoch),
        "partitions": int(new_partitions),
        "keys_moved": int(moved),
    }


def bootstrap_lake(
    src_parquet: str, lake_root: str, num_partitions: int, epoch: int = 0
) -> dict:
    """Bootstrap a lake FROM an existing plain transcripts Parquet table
    (columns ``conv_id, turn_idx, role, text, tool, ts`` — the input
    shape) — the migration INTO the engine: load the current corpus once
    as committed initial state, then let the WAL stream apply on top.

    Rows get ``_lsn = -1`` (no originating event): every real change
    event (lsn >= 0) LWW-wins over the bootstrap row, and the -1
    checkpoint watermark means nothing is ever mistaken for a duplicate
    delivery. Commits at ``epoch`` (default 0); start the WAL at
    ``epoch + 1``. Same exchange shape as :func:`reshard_lake`: split
    tasks route rows, one writer per destination partition."""
    import ray
    import ray.data as rd

    lake = Lake(lake_root, num_partitions=num_partitions)
    if lake.committed_epochs():
        raise ValueError("bootstrap target lake already has commits")

    @ray.remote
    def split_block(block: pa.Table, P: int):
        for key_col in ("conv_id", "turn_idx"):
            col = block.column(key_col)
            if col.null_count:
                raise ValueError(
                    f"bootstrap source has {col.null_count} null "
                    f"{key_col} values — key columns must be non-null"
                )
        t = block.append_column(
            LSN_COL, pa.array(np.full(block.num_rows, -1, np.int64))
        ).append_column(
            DELETED_COL, pa.array(np.zeros(block.num_rows, bool))
        )
        return _split_by_pid(t, P)

    @ray.remote
    def write_boot(pid: int, root: str, ep: int, *slices) -> dict | None:
        t0 = time.perf_counter()
        parts = [s for s in slices if s.num_rows]
        if not parts:
            return None
        t = concat_evolving(parts)
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")],
            )
        )
        # the (conv_id, turn_idx) key must be unique: sorted, so any
        # duplicate is adjacent (keys are partition-local — complete)
        if t.num_rows > 1:
            conv = t.column("conv_id").to_numpy(zero_copy_only=False)
            turn = t.column("turn_idx").to_numpy()
            dup = (conv[1:] == conv[:-1]) & (turn[1:] == turn[:-1])
            if dup.any():
                i = int(np.flatnonzero(dup)[0])
                raise ValueError(
                    "bootstrap source has duplicate (conv_id, turn_idx) "
                    f"keys, e.g. ({conv[i]!r}, {int(turn[i])})"
                )
        rel = os.path.join("data", f"epoch={ep:05d}", f"pid={pid:05d}.parquet")
        Lake.write_state_file(t, os.path.join(root, rel))
        return {
            "pid": pid,
            "file": rel,
            "rows_live": t.num_rows,
            "tombstoned": 0,
            "keys_total": t.num_rows,
            "last_lsn": -1,
            "digest": table_digest(t),
            "duration_sec": time.perf_counter() - t0,
        }

    blocks = rd.read_parquet(src_parquet).to_arrow_refs()
    cols = [
        split_block.options(num_returns=num_partitions).remote(b, num_partitions)
        for b in blocks
    ]
    if num_partitions == 1:
        cols = [[c] for c in cols]
    entry_refs = [
        write_boot.remote(pid, lake.root, epoch, *[col[pid] for col in cols])
        for pid in range(num_partitions)
    ]
    loaded = _commit_migration(
        lake, epoch, ray.get(entry_refs),
        {"num_partitions": num_partitions, "bootstrap": True},
    )
    return {"epoch": int(epoch), "rows_loaded": int(loaded)}


def diff_snapshots(
    a: "pa.Table | None", b: "pa.Table | None"
) -> pa.Table:
    """PURE change-feed diff kernel: the row-level net effect between
    two canonical snapshot tables (live rows, payload columns, unique
    (conv_id, turn_idx) keys). ``I`` = key appeared, ``D`` =
    disappeared, ``U`` = any payload column changed; an identical
    rewrite does not feed. Feed columns keep the snapshots' native
    Arrow types (side-1 wins, side-0 covers columns dropped by
    evolution, string only as the never-seen-anywhere fallback).
    Property-tested against a dict-based naive diff; the remote
    per-partition feed task is a thin wrapper."""
    import pandas as pd

    def frame(t: "pa.Table | None"):
        if t is None or t.num_rows == 0:
            base = pd.DataFrame({"conv_id": [], "turn_idx": []})
            return base, (t.schema if t is not None else None)
        return t.to_pandas(), t.schema

    (a_df, sch0), (b_df, sch1) = frame(a), frame(b)
    # payload columns come from side 1 (a fully-emptied side 1 feeds
    # bare D rows — deletes carry no after-image by contract)
    payload = [c for c in b_df.columns if c not in ("conv_id", "turn_idx")]
    m = a_df.merge(b_df, on=["conv_id", "turn_idx"], how="outer",
                   suffixes=("_0", "_1"), indicator=True)
    op = pd.Series("U", index=m.index)
    op[m["_merge"] == "right_only"] = "I"
    op[m["_merge"] == "left_only"] = "D"
    both = m["_merge"] == "both"
    changed = pd.Series(False, index=m.index)
    for c in payload:
        c0, c1 = f"{c}_0", f"{c}_1"
        if c0 in m.columns and c1 in m.columns:
            changed |= (m[c0] != m[c1]) & ~(m[c0].isna() & m[c1].isna())
        elif c in m.columns:
            changed |= both & m[c].notna()
    keep = (m["_merge"] != "both") | (both & changed)
    m = m[keep]
    op = op[keep]
    cols = {"op": pa.array(op.to_numpy(), pa.string()),
            "conv_id": pa.array(m["conv_id"], pa.string()),
            "turn_idx": pa.array(
                m["turn_idx"].to_numpy().astype("int32"), pa.int32())}
    for c in payload:
        c1 = f"{c}_1"
        src = m[c1] if c1 in m.columns else m[c]
        # feed columns keep the lake's native Arrow types (the JSONL WAL
        # path passes evolved columns through e.g. as int64); string is
        # only the never-seen-anywhere fallback
        if sch1 is not None and sch1.get_field_index(c) != -1:
            typ = sch1.field(c).type
        elif sch0 is not None and sch0.get_field_index(c) != -1:
            typ = sch0.field(c).type
        else:
            typ = pa.string()
        cols[c] = pa.Array.from_pandas(src, type=typ)
    t = pa.table(cols)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )


_FEED_REMOTE = None


def _feed_remote():
    global _FEED_REMOTE
    if _FEED_REMOTE is None:
        import ray

        @ray.remote
        def part_feed(paths0: list, paths1: list) -> pa.Table:
            from ..state.merge import export_canonical, fold_state_tables

            def snap(paths: list) -> "pa.Table | None":
                folded = fold_state_tables([pq.read_table(p) for p in paths])
                return None if folded is None else export_canonical(folded)

            return diff_snapshots(snap(paths0), snap(paths1))

        _FEED_REMOTE = part_feed
    return _FEED_REMOTE


def changefeed_range_refs(lake: Lake, from_epoch: int, to_epoch: int) -> list:
    """Per-partition change-feed refs for the NET effect of epochs
    ``(from_epoch, to_epoch]`` — the diff of the two time-travel
    snapshots (the Delta `table_changes(from, to)` analogue). A consumer
    that catches up after missing several epochs reads ONE compacted
    feed instead of replaying each epoch's feed; intermediate churn
    (insert-then-delete, update-then-revert) nets out by construction.
    ``from_epoch = -1`` diffs against the empty lake (every live row
    feeds as ``I``). This is the scale surface: consumers write or
    forward each partition's feed without ever gathering the whole range
    on the driver; :func:`changefeed_range` / :func:`changefeed` are the
    small-result convenience wrappers that do gather."""
    import ray  # noqa: F401  (refs are ray ObjectRefs)

    if not lake.is_committed(to_epoch):
        raise ValueError(f"epoch {to_epoch} is not committed")
    if from_epoch >= to_epoch:
        raise ValueError(
            f"from_epoch {from_epoch} must be < to_epoch {to_epoch}"
        )
    has_base = from_epoch >= 0 and any(
        e <= from_epoch for e in lake.committed_epochs()
    )
    sets0 = lake.current_file_sets(as_of=from_epoch) if has_base else {}
    sets1 = lake.current_file_sets(as_of=to_epoch)
    R = _feed_remote()
    return [
        R.remote(sets0.get(pid, []), sets1.get(pid, []))
        for pid in sorted(set(sets0) | set(sets1))
    ]


def changefeed_refs(lake: Lake, epoch: int) -> list:
    """Per-partition change-feed refs for one ``epoch`` (its net effect
    vs the previous snapshot) — the single-epoch form of
    :func:`changefeed_range_refs`."""
    return changefeed_range_refs(lake, epoch - 1, epoch)


def changefeed_range(lake: Lake, from_epoch: int, to_epoch: int) -> pa.Table:
    """Gather-to-driver convenience form of :func:`changefeed_range_refs`
    (sorted (conv_id, turn_idx))."""
    import ray

    tabs = [
        t
        for t in ray.get(changefeed_range_refs(lake, from_epoch, to_epoch))
        if t.num_rows
    ]
    if not tabs:
        return pa.table(
            {"op": pa.array([], pa.string()),
             "conv_id": pa.array([], pa.string()),
             "turn_idx": pa.array([], pa.int32())}
        )
    t = concat_evolving(tabs)
    return t.take(
        pc.sort_indices(
            t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )


def changefeed(lake: Lake, epoch: int) -> pa.Table:
    """Change-data-feed OUT (the Delta-CDF analogue): the row-level net
    effect of ``epoch``, derived from the manifest's adjacent time-travel
    snapshots — no extra bookkeeping at write time, and it works
    retroactively for any committed epoch because data files are
    immutable. Per key: ``I`` = appeared, ``D`` = disappeared, ``U`` =
    any payload column changed; an update that rewrote identical values
    does not feed (net-effect semantics, same rule as the compacted
    exchange). One diff task per partition (pid routing is stable across
    epochs), vectorized outer merge; sorted (conv_id, turn_idx) output.
    This is the gather-to-driver convenience form — scale consumers use
    :func:`changefeed_refs` and handle each partition's feed in place.
    Catching up over several epochs at once: :func:`changefeed_range`."""
    return changefeed_range(lake, epoch - 1, epoch)


def vacuum_lake(lake: Lake, keep_epochs: int = 1) -> dict:
    """Physically delete data files that no retained snapshot references
    (the Delta-VACUUM analogue, and the completion of ``expire_turns``'s
    compliance note: expired rows vanish from the lake's BYTES, not just
    its current state).

    Retained snapshots: every ``as_of`` from ``max_epoch - keep_epochs``
    up to the head (plus the head itself). Everything under ``data/``
    not referenced by one of those compositions is removed. Time travel
    below the horizon stops resolving — that is the point. Lineage XML
    and commit records are audit metadata and are kept. Safe under
    concurrent readers of retained snapshots (their files are never
    candidates); a crash mid-delete just leaves fewer bytes to delete
    next run."""
    import glob

    epochs = lake.committed_epochs()
    if not epochs:
        return {"files_deleted": 0, "bytes_deleted": 0}
    horizon = max(epochs) - max(keep_epochs, 0)
    keep: set[str] = set()
    for e in [x for x in epochs if x >= horizon] or [max(epochs)]:
        for paths in lake.current_file_sets(as_of=e).values():
            keep.update(os.path.abspath(p) for p in paths)
    # the head may fold GC rewrites newer than any epoch number
    for paths in lake.current_file_sets().values():
        keep.update(os.path.abspath(p) for p in paths)

    # Staged-but-uncommitted files of an IN-FLIGHT epoch or GC rewrite
    # (state files land before the commit record — the two-phase-commit
    # write order) must survive a concurrent vacuum, or the subsequent
    # commit references deleted data. Anything numbered above the
    # committed watermarks is a writer's staging area, not garbage;
    # crash orphans there are reclaimed once a higher number commits.
    max_epoch = max(epochs)
    gc_seqs = lake.gc_seqs()
    max_gc = max(gc_seqs) if gc_seqs else -1
    dir_re = re.compile(r"^(epoch|gc)=(\d+)$")

    n, freed = 0, 0
    for p in glob.glob(os.path.join(lake.root, "data", "*", "*.parquet")):
        ap = os.path.abspath(p)
        if ap in keep:
            continue
        m = dir_re.match(os.path.basename(os.path.dirname(ap)))
        if m:
            kind, num = m.group(1), int(m.group(2))
            if (kind == "epoch" and num > max_epoch) or (
                kind == "gc" and num > max_gc
            ):
                continue  # in-flight staging — the next commit needs it
        try:
            freed += os.path.getsize(ap)
            os.remove(ap)
            n += 1
        except OSError:
            pass  # already gone / concurrent vacuum — next run finishes
    return {"files_deleted": n, "bytes_deleted": int(freed),
            "horizon_epoch": int(horizon)}


def tail_job(
    lake_dir: str,
    wal_dir: str,
    cfg: EngineConfig | None = None,
    *,
    salt_keys: frozenset[str] = frozenset(),
    poll_interval: float = 0.5,
    idle_timeout: float = 10.0,
) -> dict:
    """CONTINUOUS tail — the north star's deployment shape: poll the WAL
    directory and apply new epochs as they appear (each through the
    normal exactly-once commit), returning once no new epoch has landed
    for ``idle_timeout`` seconds. Every pass is a plain :func:`run_job`
    (discovery + skip of committed epochs), so crash/restart at any
    point resumes identically. Producer contract: epoch directories
    must land in ascending order and be published atomically (write
    under a temp name, rename into place — the same discipline the
    engine's own commits use); a half-visible epoch would otherwise
    commit without its missing files."""
    t0 = time.perf_counter()
    totals = {"epochs_applied": 0, "events_received": 0, "files_skipped": 0,
              "passes": 0}
    last_new = time.monotonic()
    while True:
        summary = run_job(lake_dir, wal_dir, cfg, salt_keys=salt_keys)
        totals["passes"] += 1
        totals["epochs_applied"] += summary["epochs_applied"]
        totals["events_received"] += summary["events_received"]
        totals["files_skipped"] += summary["files_skipped"]
        if summary["epochs_applied"]:
            last_new = time.monotonic()
        if time.monotonic() - last_new >= idle_timeout:
            break
        time.sleep(poll_interval)
    totals["duration_sec"] = time.perf_counter() - t0
    totals["events_per_sec"] = (
        totals["events_received"] / totals["duration_sec"]
        if totals["duration_sec"] > 0 else 0.0
    )
    return totals
