#!/usr/bin/env python
"""Benchmark harness — headline CDC replay + query suite over $GRAFT_SF_DIR.

Prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "events_per_sec": ...}

``--scaling`` runs the headline CDC replay twice in FRESH processes at two
parallelism levels (num_cpus=8 and num_cpus=32 by default) on the same
input and reports throughput at both plus ``efficiency =
tput(4N) / (4 * tput(N))`` — the sandbox form of the north rule's
N-vs-4N cluster criterion (see BASELINE.md).

This script OWNS its Ray session (init+shutdown); the library never does.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
DEFAULT_SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Query-suite members (name -> callable(sf_dir)); resolved lazily so that
# --scaling subprocesses don't pay the import.
QUERY_NAMES = [
    "cdc_apply",
    "cdc_counts",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "customers_without_orders",
    "user_hour_activity",
    "sessionize_users",
    "asof_click_before_purchase",
    "text_stats",
    "top_tokens",
    "dedup_exact",
    "lang_stats",
    "knn_cosine",
    "embedding_near_dups",
]


def _init_ray(num_cpus: int) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def bench_headline(sf_dir: str, num_cpus: int, n_epochs: int = 4) -> dict:
    """The flagship pipeline: events-derived changelog replayed through the
    full engine (P partitions, manifest, lineage). Returns wall seconds and
    sustained events/s. P is fixed at 32 regardless of num_cpus so the two
    scaling runs shuffle identical work (BASELINE.md protocol)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from image_report_ray.config import EngineConfig
    from image_report_ray.pipelines.cdc import apply_epoch
    from image_report_ray.sources.wal import events_to_changelog, max_event_id

    span = (max_event_id(sf_dir) + n_epochs) // n_epochs
    lake_dir = tempfile.mkdtemp(prefix="irr-bench-")
    try:
        from image_report_ray.state.manifest import Lake

        lake = Lake(lake_dir, num_partitions=32)
        cfg = EngineConfig(num_partitions=32)
        t0 = time.perf_counter()
        events = 0
        for epoch in range(n_epochs):
            lo, hi = epoch * span, (epoch + 1) * span
            ds = rd.read_parquet(
                f"{sf_dir}/events.parquet",
                columns=["event_id", "ts", "user_id", "event_type", "props"],
            ).map_batches(
                lambda t, lo=lo, hi=hi: events_to_changelog(
                    t.filter(
                        pc.and_(
                            pc.greater_equal(t.column("event_id"), lo),
                            pc.less(t.column("event_id"), hi),
                        )
                    )
                ),
                batch_format="pyarrow",
            )
            stats = apply_epoch(lake, epoch, ds, cfg)
            events += sum(s.received for s in stats.values())
        dt = time.perf_counter() - t0
        return {"sec": dt, "events": events, "events_per_sec": events / dt}
    finally:
        shutil.rmtree(lake_dir, ignore_errors=True)


def bench_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in QUERY_NAMES:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        res = fn(sf_dir)
        # force any lazy Dataset result
        if hasattr(res, "to_pandas") and not hasattr(res, "num_rows"):
            res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_once(sf_dir: str, num_cpus: int, headline_only: bool) -> dict:
    _init_ray(num_cpus)
    head = bench_headline(sf_dir, num_cpus)
    queries = {} if headline_only else bench_queries(sf_dir)
    import ray

    ray.shutdown()
    return {
        "metric": "cdc_replay_wall_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "events": head["events"],
        "events_per_sec": round(head["events_per_sec"], 1),
    }


def run_scaling(sf_dir: str, low: int, high: int) -> dict:
    """Two fresh-process runs of the headline at num_cpus=low and =high."""
    results = {}
    for cpus in (low, high):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--cpus", str(cpus), "--sf", sf_dir, "--headline-only"],
            capture_output=True, text=True, cwd=REPO,
            env={**os.environ, "RAY_GRAFT_CPUS": str(cpus)},
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    t_low = results[low]["events_per_sec"]
    t_high = results[high]["events_per_sec"]
    factor = high / low
    return {
        "metric": "scaling_efficiency",
        "value": round(t_high / (factor * t_low), 3),
        "unit": "ratio",
        "sf": sf_dir,
        "cpus_low": low,
        "cpus_high": high,
        "events_per_sec_low": t_low,
        "events_per_sec_high": t_high,
        "queries": {},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=DEFAULT_SF)
    ap.add_argument("--cpus", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--scaling-cpus", default="8,32",
                    help="low,high num_cpus for --scaling")
    args = ap.parse_args()

    if args.scaling:
        low, high = (int(x) for x in args.scaling_cpus.split(","))
        out = run_scaling(args.sf, low, high)
    else:
        out = run_once(args.sf, args.cpus, args.headline_only)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
