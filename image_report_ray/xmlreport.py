"""Per-partition XML lineage reports.

The engine's replacement for the reference's per-image XML reports: one
self-describing, self-auditing XML document per (partition, epoch), carrying
the counts, durations and parameters that produced it — the same attribute
discipline as ``<hashes computed_count=.. failed_count=.. duration_sec=..>``
(/root/reference/ir:218-221) and the root's ``generation_duration_sec``
(/root/reference/ir:353). Integer profiles are RLE-encoded and declared
``encoding="rle"`` exactly like the reference's projection profiles
(/root/reference/ir:280-283, codec /root/reference/utils.py:229-267).

Conservation invariants are *asserted at build time*, not just logged —
the v2 design's ledger discipline
(/root/reference/docs/report-schema-v2.md:121-137).
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from . import VERSION
from .state.merge import MergeStats


def create_element(
    parent: ET.Element | None, tag: str, text: str | None = None, **attrs
) -> ET.Element:
    """Child-element helper: str()-coerce attrs, drop ``None`` attrs
    (behavioral twin of /root/reference/utils.py:210-226)."""
    clean = {k: str(v) for k, v in attrs.items() if v is not None}
    elem = ET.Element(tag, clean) if parent is None else ET.SubElement(parent, tag, clean)
    if text is not None:
        elem.text = text
    return elem


def build_partition_report(
    *,
    pid: int,
    epoch: int,
    stats: MergeStats,
    digest: str,
    duration_sec: float,
    metrics: dict | None = None,
    metrics_computed: int = 0,
    metrics_failed: int = 0,
    metrics_duration_sec: float = 0.0,
    params: dict | None = None,
) -> ET.Element:
    """One partition-epoch lineage document. Asserts the conservation
    ledger before emitting (a torn ledger must fail the job, not ship)."""
    stats.check()

    root = create_element(
        None,
        "partition_lineage",
        version=VERSION,
        partition=pid,
        epoch=epoch,
        merge_duration_sec=f"{duration_sec:.6f}",
    )
    create_element(
        root,
        "ledger",
        received=stats.received,
        received_i=stats.received_i,
        received_u=stats.received_u,
        received_d=stats.received_d,
        applied=stats.applied,
        stale_skipped=stats.stale_skipped,
        dup_skipped=stats.dup_skipped,
    )
    create_element(
        root,
        "state",
        rows_live=stats.rows_live,
        tombstoned=stats.tombstoned,
        keys_total=stats.keys_total,
        last_lsn=stats.last_lsn,
        digest=digest,
    )
    if metrics is not None:
        # The reference's hash-section discipline: computed/failed counts
        # + section wall-clock as attributes (/root/reference/ir:218-221),
        # per-item status entries for failures (/root/reference/ir:180-216).
        msec = create_element(
            root,
            "metrics",
            computed_count=metrics_computed,
            failed_count=metrics_failed,
            duration_sec=f"{metrics_duration_sec:.6f}",
        )
        for name in sorted(metrics):
            text, attrs = metrics[name]
            create_element(msec, "metric", text=text, name=name, **attrs)
    if stats.hot_keys:
        hot = create_element(root, "hot_conversations", count=len(stats.hot_keys))
        for rank, (conv, n) in enumerate(stats.hot_keys, start=1):
            create_element(hot, "conversation", id=conv, events=n, rank=rank)
    if params:
        create_element(root, "params", **params)
    return root


def write_report(elem: ET.Element, path: str) -> None:
    """Pretty-printed UTF-8 with XML declaration, parents created
    (/root/reference/ir:402-411); atomic via tmp+rename so a crashed
    writer never leaves a torn report."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tree = ET.ElementTree(elem)
    ET.indent(tree)
    tmp = path + ".tmp"
    tree.write(tmp, encoding="UTF-8", xml_declaration=True)
    os.replace(tmp, path)


def read_report(path: str) -> ET.Element:
    return ET.parse(path).getroot()
