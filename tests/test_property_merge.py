"""Property-based LWW-merge tests (hypothesis): for ANY event sequence —
arbitrary op mix, duplicate lsns, arbitrary epoch splits — the engine's
kernel path equals the naive oracle, and the merge is associative across
epoch boundaries. The randomized-equivalence discipline of
/root/reference/tests/test_hashing_config.py:12-39, upgraded to generated
inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from image_report_ray.schema import CHANGE_SCHEMA
from image_report_ray.state.merge import (
    compact_changes,
    export_canonical,
    merge_state_with_changes,
)
from image_report_ray.state.oracle import apply_naive

_CONVS = ["c0", "c1", "c2"]
_ROLES = ["user", "assistant", "tool"]


@st.composite
def changelogs(draw, max_events: int = 60):
    n = draw(st.integers(1, max_events))
    # lsns: unique base + optional duplicate deliveries
    lsns = list(range(n))
    dup_idx = draw(
        st.lists(st.integers(0, n - 1), max_size=max(1, n // 4), unique=True)
    )
    rows = []
    for lsn in lsns:
        op = draw(st.sampled_from(["I", "U", "D"]))
        conv = draw(st.sampled_from(_CONVS))
        turn = draw(st.integers(0, 3))
        is_d = op == "D"
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": conv,
                "turn_idx": turn,
                "role": None if is_d else draw(st.sampled_from(_ROLES)),
                "text": None if is_d else f"t{lsn}",
                "tool": None,
                "ts": None,
            }
        )
    table = pa.Table.from_pylist(rows, schema=CHANGE_SCHEMA)
    if dup_idx:
        table = pa.concat_tables([table, table.take(pa.array(sorted(dup_idx)))])
    # delivery order is arbitrary: shuffle rows deterministically
    perm = draw(st.permutations(list(range(table.num_rows))))
    return table.take(pa.array(perm))


@given(changelogs())
@settings(max_examples=60, deadline=None)
def test_merge_equals_oracle_any_sequence(log):
    state, stats = merge_state_with_changes(None, log)
    stats.check()
    assert export_canonical(state).equals(apply_naive(log))


@given(changelogs(), st.integers(0, 60))
@settings(max_examples=60, deadline=None)
def test_merge_associative_across_any_epoch_split(log, cut):
    """Applying [A then B] equals applying [A ∪ B]: the epoch boundary
    must be invisible in the final state (exactly-once replay)."""
    cut = min(cut, log.num_rows)
    a, b = log.slice(0, cut), log.slice(cut)
    s1, st1 = merge_state_with_changes(None, a)
    if b.num_rows:
        s1, st2 = merge_state_with_changes(s1, b, prior_last_lsn=st1.last_lsn)
    whole, _ = merge_state_with_changes(None, log)
    assert export_canonical(s1).equals(export_canonical(whole))


@given(changelogs())
@settings(max_examples=40, deadline=None)
def test_compact_preserves_merge_result_and_accounting(log):
    compacted = compact_changes(log)
    s_raw, st_raw = merge_state_with_changes(None, log)
    s_cmp, st_cmp = merge_state_with_changes(None, compacted)
    assert export_canonical(s_cmp).equals(export_canonical(s_raw))
    assert st_cmp.received == st_raw.received == log.num_rows
    assert st_cmp.dup_skipped == st_raw.dup_skipped


@given(changelogs(), changelogs())
@settings(max_examples=50, deadline=None)
def test_diff_snapshots_matches_naive_dict_diff(log_a, log_b):
    """The pure change-feed kernel == a dict-based diff of the two
    snapshots, for ANY pair of states (I/D/U classification, identical
    rewrites do not feed, applying the feed to snapshot A yields B)."""
    from image_report_ray.pipelines.cdc import diff_snapshots

    # two arbitrary canonical snapshots (replayed from random logs; B
    # extends A's lsn space so keys overlap with both same and changed
    # payloads)
    sa = apply_naive(log_a)
    sb = apply_naive(log_b)
    feed = diff_snapshots(sa, sb)

    def as_dict(t):
        return {
            (r["conv_id"], r["turn_idx"]): tuple(
                v for k, v in sorted(r.items())
                if k not in ("conv_id", "turn_idx")
            )
            for r in t.to_pylist()
        }

    da, db = as_dict(sa), as_dict(sb)
    expect = {}
    for k in db:
        if k not in da:
            expect[k] = "I"
        elif db[k] != da[k]:
            expect[k] = "U"
    for k in da:
        if k not in db:
            expect[k] = "D"
    got = {
        (r["conv_id"], r["turn_idx"]): r["op"] for r in feed.to_pylist()
    }
    assert got == expect
    # replaying the feed over A converges to B
    state = dict(da)
    payload_keys = [
        k for k in sorted(sb.column_names)
        if k not in ("conv_id", "turn_idx")
    ]
    for r in feed.to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "D":
            state.pop(k, None)
        else:
            state[k] = tuple(r[c] for c in payload_keys)
    assert state == db
