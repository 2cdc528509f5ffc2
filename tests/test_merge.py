"""LWW merge kernel unit tests (no Ray) + oracle equivalence on one table.

Techniques mirror the reference's test strategy (SURVEY.md §5): golden
vectors, degenerate inputs, randomized equivalence vs the naive applier.
"""

import numpy as np
import pyarrow as pa
import pytest

from image_report_ray.schema import CHANGE_SCHEMA, SchemaEvolutionError, concat_evolving
from image_report_ray.sources.synth import full_changelog, gen_epoch
from image_report_ray.state.merge import (
    MergeStats,
    compact_changes,
    export_canonical,
    merge_state_with_changes,
    table_digest,
)
from image_report_ray.state.oracle import apply_naive


def mk_changes(rows):
    """rows: list of (lsn, op, conv, turn, text)."""
    cols = {
        "lsn": [r[0] for r in rows],
        "op": [r[1] for r in rows],
        "conv_id": [r[2] for r in rows],
        "turn_idx": [r[3] for r in rows],
        "role": ["user"] * len(rows),
        "text": [r[4] for r in rows],
        "tool": [None] * len(rows),
        "ts": [1_704_067_200_000_000 + r[0] for r in rows],
    }
    return pa.Table.from_pydict(cols, schema=CHANGE_SCHEMA)


def test_compact_keeps_max_lsn_per_key():
    t = mk_changes([(1, "I", "a", 0, "v1"), (3, "U", "a", 0, "v3"), (2, "U", "a", 0, "v2")])
    out = compact_changes(t)
    assert out.num_rows == 1
    assert out.column("text").to_pylist() == ["v3"]
    assert out.column("_seen_i").to_pylist() == [1]
    assert out.column("_seen_u").to_pylist() == [2]


def test_compact_counts_duplicate_lsn():
    t = mk_changes([(1, "I", "a", 0, "v1"), (1, "I", "a", 0, "v1"), (2, "U", "a", 0, "v2")])
    out = compact_changes(t)
    assert out.num_rows == 1
    assert out.column("_dups").to_pylist() == [1]
    # duplicates still count as received under their op
    assert out.column("_seen_i").to_pylist() == [2]


def test_compact_idempotent():
    t = mk_changes([(1, "I", "a", 0, "x"), (2, "U", "b", 1, "y")])
    once = compact_changes(t)
    twice = compact_changes(once)
    assert once.sort_by("lsn").equals(twice.sort_by("lsn"))


def test_merge_basic_ledger():
    t = mk_changes(
        [(1, "I", "a", 0, "a0"), (2, "I", "a", 1, "a1"), (3, "U", "a", 0, "a0v2"), (4, "D", "a", 1, "")]
    )
    state, stats = merge_state_with_changes(None, t)
    stats.check()
    assert stats.received == 4
    assert stats.rows_live == 1
    assert stats.tombstoned == 1
    canon = export_canonical(state)
    assert canon.column("text").to_pylist() == ["a0v2"]


def test_merge_tombstone_blocks_stale_resurrection():
    e1 = mk_changes([(1, "I", "a", 0, "v1"), (5, "D", "a", 0, "")])
    state, _ = merge_state_with_changes(None, e1)
    # A late, stale update (lsn 3 < tombstone lsn 5) must NOT resurrect.
    late = mk_changes([(3, "U", "a", 0, "stale")])
    state2, stats = merge_state_with_changes(state, late)
    assert stats.applied == 0
    assert stats.stale_skipped == 1
    assert export_canonical(state2).num_rows == 0


def test_merge_delete_then_reinsert():
    e = mk_changes([(1, "I", "a", 0, "v1"), (2, "D", "a", 0, ""), (3, "I", "a", 0, "v3")])
    state, _ = merge_state_with_changes(None, e)
    assert export_canonical(state).column("text").to_pylist() == ["v3"]


def test_merge_redelivery_same_lsn_skipped():
    e1 = mk_changes([(1, "I", "a", 0, "v1")])
    state, _ = merge_state_with_changes(None, e1)
    state2, stats = merge_state_with_changes(state, e1)  # redelivered event
    assert stats.applied == 0
    assert stats.received == 1
    assert export_canonical(state2).column("text").to_pylist() == ["v1"]


def test_merge_empty_changes():
    state, stats = merge_state_with_changes(None, mk_changes([]))
    assert state.num_rows == 0
    assert stats.received == 0
    stats.check()


def test_merge_update_to_nonexistent_key_materializes():
    # An update to a key never inserted still lands (upsert semantics),
    # matching the naive oracle.
    e = mk_changes([(1, "U", "ghost", 7, "boo")])
    state, _ = merge_state_with_changes(None, e)
    canon = export_canonical(state)
    assert canon.num_rows == 1
    assert canon.column("conv_id").to_pylist() == ["ghost"]


def test_schema_evolution_null_fill():
    base = mk_changes([(1, "I", "a", 0, "v1")])
    evolved = mk_changes([(2, "I", "b", 0, "v2")]).append_column(
        "meta", pa.array(["m2"])
    )
    state, _ = merge_state_with_changes(None, base)
    state2, _ = merge_state_with_changes(state, evolved)
    canon = export_canonical(state2)
    assert canon.column("meta").to_pylist() == [None, "m2"]


def test_schema_evolution_type_conflict_raises():
    base = mk_changes([(1, "I", "a", 0, "v1")]).append_column("meta", pa.array(["m"]))
    bad = mk_changes([(2, "I", "b", 0, "v2")]).append_column("meta", pa.array([3]))
    with pytest.raises(SchemaEvolutionError):
        concat_evolving([base, bad])


def test_randomized_equivalence_vs_oracle():
    """Seeded random logs; incremental engine merge == naive replay."""
    for seed in range(5):
        log = full_changelog(
            n_epochs=3,
            epoch_size=400,
            seed=seed,
            n_convs=40,
            max_turns=8,
            dup_rate=0.05,
        )
        golden = apply_naive(log)
        state = None
        for epoch in range(3):
            e = gen_epoch(epoch, 400, seed=seed, n_convs=40, max_turns=8, dup_rate=0.05)
            state, stats = merge_state_with_changes(state, e)
            stats.check()
        got = export_canonical(state)
        assert got.equals(golden), f"seed={seed}: engine != oracle"


def test_randomized_equivalence_with_evolution():
    log = full_changelog(
        n_epochs=4, epoch_size=300, seed=9, n_convs=30, max_turns=6, evolve_from_epoch=2
    )
    golden = apply_naive(log)
    state = None
    for epoch in range(4):
        e = gen_epoch(epoch, 300, seed=9, n_convs=30, max_turns=6, evolve_from_epoch=2)
        state, _ = merge_state_with_changes(state, e)
    got = export_canonical(state)
    assert got.equals(golden)


def test_digest_and_sketch_semantics():
    from image_report_ray.state.merge import table_sketch

    t = mk_changes([(1, "I", "a", 0, "x"), (2, "I", "b", 0, "y")])
    perm = t.take(pa.array([1, 0]))
    # the checkpoint digest is defined over the canonical row order
    # (state is always sorted by construction): reorder -> different
    assert table_digest(t) != table_digest(perm)
    assert table_digest(t.slice(0, 1)) != table_digest(t)
    # the order-independent sketch ignores row order
    assert table_sketch(t) == table_sketch(perm)
    assert table_sketch(t.slice(0, 1)) != table_sketch(t)


def test_digest_version_stable_golden():
    """The digest is checkpointed in manifests, so its value is pinned
    forever: any change to the algorithm must bump DIGEST_ALGO and this
    golden together."""
    from image_report_ray.state.merge import DIGEST_ALGO, table_sketch

    g = pa.table(
        {"k": pa.array(["alpha", "beta", None]), "n": pa.array([1, 2, 3], pa.int64())}
    )
    assert DIGEST_ALGO == "irr-sha256-v1"
    assert table_digest(g) == "d00ed986312e9d7e798472bd30689b7f:3"
    # the sketch is its own pinned algorithm (order-independent poly64)
    assert table_sketch(g) == "1e0dd8b777869789:d1162b34447169bf:3"


def test_digest_canonical_semantics():
    t = pa.table(
        {
            "conv_id": pa.array(["a", "b", None, "d"]),
            "ts": pa.array([1, None, 3, 4], pa.timestamp("us")),
            "flag": pa.array([True, False, None, True]),
            "val": pa.array([1.5, float("nan"), None, -2.0]),
        }
    )
    d = table_digest(t)
    # chunk layout must not matter
    assert table_digest(pa.concat_tables([t.slice(0, 2), t.slice(2)])) == d
    # sliced arrays (non-zero buffer offsets) must not matter
    assert table_digest(
        pa.concat_tables([t.slice(0, 1), t.slice(1, 3)])
    ) == d
    # column names are part of the content
    assert table_digest(t.rename_columns(["c", "ts", "flag", "val"])) != d
    # empty string and null are distinct values
    from image_report_ray.state.merge import table_rowhash

    h = table_rowhash(pa.table({"x": pa.array(["", None])}))
    assert h[0] != h[1]


def test_validate_reports_digest_algo_mismatch(ray_session, tmp_path, capsys):
    """An old lake whose manifests carry a different digest algorithm is
    reported as an algorithm mismatch, not as per-partition corruption."""
    import json as _json

    from image_report_ray.cli import main
    from image_report_ray.sources.synth import write_wal

    wal = str(tmp_path / "wal")
    lake_dir = str(tmp_path / "lake")
    write_wal(wal, n_epochs=1, epoch_size=100, n_parts=1, seed=5, n_convs=10)
    assert main(["run", lake_dir, wal, "--partitions", "2"]) == 0
    # simulate a lake written by a different digest algorithm
    import glob
    import os

    commit = sorted(glob.glob(os.path.join(lake_dir, "_commits", "epoch=*.json")))[0]
    rec = _json.load(open(commit))
    rec["digest_algo"] = "someother-v9"
    _json.dump(rec, open(commit, "w"))
    capsys.readouterr()
    assert main(["validate", lake_dir]) == 1
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all("algorithm mismatch" in p for p in out["problems"])
    assert out["problems"]


def test_validate_reports_pre_versioned_manifest(ray_session, tmp_path, capsys):
    """A lake committed before digests were versioned (no digest_algo
    field at all) is 'cannot verify', never 'state digest mismatch'."""
    import glob
    import json as _json
    import os

    from image_report_ray.cli import main
    from image_report_ray.sources.synth import write_wal

    wal = str(tmp_path / "wal")
    lake_dir = str(tmp_path / "lake")
    write_wal(wal, n_epochs=1, epoch_size=100, n_parts=1, seed=5, n_convs=10)
    assert main(["run", lake_dir, wal, "--partitions", "2"]) == 0
    commit = sorted(glob.glob(os.path.join(lake_dir, "_commits", "epoch=*.json")))[0]
    rec = _json.load(open(commit))
    rec.pop("digest_algo", None)  # the field lives at the record level
    _json.dump(rec, open(commit, "w"))
    capsys.readouterr()
    assert main(["validate", lake_dir]) == 1
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["problems"]
    assert all("pre-versioned manifest" in p for p in out["problems"])
    assert not any("state digest mismatch" in p for p in out["problems"])
