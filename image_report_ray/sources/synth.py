"""Deterministic synthetic transcripts / changelog generator (no Ray).

Implements the FIXTURES.md shapes: a base transcripts table and a WAL of
I/U/D change events, seeded (numpy PCG64) so every run is bit-identical.
Generation is vectorized (numpy string ops + fancy indexing) and chunked
per epoch — each epoch derives its own rng stream from ``(seed, epoch)``,
so epochs can be generated independently and out of order.

Knobs mirror the fixture matrix: op mix, duplicate-lsn rate (exactly-once
tests), hot-key fraction (skew / salting tests), and an additive ``meta``
column appearing from a configured epoch onward (schema evolution).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..config import TOOL_VOCABULARY
from ..schema import CHANGE_SCHEMA

_TS_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
_FILLERS = np.array([" lorem ipsum dolor sit amet" * k for k in range(1, 6)])


def gen_epoch(
    epoch: int,
    epoch_size: int,
    *,
    seed: int = 42,
    n_convs: int = 200,
    max_turns: int = 64,
    op_mix: tuple[float, float, float] = (0.6, 0.3, 0.1),
    dup_rate: float = 0.0,
    hot_frac: float = 0.0,
    n_hot: int = 5,
    evolve_from_epoch: int | None = None,
) -> pa.Table:
    """One epoch of change events; lsns are ``[epoch*epoch_size, ...)``.

    Duplicate deliveries (``dup_rate``) re-append a sample of the epoch's
    own rows, so total rows = epoch_size + dups while distinct lsns stay
    epoch_size. Hot-key skew routes ``hot_frac`` of events to ``n_hot``
    conversations (Zipf-hot stand-in).
    """
    rng = np.random.default_rng(np.random.PCG64(seed * 1_000_003 + epoch))
    n = epoch_size
    lsn = np.arange(epoch * epoch_size, epoch * epoch_size + n, dtype=np.int64)

    conv_idx = rng.integers(0, n_convs, size=n)
    if hot_frac > 0 and n_hot > 0:
        hot_mask = rng.random(n) < hot_frac
        conv_idx[hot_mask] = rng.integers(0, min(n_hot, n_convs), size=int(hot_mask.sum()))
    turn_idx = rng.integers(0, max_turns, size=n).astype(np.int32)

    op_draw = rng.random(n)
    op = np.full(n, "U", dtype="U1")
    op[op_draw < op_mix[0]] = "I"
    op[op_draw >= op_mix[0] + op_mix[1]] = "D"

    roles = np.array(["user", "assistant", "assistant", "tool"])
    role = roles[(turn_idx % 4)]
    conv_id = np.char.add("conv-", np.char.zfill(conv_idx.astype("U8"), 8))
    base = np.char.add(
        np.char.add(np.char.add("t", conv_idx.astype("U8")), "_"),
        np.char.add(np.char.add(turn_idx.astype("U8"), "_"), lsn.astype("U12")),
    )
    text = np.char.add(base, _FILLERS[lsn % len(_FILLERS)])

    tool_vocab = np.array(TOOL_VOCABULARY)
    tool = tool_vocab[conv_idx % len(tool_vocab)]
    tool_valid = role == "tool"

    is_d = op == "D"
    payload_valid = ~is_d

    ts = _TS_BASE_US + lsn * 1_000

    cols: dict[str, pa.Array] = {
        "lsn": pa.array(lsn, type=pa.int64()),
        "op": pa.array(op),
        "conv_id": pa.array(conv_id),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(np.where(payload_valid, role, ""), mask=is_d),
        "text": pa.array(np.where(payload_valid, text, ""), mask=is_d),
        "tool": pa.array(
            np.where(tool_valid & payload_valid, tool, ""), mask=~(tool_valid & payload_valid)
        ),
        "ts": pa.array(np.where(payload_valid, ts, 0), mask=is_d, type=pa.timestamp("us")),
    }
    table = pa.Table.from_pydict(cols, schema=CHANGE_SCHEMA)
    if evolve_from_epoch is not None and epoch >= evolve_from_epoch:
        meta = np.char.add("m", lsn.astype("U12"))
        table = table.append_column(
            pa.field("meta", pa.string()), pa.array(np.where(is_d, "", meta), mask=is_d)
        )

    if dup_rate > 0:
        k = int(round(n * dup_rate))
        if k:
            dup_idx = rng.integers(0, n, size=k)
            table = pa.concat_tables([table, table.take(pa.array(np.sort(dup_idx)))])
    return table


def write_wal(
    wal_dir: str,
    *,
    n_epochs: int,
    epoch_size: int,
    n_parts: int = 1,
    **gen_kwargs,
) -> list[str]:
    """Write ``wal_dir/epoch=K/part-J.parquet`` per epoch; return paths.

    ``n_parts > 1`` row-slices each epoch across several files so the Ray
    reader gets one task per part — a single-file epoch serializes the
    whole pre-shuffle chain (read -> changelog -> compact -> route) into
    one task, which caps scaling no matter the CPU count.
    """
    paths = []
    for epoch in range(n_epochs):
        t = gen_epoch(epoch, epoch_size, **gen_kwargs)
        d = os.path.join(wal_dir, f"epoch={epoch:05d}")
        os.makedirs(d, exist_ok=True)
        span = (t.num_rows + n_parts - 1) // n_parts
        for j in range(n_parts):
            part = t.slice(j * span, span)
            if part.num_rows == 0:
                break
            p = os.path.join(d, f"part-{j:03d}.parquet")
            pq.write_table(part, p)
            paths.append(p)
    return paths


def full_changelog(
    n_epochs: int, epoch_size: int, **gen_kwargs
) -> pa.Table:
    """All epochs concatenated (for the naive oracle / small tests)."""
    from ..schema import concat_evolving

    return concat_evolving([gen_epoch(e, epoch_size, **gen_kwargs) for e in range(n_epochs)])


def write_documents_corpus(
    out_dir: str,
    n_docs: int = 200_000,
    *,
    seed: int = 31,
    vocab_size: int = 4_000,
    doc_len: int = 60,
    near_dup_rate: float = 0.05,
    exact_dup_rate: float = 0.02,
    rows_per_file: int = 50_000,
) -> str:
    """Deterministic large synthetic ``documents`` corpus for dedup/text
    benchmarks (same schema as the driver's table: doc_id, text, lang,
    n_chars). Plants exact duplicates and near-duplicates (90% token
    overlap with a base doc) at the configured rates so dedup pipelines
    have real work. Vectorized generation, multiple parquet files so the
    readers parallelize."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    vocab = np.array([f"w{i:05d}" for i in range(vocab_size)], dtype=object)
    langs = np.array(["en", "de", "fr", "es", "ja", "zh"], dtype=object)
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return out_dir

    texts = np.empty(n_docs, dtype=object)
    mat = rng.integers(0, vocab_size, size=(n_docs, doc_len))
    # exact dups: copy a random earlier doc's tokens
    n_ex = int(n_docs * exact_dup_rate)
    ex_idx = rng.choice(np.arange(1, n_docs), size=n_ex, replace=False)
    mat[ex_idx] = mat[rng.integers(0, n_docs, size=n_ex)]
    # near dups: copy then perturb 10% of token positions
    n_nd = int(n_docs * near_dup_rate)
    nd_idx = rng.choice(
        np.setdiff1d(np.arange(1, n_docs), ex_idx), size=n_nd, replace=False
    )
    mat[nd_idx] = mat[rng.integers(0, n_docs, size=n_nd)]
    flip = rng.random((n_nd, doc_len)) < 0.10
    mat[nd_idx] = np.where(
        flip, rng.integers(0, vocab_size, size=(n_nd, doc_len)), mat[nd_idx]
    )
    toks = vocab[mat]
    for i in range(n_docs):
        texts[i] = " ".join(toks[i])
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs[rng.integers(0, len(langs), n_docs)]),
            "n_chars": pa.array(
                np.array([len(x) for x in texts], np.int64)
            ),
        }
    )
    # one logical table, many row groups: readers split on row groups
    pq.write_table(t, path, row_group_size=rows_per_file)
    return out_dir


def write_embeddings_corpus(
    out_dir: str,
    n_vecs: int = 300_000,
    *,
    dim: int = 64,
    seed: int = 47,
    near_dup_rate: float = 0.02,
    noise: float = 0.12,
) -> str:
    """Deterministic large synthetic ``embeddings`` table (vec_id,
    embedding list<float32>) with planted near-duplicate pairs: vec i in
    the planted set is a noisy copy of a base vector, giving cosine
    ~>= 0.97 to its source. A sidecar ``planted_pairs.parquet`` records
    the ground-truth (a, b) pairs for recall measurement."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return out_dir
    m = rng.standard_normal((n_vecs, dim)).astype(np.float32)
    n_nd = int(n_vecs * near_dup_rate)
    dup_idx = rng.choice(np.arange(n_vecs // 2, n_vecs), size=n_nd, replace=False)
    src_idx = rng.integers(0, n_vecs // 2, size=n_nd)
    m[dup_idx] = m[src_idx] + noise * rng.standard_normal((n_nd, dim)).astype(
        np.float32
    )
    flat = pa.array(m.reshape(-1), pa.float32())
    emb = pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n_vecs + 1) * dim, dim), pa.int32()), flat
    )
    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(n_vecs), pa.int64()),
                  "embedding": emb}),
        path, row_group_size=50_000,
    )
    a = np.minimum(src_idx, dup_idx)
    b = np.maximum(src_idx, dup_idx)
    pq.write_table(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}),
        os.path.join(out_dir, "planted_pairs.parquet"),
    )
    return out_dir


def write_events_corpus(
    out_dir: str,
    n_events: int = 10_000_000,
    *,
    n_users: int = 100_000,
    seed: int = 59,
    span_days: int = 14,
) -> str:
    """Deterministic large synthetic ``events`` table (driver schema
    subset: event_id, user_id, event_type, ts, value) for stressing the
    exchange-backed relational/window operators at 100x driver scale."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "events.parquet")
    if os.path.exists(path):
        return out_dir
    etypes = np.array(["click", "view", "purchase", "signup", "error"], dtype=object)
    probs = np.array([0.40, 0.35, 0.13, 0.05, 0.07])
    uid = rng.integers(0, n_users, n_events)
    ts = _TS_BASE_US + rng.integers(0, span_days * 86_400_000_000, n_events)
    ts.sort()
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n_events), pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etypes[rng.choice(5, n_events, p=probs)]),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(
                np.round(rng.uniform(0, 500, n_events), 2)
            ),
        }
    )
    pq.write_table(t, path, row_group_size=500_000)
    return out_dir
