"""Bloom-filter broadcast for growing key sets.

The reference's broadcast dimension-table join (papersize.py:37-65) ships
a genuinely fixed-size side. Query pipelines here have key sets that GROW
with the data (q3's segment-filtered customer keys, the anti-join's
distinct order custkeys): broadcasting them exactly stops being sane
above a few million keys. Above a gate those pipelines switch to this
module's shape:

1. build a Bloom filter over the key column DISTRIBUTED — one bitmap per
   input block, OR-folded in a tree (Bloom union is bitwise OR), so no
   task ever sees the whole key set;
2. broadcast the bitmap once (``ray.put``) and prefilter the big side
   vectorized inside ``map_batches`` — false positives only, never false
   negatives;
3. confirm exactly with a co-partitioned exchange pass on the key
   (`exchange.exchange_reduce`), which sees only the bloom survivors.

The filter is plain numpy (uint64 words) so the kernel is testable
without Ray. Double hashing (Kirsch–Mitzenmacher, 2006): position_i =
h1 + i*h2 mod m over ``hash_key``'s stable 64-bit key hash, so string
and integer keys both route through one code path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .exchange import hash_key, _mix_int_keys

_BITS_PER_KEY = 10  # ~1% false-positive rate at k=7
_N_HASHES = 7
_H2_SALT = np.uint64(0x9E3779B97F4A7C15)


def bloom_params(n_keys: int) -> tuple[int, int]:
    """(n_bits, k) for an expected key count — n_bits is a power of two
    (cheap masking) of at least 2^16."""
    n_bits = 1 << max(16, int(np.ceil(np.log2(max(n_keys, 1) * _BITS_PER_KEY))))
    return n_bits, _N_HASHES


def _positions(col: "pa.ChunkedArray | pa.Array", n_bits: int, k: int) -> np.ndarray:
    """(n_values, k) bit positions via double hashing on the exchange's
    stable key hash."""
    h1 = hash_key(col)
    h2 = _mix_int_keys(h1 ^ _H2_SALT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(n_bits - 1)


def bloom_insert(words: np.ndarray, col, n_bits: int, k: int) -> None:
    """Set this column's key bits in the bitmap (in place, vectorized)."""
    if len(col) == 0:
        return
    pos = _positions(col, n_bits, k).ravel()
    np.bitwise_or.at(
        words, (pos >> np.uint64(6)).astype(np.int64),
        np.uint64(1) << (pos & np.uint64(63)),
    )


def bloom_contains(words: np.ndarray, col, n_bits: int, k: int) -> np.ndarray:
    """Boolean membership mask — True is "maybe present" (false positives
    possible), False is "definitely absent"."""
    if len(col) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(col, n_bits, k)
    bits = (
        words[(pos >> np.uint64(6)).astype(np.int64)]
        >> (pos & np.uint64(63))
    ) & np.uint64(1)
    return bits.all(axis=1)


def build_bloom_distributed(
    block_refs: list, key_col: str, n_keys: int, fold_width: int = 8
) -> tuple[np.ndarray, int, int]:
    """Build (words, n_bits, k) over the key column of Arrow block refs:
    one bitmap per block, tree-OR fold ``fold_width`` at a time. Driver
    holds only bitmaps (O(n_bits), independent of row count)."""
    import ray

    n_bits, k = bloom_params(n_keys)

    @ray.remote
    def block_bloom(block: pa.Table):
        words = np.zeros(n_bits >> 6, dtype=np.uint64)
        if block.num_rows and key_col in block.column_names:
            bloom_insert(words, block.column(key_col), n_bits, k)
        return words

    @ray.remote
    def or_fold(*ws):
        return np.bitwise_or.reduce(ws)

    refs = [block_bloom.remote(r) for r in block_refs]
    if not refs:
        return np.zeros(n_bits >> 6, dtype=np.uint64), n_bits, k
    while len(refs) > 1:
        refs = [
            or_fold.remote(*refs[i : i + fold_width])
            for i in range(0, len(refs), fold_width)
        ]
    return ray.get(refs[0]), n_bits, k
