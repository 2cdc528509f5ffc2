"""Near-duplicate detection over the ``documents`` table.

Three members, one semantic family (the reference's hash-bucket near-dedup
precedent: descriptor-hash clustering of near-identical glyphs,
/root/reference/docs/report-schema-v2.md:207-236; the per-doc digest work
is the extractor-registry pattern, /root/reference/hashing_config.py):

* :func:`dedup_ngram_jaccard` — **exact** word-3-gram Jaccard via an
  inverted-index self-join (explode shingles -> join on shingle -> count
  per pair). SQL-oracle-checkable; the correctness anchor.
* :func:`dedup_minhash_lsh` — MinHash signatures + LSH banding generate
  candidate pairs, exact Jaccard verifies them. Same output contract as
  the exact query; the 100 TB scale path (touches O(candidates), not
  O(n^2)).
* :func:`dedup_simhash` — 64-bit SimHash + pigeonhole chunk bucketing for
  small-Hamming-distance pairs.

Scale notes: shingle explosion is per-batch vectorized (numpy on Arrow
list offsets — no Python row loops); the self-join shuffles fixed-width
hashed keys at scale (here the raw shingle string, matching the SQL twin
bit-for-bit); a frequent-shingle cap (drop shingles appearing in > F docs,
like stopword pruning) bounds the quadratic pair blow-up on 100 TB — not
applied at test scale so the oracle matches exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._util import ds_to_table, finalize

_NGRAM = 3
_JOIN_PARTS = 8

# MinHash parameters: 128 permutations = 32 bands x 4 rows. For Jaccard
# s, P(candidate) = 1 - (1 - s^4)^32: ~0.99997 at s=0.5, ~0.38 at 0.35,
# ~0.04 at 0.2 — a sharp threshold around ~0.45.
_MH_PERMS = 128
_MH_BANDS = 32
_MH_ROWS = 4
_MH_PRIME = np.uint64((1 << 61) - 1)
_MH_SEED = 0x5EED


def _rd():
    import ray.data as rd

    return rd


# ---- shingling kernels (pure, importable without Ray) -----------------


def _tokenize(text_col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Lowercase whitespace tokens per doc -> (flat_tokens, list_offsets).

    Token semantics match the SQL twin's ``regexp_extract_all(lower(text),
    '\\S+')`` exactly: maximal non-space runs."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_lower(text_col), r"\s+")
    toks = pa.array(
        [[t for t in row if t != ""] for row in toks.to_pylist()]
    ) if _has_empty(toks) else toks
    flat = np.asarray(toks.flatten().to_pylist(), dtype=object)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return flat, offsets


def _has_empty(list_arr: pa.Array) -> bool:
    flat = list_arr.flatten()
    if len(flat) == 0:
        return False
    return bool(pc.any(pc.equal(flat, "")).as_py())


def doc_shingles(batch: pa.Table) -> pd.DataFrame:
    """(doc_id, shingle) pairs, distinct within doc — vectorized explode.

    Word ``_NGRAM``-grams joined by single spaces; docs with fewer than
    ``_NGRAM`` tokens contribute nothing (matches the SQL ``len(ws) >= 3``
    guard)."""
    flat, offsets = _tokenize(batch.column("text"))
    n_docs = len(offsets) - 1
    if len(flat) == 0 or n_docs == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "shingle": pd.Series([], dtype="object")})
    # shingle i spans tokens [i, i+NGRAM); valid iff it stays in one doc
    n = len(flat)
    if n < _NGRAM:
        sh = np.array([], dtype=object)
        valid = np.array([], dtype=bool)
    else:
        sh = flat[: n - _NGRAM + 1].copy()
        for j in range(1, _NGRAM):
            sh = sh + " "
            sh = sh + flat[j : n - _NGRAM + 1 + j]
        doc_idx_full = np.repeat(np.arange(n_docs), np.diff(offsets))
        valid = doc_idx_full[: n - _NGRAM + 1] == doc_idx_full[_NGRAM - 1 :]
    doc_ids = batch.column("doc_id").to_numpy()
    doc_idx = np.repeat(np.arange(n_docs), np.diff(offsets))[: max(n - _NGRAM + 1, 0)]
    df = pd.DataFrame({"doc_id": doc_ids[doc_idx[valid]], "shingle": sh[valid]})
    return df.drop_duplicates(ignore_index=True)


def _hash_shingles(shingles: np.ndarray) -> np.ndarray:
    """Stable 64-bit shingle hashes (vectorized utf8 hashing via pandas)."""
    return pd.util.hash_array(shingles.astype(object)).astype(np.uint64)


# ---- exact n-gram Jaccard (oracle-checkable) --------------------------


def dedup_ngram_jaccard(sf_dir: str, tau: float = 0.2) -> pa.Table:
    """All document pairs with word-3-gram Jaccard >= ``tau``.

    Inverted-index shape: explode distinct shingles, hash-join the index
    with itself on the shingle, count common shingles per (a < b) pair,
    then Jaccard against broadcast per-doc set sizes."""
    import ray
    from ray.data.aggregate import Count

    rd = _rd()

    def explode(t: pa.Table) -> pa.Table:
        df = doc_shingles(t)
        return pa.Table.from_pandas(df, preserve_index=False)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sh = ds.map_batches(explode, batch_format="pyarrow")

    # per-doc distinct-shingle counts: tiny result, broadcast for the final
    # Jaccard denominator (the reference's broadcast-dimension-table shape,
    # /root/reference/papersize.py:37-65)
    cnt_t = ds_to_table(sh.groupby("doc_id").aggregate(Count(alias_name="n")))
    sizes = dict(
        zip(cnt_t.column("doc_id").to_pylist(), cnt_t.column("n").to_pylist())
    )
    sizes_ref = ray.put(sizes)

    joined = sh.join(
        sh,
        "inner",
        num_partitions=_JOIN_PARTS,
        on=("shingle",),
        right_on=("shingle",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def pair_key(t: pa.Table) -> pa.Table:
        a = t.column(_col(t, "doc_id", "a")).to_numpy()
        b = t.column(_col(t, "doc_id", "b")).to_numpy()
        keep = a < b
        key = (a[keep].astype(np.int64) << 32) | b[keep].astype(np.int64)
        return pa.table({"pair": pa.array(key, pa.int64())})

    pairs = joined.map_batches(pair_key, batch_format="pyarrow").groupby(
        "pair"
    ).aggregate(Count(alias_name="n_common"))

    def score(t: pa.Table) -> pa.Table:
        szs = ray.get(sizes_ref)
        key = t.column("pair").to_numpy()
        a = (key >> 32).astype(np.int64)
        b = (key & 0xFFFFFFFF).astype(np.int64)
        i = t.column("n_common").to_numpy().astype(np.int64)
        na = np.array([szs[x] for x in a], dtype=np.int64)
        nb = np.array([szs[x] for x in b], dtype=np.int64)
        jac = i / (na + nb - i)
        keep = jac >= tau
        return pa.table(
            {
                "doc_id_a": pa.array(a[keep]),
                "doc_id_b": pa.array(b[keep]),
                "n_common": pa.array(i[keep]),
                "jaccard": pa.array(np.round(jac[keep], 6)),
            }
        )

    t = ds_to_table(pairs.map_batches(score, batch_format="pyarrow"))
    return finalize(t, [("doc_id_a", "ascending"), ("doc_id_b", "ascending")])


def _col(t: pa.Table, base: str, side: str) -> str:
    """Resolve a join output column name across Ray suffixing conventions."""
    for cand in (f"{base}_{side}", f"{base}{side}", base):
        if cand in t.column_names:
            return cand
    raise KeyError(f"{base} ({side}) not in {t.column_names}")


# ---- MinHash + LSH (scale path) ---------------------------------------


def _perm_coeffs() -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(_MH_SEED)
    a = rng.integers(1, _MH_PRIME, size=_MH_PERMS, dtype=np.uint64)
    b = rng.integers(0, _MH_PRIME, size=_MH_PERMS, dtype=np.uint64)
    return a, b


def minhash_signatures(batch: pa.Table) -> pa.Table:
    """Per-doc 128-slot MinHash signature over hashed word-3-grams.

    Vectorized: (shingles x perms) universal-hash matrix min-reduced per
    doc segment (``np.minimum.reduceat``)."""
    df = doc_shingles(batch)
    if not len(df):
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "sig": pa.array([], pa.list_(pa.uint64()))}
        )
    h = _hash_shingles(df["shingle"].to_numpy())
    doc_of = df["doc_id"].to_numpy()
    starts = np.flatnonzero(np.r_[True, doc_of[1:] != doc_of[:-1]])
    a, b = _perm_coeffs()
    # universal hash into [0, PRIME); uint64 wraparound is fine for minhash
    hv = (h[:, None] * a[None, :] + b[None, :]) % _MH_PRIME
    sigs = np.minimum.reduceat(hv, starts, axis=0)
    return pa.table(
        {
            "doc_id": pa.array(doc_of[starts], pa.int64()),
            "sig": pa.array(list(sigs), pa.list_(pa.uint64())),
        }
    )


def dedup_minhash_lsh(sf_dir: str, tau: float = 0.5) -> pa.Table:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    Output contract matches :func:`dedup_ngram_jaccard` (for pairs the
    banding recalls — essentially all at Jaccard >= ``tau`` = 0.5 with
    32x4 banding). Candidate generation touches O(colliding pairs); the
    verify step uses broadcast hashed shingle sets (at 100 TB: a second
    co-partitioned pass instead of a broadcast)."""
    import ray
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sigs = ds.map_batches(minhash_signatures, batch_format="pyarrow")

    def band_explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"band_key": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64())}
            )
        sig = np.stack(t.column("sig").to_numpy(zero_copy_only=False))
        doc = t.column("doc_id").to_numpy()
        keys, docs = [], []
        mix = np.uint64(0x9E3779B97F4A7C15)
        for bi in range(_MH_BANDS):
            rowslice = sig[:, bi * _MH_ROWS : (bi + 1) * _MH_ROWS]
            bh = rowslice[:, 0].copy()
            for j in range(1, _MH_ROWS):
                bh = bh * mix ^ rowslice[:, j]
            keys.append(np.char.add(f"{bi}:", bh.astype("U20")))
            docs.append(doc)
        return pa.table(
            {
                "band_key": pa.array(np.concatenate(keys)),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
            }
        )

    bands = sigs.map_batches(band_explode, batch_format="pyarrow")
    joined = bands.join(
        bands,
        "inner",
        num_partitions=_JOIN_PARTS,
        on=("band_key",),
        right_on=("band_key",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def pair_key(t: pa.Table) -> pa.Table:
        a = t.column(_col(t, "doc_id", "a")).to_numpy()
        b = t.column(_col(t, "doc_id", "b")).to_numpy()
        keep = a < b
        key = (a[keep].astype(np.int64) << 32) | b[keep].astype(np.int64)
        return pa.table({"pair": pa.array(np.unique(key), pa.int64())})

    cands = (
        joined.map_batches(pair_key, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Count(alias_name="_nb"))
    )

    # broadcast hashed shingle sets for the exact verify
    def shingle_sets(t: pa.Table) -> pa.Table:
        df = doc_shingles(t)
        if not len(df):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "hs": pa.array([], pa.list_(pa.uint64()))}
            )
        h = _hash_shingles(df["shingle"].to_numpy())
        doc_of = df["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, doc_of[1:] != doc_of[:-1]])
        ends = np.r_[starts[1:], len(doc_of)]
        return pa.table(
            {
                "doc_id": pa.array(doc_of[starts], pa.int64()),
                "hs": pa.array(
                    [np.sort(h[s:e]) for s, e in zip(starts, ends)],
                    pa.list_(pa.uint64()),
                ),
            }
        )

    sets_t = ds_to_table(
        ds.map_batches(shingle_sets, batch_format="pyarrow")
    )
    sets = {
        d: np.asarray(s, dtype=np.uint64)
        for d, s in zip(
            sets_t.column("doc_id").to_pylist(), sets_t.column("hs").to_pylist()
        )
    }
    sets_ref = ray.put(sets)

    def verify(t: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref)
        key = t.column("pair").to_numpy()
        a = (key >> 32).astype(np.int64)
        b = (key & 0xFFFFFFFF).astype(np.int64)
        out_a, out_b, out_i, out_j = [], [], [], []
        for x, y in zip(a, b):
            sx, sy = ss.get(x), ss.get(y)
            if sx is None or sy is None:
                continue
            inter = len(np.intersect1d(sx, sy, assume_unique=True))
            jac = inter / (len(sx) + len(sy) - inter)
            if jac >= tau:
                out_a.append(x)
                out_b.append(y)
                out_i.append(inter)
                out_j.append(round(jac, 6))
        return pa.table(
            {
                "doc_id_a": pa.array(out_a, pa.int64()),
                "doc_id_b": pa.array(out_b, pa.int64()),
                "n_common": pa.array(out_i, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    t = ds_to_table(cands.map_batches(verify, batch_format="pyarrow"))
    return finalize(t, [("doc_id_a", "ascending"), ("doc_id_b", "ascending")])


# ---- SimHash ----------------------------------------------------------

_SH_CHUNKS = 4  # pigeonhole: hamming <= CHUNKS-1 guarantees a chunk match


def simhash64(batch: pa.Table) -> pa.Table:
    """Per-doc 64-bit SimHash over hashed whitespace tokens (vectorized:
    bit matrix segment-summed per doc, sign -> bits)."""
    flat, offsets = _tokenize(batch.column("text"))
    doc_ids = batch.column("doc_id").to_numpy()
    n_docs = len(offsets) - 1
    counts = np.diff(offsets)
    if len(flat) == 0:
        return pa.table(
            {"doc_id": pa.array(doc_ids, pa.int64()),
             "simhash": pa.array(np.zeros(n_docs, np.uint64))}
        )
    h = pd.util.hash_array(flat.astype(object)).astype(np.uint64)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int32
    ) * 2 - 1
    starts = offsets[:-1].copy()
    # reduceat needs strictly valid starts; empty docs handled after
    nonempty = counts > 0
    safe_starts = starts[nonempty]
    sums = np.zeros((n_docs, 64), dtype=np.int64)
    if len(safe_starts):
        sums[nonempty] = np.add.reduceat(bits, safe_starts, axis=0)[
            : int(nonempty.sum())
        ]
    sh = (sums > 0).astype(np.uint64) @ (
        np.uint64(1) << np.arange(64, dtype=np.uint64)
    )
    return pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()), "simhash": pa.array(sh)}
    )


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Document pairs whose 64-bit SimHashes differ by <= ``max_hamming``
    bits. Candidates via 16-bit-chunk pigeonhole bucketing (any pair
    within distance CHUNKS-1 shares >= 1 exact chunk), verified by
    popcount of the XOR."""
    import ray
    from ray.data.aggregate import Count

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    hashes = ds.map_batches(simhash64, batch_format="pyarrow")

    hash_t = ds_to_table(hashes)
    hmap = dict(
        zip(
            hash_t.column("doc_id").to_pylist(),
            (np.uint64(x) for x in hash_t.column("simhash").to_pylist()),
        )
    )
    hmap_ref = ray.put(hmap)

    def chunk_explode(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy()
        sh = t.column("simhash").to_numpy().astype(np.uint64)
        keys, docs = [], []
        for ci in range(_SH_CHUNKS):
            chunk = (sh >> np.uint64(16 * ci)) & np.uint64(0xFFFF)
            keys.append(chunk.astype(np.int64) * _SH_CHUNKS + ci)
            docs.append(doc)
        return pa.table(
            {
                "chunk_key": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
            }
        )

    chunks = hashes.map_batches(chunk_explode, batch_format="pyarrow")
    joined = chunks.join(
        chunks,
        "inner",
        num_partitions=_JOIN_PARTS,
        on=("chunk_key",),
        right_on=("chunk_key",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def pair_key(t: pa.Table) -> pa.Table:
        a = t.column(_col(t, "doc_id", "a")).to_numpy()
        b = t.column(_col(t, "doc_id", "b")).to_numpy()
        keep = a < b
        key = (a[keep].astype(np.int64) << 32) | b[keep].astype(np.int64)
        return pa.table({"pair": pa.array(np.unique(key), pa.int64())})

    cands = (
        joined.map_batches(pair_key, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Count(alias_name="_nb"))
    )

    def verify(t: pa.Table) -> pa.Table:
        hm = ray.get(hmap_ref)
        key = t.column("pair").to_numpy()
        a = (key >> 32).astype(np.int64)
        b = (key & 0xFFFFFFFF).astype(np.int64)
        ha = np.array([hm[x] for x in a], dtype=np.uint64)
        hb = np.array([hm[x] for x in b], dtype=np.uint64)
        x = ha ^ hb
        dist = np.zeros(len(x), dtype=np.int64)
        for shift in range(0, 64, 8):
            dist += np.unpackbits(
                ((x >> np.uint64(shift)) & np.uint64(0xFF)).astype(np.uint8)[:, None],
                axis=1,
            ).sum(axis=1).astype(np.int64)
        keep = dist <= max_hamming
        return pa.table(
            {
                "doc_id_a": pa.array(a[keep]),
                "doc_id_b": pa.array(b[keep]),
                "hamming": pa.array(dist[keep]),
            }
        )

    t = ds_to_table(cands.map_batches(verify, batch_format="pyarrow"))
    return finalize(t, [("doc_id_a", "ascending"), ("doc_id_b", "ascending")])
