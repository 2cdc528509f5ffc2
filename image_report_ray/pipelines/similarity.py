"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine is the exact baseline: the query matrix is broadcast
once (``ray.put``), each batch does one float64 matmul against it, and only
per-batch top-k survivors travel to the driver — O(k·num_batches) rows
leave the cluster, never the similarity matrix. The IVF/LSH bucketed
variant (``pipelines/dedup.py`` shares its hyperplane machinery) is the
scale path for 100 TB.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._util import ds_to_table, finalize, round_col


def _rd():
    import ray.data as rd

    return rd


def _stack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix, zero-copy flatten."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


# ---- shared sub-result cache -------------------------------------------
#
# kmeans assignments and verified near-dup pair graphs are recomputed by
# several queries over the same static corpus (kmeans_embed, semdedup,
# embedding_dup_clusters, embedding_near_dups all at the same threshold)
# — the cdcq._shared_lake idea one module over: persist each derived
# table as content-fingerprinted parquet shards under /tmp (one file per
# partition ref, atomic-rename publish), so the second consumer reads
# O(parts) files instead of re-running the kmeans waves / the LSH sign +
# verify exchange. Parquet round-trips int64/float64 bit-exactly, and
# shard order is the ref order, so cached and fresh routes are
# bit-identical downstream.

_SIM_CACHE_ROOT = "/tmp/irr-sim-cache"
_SIM_CACHE_VER = 1
_SIM_RW_REMOTES = None


def _sim_rw():
    global _SIM_RW_REMOTES
    if _SIM_RW_REMOTES is None:
        import ray

        @ray.remote
        def read_part(path: str) -> pa.Table:
            import pyarrow.parquet as pq

            return pq.read_table(path)

        @ray.remote
        def write_part(t: pa.Table, path: str) -> None:
            import pyarrow.parquet as pq

            from ..state.manifest import PARQUET_OPTS

            pq.write_table(t, path, **PARQUET_OPTS)

        _SIM_RW_REMOTES = (read_part, write_part)
    return _SIM_RW_REMOTES


def _emb_tag(sf_dir: str, params: str) -> str:
    """``<path-hash>-<content-hash>``: path component scopes eviction to
    this corpus; content component fingerprints the embeddings file and
    every kernel parameter baked into the cached result."""
    import hashlib

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    ph = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    ch = hashlib.sha1(
        f"{st.st_size}:{st.st_mtime_ns}:{params}:{_SIM_CACHE_VER}".encode()
    ).hexdigest()[:10]
    return f"{ph}-{ch}"


def _cached_refs(sf_dir: str, variant: str, params: str, build) -> list:
    """Return the derived table's partition refs, building + publishing
    the parquet shards once per (corpus content, params). ``build()``
    returns the fresh refs; they are returned directly after the shards
    publish (no re-read on the building call)."""
    import shutil

    import ray

    read_part, write_part = _sim_rw()
    tag = _emb_tag(sf_dir, params)
    final = os.path.join(_SIM_CACHE_ROOT, f"{variant}-{tag}")
    if os.path.isdir(final):
        names = sorted(
            n for n in os.listdir(final) if n.endswith(".parquet")
        )
        return [read_part.remote(os.path.join(final, n)) for n in names]
    refs = build()
    os.makedirs(_SIM_CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".build-{variant}-", dir=_SIM_CACHE_ROOT)
    try:
        ray.get([
            write_part.remote(r, os.path.join(tmp, f"part-{i:05d}.parquet"))
            for i, r in enumerate(refs)
        ])
        try:
            os.rename(tmp, final)
        except OSError:  # concurrent builder won the publish race
            shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    _sim_sweep(variant, sf_dir, keep=os.path.basename(final))
    return refs


def _sim_sweep(variant: str, sf_dir: str, keep: str) -> None:
    """Evict superseded builds of the same (variant, corpus dir) and
    hour-stale .build-* dirs — /tmp stays bounded across corpus
    regenerations; other corpora's entries are untouched."""
    import hashlib
    import shutil
    import time

    ph = hashlib.sha1(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    prefix = f"{variant}-{ph}-"
    try:
        now = time.time()
        for name in os.listdir(_SIM_CACHE_ROOT):
            path = os.path.join(_SIM_CACHE_ROOT, name)
            if name == keep:
                continue
            stale_build = (
                name.startswith(".build-")
                and now - os.path.getmtime(path) > 3600
            )
            if stale_build or name.startswith(prefix):
                shutil.rmtree(path, ignore_errors=True)
    except OSError:
        pass  # best-effort housekeeping — never fail the query


def _query_vector(sf_dir: str, vec_id: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    row = t.filter(pc.equal(t.column("vec_id"), vec_id))
    if row.num_rows == 0:
        raise ValueError(f"vec_id {vec_id} not found")
    return _stack(row.column("embedding"))[0]


def knn_cosine(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pa.Table:
    """Exact top-k cosine neighbors of one stored vector (excluding it)."""
    import ray

    rd = _rd()
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def batch_topk(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _stack(t.column("embedding"))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qv) / norms
        ids = t.column("vec_id").to_numpy()
        keep = ids != query_vec_id
        sims, ids = sims[keep], ids[keep]
        if len(ids) > k:  # survivors only: per-batch top-k
            part = np.argpartition(-sims, k)[:k]
            sims, ids = sims[part], ids[part]
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "sim": pa.array(sims)})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = ds_to_table(ds.map_batches(batch_topk, batch_format="pyarrow"))
    t = finalize(t, [("sim", "descending"), ("vec_id", "ascending")]).slice(0, k)
    rnk = pa.array(np.arange(1, t.num_rows + 1), pa.int64())
    return t.select(["vec_id"]).append_column("rnk", rnk).select(["rnk", "vec_id"])


def _smallest_vectors(sf_dir: str, n: int) -> pa.Table:
    """The ``n`` SMALLEST vec_ids with their embeddings — the order-free
    deterministic sample rule shared with the IVF trainer (``first rows
    read`` would depend on block arrival order). Per-block partial
    top-N tree-folds; the driver holds only the final n rows."""
    import ray

    rd = _rd()

    @ray.remote
    def part_smallest(*tabs: pa.Table) -> pa.Table:
        live = [t for t in tabs if t.num_rows and "vec_id" in t.column_names]
        if not live:
            return tabs[0]
        t = pa.concat_tables(live, promote_options="default")
        ids = t.column("vec_id").to_numpy()
        if len(ids) > n:
            t = t.take(pa.array(np.argsort(ids, kind="stable")[:n]))
        return t

    refs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_arrow_refs()
    outs = [part_smallest.remote(r) for r in refs]
    while len(outs) > 1:
        outs = [part_smallest.remote(*outs[i : i + 8]) for i in range(0, len(outs), 8)]
    t = ray.get(outs[0])
    return t.take(pa.array(np.argsort(t.column("vec_id").to_numpy(), kind="stable")))


def knn_join(sf_dir: str, n_queries: int = 8, k: int = 10) -> pa.Table:
    """Batched multi-query exact retrieval join — the RAG / batch-lookup
    shape: every query vector gets its top-``k`` cosine neighbors among
    all OTHER stored vectors in ONE streamed pass over the corpus. The
    query set is the ``n_queries`` smallest vec_ids (the IVF trainer's
    order-free rule, SQL-expressible).

    Scale shape: the (dim x Q) query matrix is broadcast once
    (``ray.put``); each corpus block does a single (B x dim) @ (dim x Q)
    matmul and emits at most Q*k partial rows, so the driver folds
    O(blocks * Q * k) candidates — never the corpus. Exact twin:
    ``__ray_entry__`` ``knn_join``."""
    import ray

    rd = _rd()
    qt = _smallest_vectors(sf_dir, n_queries)
    qids = qt.column("vec_id").to_numpy().astype(np.int64)
    qm = _stack(qt.column("embedding"))
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    q_ref = ray.put((qids, (qm / qn[:, None]).T))  # (dim, Q)

    def batch_topk(t: pa.Table) -> pa.Table:
        qi, qmat = ray.get(q_ref)
        m = _stack(t.column("embedding"))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qmat) / norms[:, None]  # (B, Q)
        ids = t.column("vec_id").to_numpy().astype(np.int64)
        sims[ids[:, None] == qi[None, :]] = -np.inf  # self-match excluded
        B, Q = sims.shape
        take = min(k, B)
        idx = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, Q)
        cols = np.broadcast_to(np.arange(Q), (take, Q))
        return pa.table(
            {
                "query_vec_id": pa.array(np.repeat(qi, take), pa.int64()),
                "vec_id": pa.array(ids[idx].T.ravel(), pa.int64()),
                "sim": pa.array(sims[idx, cols].T.ravel(), pa.float64()),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = ds_to_table(ds.map_batches(batch_topk, batch_format="pyarrow"))
    t = t.filter(pc.greater(t.column("sim"), -np.inf))
    # fold the O(blocks*Q*k) partials: per-query rank, keep k
    t = t.take(
        pc.sort_indices(
            t,
            sort_keys=[("query_vec_id", "ascending"), ("sim", "descending"),
                       ("vec_id", "ascending")],
        )
    )
    g = t.column("query_vec_id").to_numpy()
    pos = np.arange(len(g)) - np.searchsorted(g, g, side="left")
    keep = pos < k
    t = t.filter(pa.array(keep))
    return pa.table(
        {
            "query_vec_id": t.column("query_vec_id"),
            "rnk": pa.array((pos[keep] + 1).astype(np.int64), pa.int64()),
            "vec_id": t.column("vec_id"),
        }
    )


_LSH_BITS = 16
_LSH_SEED = 0xA11CE
# Probe radius calibrated to this corpus: true top-10 cosine sims are weak
# (~0.27-0.37), so E[hamming] ~= 16*acos(s)/pi ~= 6.6 — radius 8 keeps
# ~85% recall while skipping the exact dot product for ~half the corpus.
# For a near-duplicate workload (s >= 0.9, E[h] ~= 1.4) radius 3-4 prunes
# ~97%; the radius is the recall/cost dial.
_LSH_MAX_HAMMING = 8


def _hyperplanes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(_LSH_SEED)
    return rng.standard_normal((dim, _LSH_BITS))


def _signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes) > 0
    return (bits.astype(np.uint32) << np.arange(_LSH_BITS, dtype=np.uint32)).sum(
        axis=1, dtype=np.uint32
    )


def knn_cosine_lsh(
    sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> pa.Table:
    """Approximate top-k cosine via random-hyperplane LSH prefilter.

    Each batch computes 16-bit sign signatures against broadcast
    hyperplanes and only vectors within Hamming distance
    ``_LSH_MAX_HAMMING`` of the query's signature get an exact cosine
    (then per-batch top-k as in :func:`knn_cosine`). A PHYSICAL
    signature-bucketed layout (read only buckets within the radius) does
    NOT pay off for this workload: weak top-k sims (~0.3) put the
    expected Hamming distance near 16 * acos(s)/pi ~ 6.6, so a radius-8
    probe covers most of the 2^16 buckets — the per-batch prefilter is
    the honest plan here, and :func:`knn_cosine_ivf`'s cell-partitioned
    index (`build_ivf_index`) is the physical-pruning exemplar for
    workloads where the probe set IS selective. Approximate vs the exact
    query (recall asserted in pytest) but fully DETERMINISTIC, so it
    carries an exact SQL oracle: the twin inlines the 16 hyperplanes and
    reproduces signature, Hamming prefilter, and rerank
    (``__ray_entry__._knn_lsh_sql``)."""
    import ray

    rd = _rd()
    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    planes = _hyperplanes(len(qn))
    qsig = _signatures(qn[None, :], planes)[0]
    ref = ray.put((qn, planes, qsig))

    def batch_topk(t: pa.Table) -> pa.Table:
        qv, pl, qs = ray.get(ref)
        m = _stack(t.column("embedding"))
        sig = _signatures(m, pl)
        x = sig ^ qs
        dist = np.zeros(len(x), dtype=np.int64)
        for shift in (0, 8):
            dist += np.unpackbits(
                ((x >> shift) & 0xFF).astype(np.uint8)[:, None], axis=1
            ).sum(axis=1).astype(np.int64)
        ids = t.column("vec_id").to_numpy()
        cand = (dist <= _LSH_MAX_HAMMING) & (ids != query_vec_id)
        m, ids = m[cand], ids[cand]
        if not len(ids):
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qv) / norms
        if len(ids) > k:
            part = np.argpartition(-sims, k)[:k]
            sims, ids = sims[part], ids[part]
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "sim": pa.array(sims)})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = ds_to_table(ds.map_batches(batch_topk, batch_format="pyarrow"))
    t = finalize(t, [("sim", "descending"), ("vec_id", "ascending")]).slice(0, k)
    rnk = pa.array(np.arange(1, t.num_rows + 1), pa.int64())
    return t.select(["vec_id"]).append_column("rnk", rnk).select(["rnk", "vec_id"])


_IVF_CELLS = 16
_IVF_PROBE = 6
_IVF_ITERS = 8
_IVF_TRAIN_SAMPLE = 4096  # centroid-training sample size (driver-bounded)
# Cross-engine determinism pins (the kmeans_embed technique, see the
# k-means section below): similarities ROUND to 6 decimals before every
# argmax (ties -> smallest cell id), centroids ROUND to 6 decimals after
# every update. Coarser than the k-means 9-decimal pin ON PURPOSE: wider
# rounding boundaries make a cross-engine boundary hit (~1e-14 summation
# drift vs the bucket width) vanishingly unlikely over the 8 unrolled
# iterations, and a coarse quantizer loses nothing at 6 decimals.
_IVF_SIM_ROUND = 6
_IVF_CENT_ROUND = 6
# bump when the trainer/assignment algorithm changes: invalidates
# physical index caches built by older code
_IVF_ALGO_VERSION = "ivf-v2-pinned"


def _ivf_centroids(m: np.ndarray, n_cells: int) -> np.ndarray:
    """Pinned Lloyd's spherical k-means on normalized vectors — the
    coarse quantizer. Fully deterministic AND SQL-reproducible: seeds =
    the first ``n_cells`` rows of the (vec_id-sorted) sample, rounded
    similarities before each argmax, rounded re-normalized means after
    each update, empty cells keep their previous centroid. The oracle
    twin unrolls these exact iterations as CTE rounds."""
    c = np.round(m[: min(n_cells, len(m))].copy(), _IVF_CENT_ROUND)
    for _ in range(_IVF_ITERS):
        sims = np.round(m @ c.T, _IVF_SIM_ROUND)
        assign = sims.argmax(axis=1)  # first max = smallest cell id
        for j in range(len(c)):
            members = m[assign == j]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    c[j] = np.round(v / n, _IVF_CENT_ROUND)
    return c


def _train_ivf_centroids(sf_dir: str, n_cells: int = _IVF_CELLS) -> np.ndarray:
    """Train the coarse quantizer on a bounded sample of the embeddings
    table — the ``_IVF_TRAIN_SAMPLE`` SMALLEST vec_ids
    (:func:`_smallest_vectors`, the order-free SQL-expressible rule)."""
    t = _smallest_vectors(sf_dir, _IVF_TRAIN_SAMPLE)
    m = _stack(t.column("embedding"))
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return _ivf_centroids(m / norms[:, None], n_cells)


def build_ivf_index(
    sf_dir: str, index_dir: str, n_cells: int = _IVF_CELLS
) -> np.ndarray:
    """Build a cell-partitioned IVF layout: one streamed pass assigns
    every vector to its nearest centroid and writes
    ``index_dir/cell=K/*.parquet``. Queries then READ ONLY the probed
    cells' files — the bucketing is physical partition pruning, not a
    per-batch filter. Returns the centroids (also persisted alongside).

    The same layout is the LSH scale path (signature prefix as the
    partition key); IVF is the built exemplar."""
    import ray

    rd = _rd()
    cents = _train_ivf_centroids(sf_dir, n_cells)
    c_ref = ray.put(cents)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        m = _stack(t.column("embedding"))
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        # rounded argmax (ties -> smallest cell): same pin as training,
        # so the SQL twin reproduces the cell of every vector
        sims = np.round((m / nrm[:, None]) @ c.T, _IVF_SIM_ROUND)
        cell = sims.argmax(axis=1).astype(np.int32)
        return t.append_column("cell", pa.array(cell))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell"]
    )
    np.save(os.path.join(index_dir, "centroids.npy"), cents)
    return cents


def _ivf_index_dir(sf_dir: str) -> str:
    """Deterministic per-corpus index location under /tmp (built once,
    reused across queries — the ANN build/query split). The tag mixes a
    CONTENT fingerprint (size + mtime of every embeddings file) with the
    path, so regenerating embeddings.parquet in place invalidates the
    cache instead of silently serving a stale index."""
    import glob
    import hashlib

    h = hashlib.sha1(os.path.abspath(sf_dir).encode())
    h.update(f"|{_IVF_ALGO_VERSION}".encode())
    pat = os.path.join(sf_dir, "embeddings.parquet")
    paths = sorted(glob.glob(pat)) or sorted(
        glob.glob(os.path.join(pat, "*.parquet"))
    )
    for p in paths:
        st = os.stat(p)
        h.update(f"|{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return os.path.join(tempfile.gettempdir(), f"irr-ivf-{h.hexdigest()[:12]}")


def knn_cosine_ivf(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pa.Table:
    """Approximate top-k cosine via an IVF coarse quantizer with a
    PHYSICAL cell-partitioned index: the first call builds
    ``cell=K/`` parquet partitions (:func:`build_ivf_index`, centroids
    trained on a bounded sample); each query reads ONLY its
    ``_IVF_PROBE`` closest cells' files and reranks exactly within them.
    Approximate vs the exact query (recall floor asserted in pytest) but
    the pinned trainer makes it DETERMINISTIC and SQL-twinnable — the
    oracle unrolls the quantizer iterations as CTE rounds
    (``__ray_entry__._knn_ivf_sql``)."""
    import ray

    rd = _rd()
    index_dir = _ivf_index_dir(sf_dir)
    cents_path = os.path.join(index_dir, "centroids.npy")
    if os.path.exists(cents_path):
        cents = np.load(cents_path)
    else:
        # build into a scratch dir, publish by atomic rename (concurrent
        # builders: first rename wins, losers discard)
        scratch = f"{index_dir}.building-{os.getpid()}"
        cents = build_ivf_index(sf_dir, scratch)
        try:
            os.rename(scratch, index_dir)
        except OSError:
            import shutil

            shutil.rmtree(scratch, ignore_errors=True)
            cents = np.load(cents_path)

    q = _query_vector(sf_dir, query_vec_id)
    qn = q / np.linalg.norm(q)
    # pinned probe order: rounded centroid sims desc, ties -> smaller
    # cell id (lexsort's last key is primary)
    cs = np.round(cents @ qn, _IVF_SIM_ROUND)
    probe_cells = np.lexsort((np.arange(len(cs)), -cs))[:_IVF_PROBE]
    import glob

    probe_dirs = [
        f
        for c in probe_cells
        for f in sorted(
            glob.glob(os.path.join(index_dir, f"cell={int(c)}", "*.parquet"))
        )
    ]
    if not probe_dirs:
        return pa.table({"rnk": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    q_ref = ray.put(qn)

    def batch_topk(t: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        m = _stack(t.column("embedding"))
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        ids = t.column("vec_id").to_numpy()
        keep = ids != query_vec_id
        m, ids = m[keep], ids[keep]
        if not len(ids):
            return pa.table(
                {"vec_id": pa.array([], pa.int64()), "sim": pa.array([], pa.float64())}
            )
        sims = (m @ qv) / nrm[keep]
        if len(ids) > k:
            part = np.argpartition(-sims, k)[:k]
            sims, ids = sims[part], ids[part]
        return pa.table({"vec_id": pa.array(ids, pa.int64()), "sim": pa.array(sims)})

    # pruned read: only the probed cells' files leave storage
    ds = rd.read_parquet(probe_dirs, columns=["vec_id", "embedding"])
    t = ds_to_table(ds.map_batches(batch_topk, batch_format="pyarrow"))
    t = finalize(t, [("sim", "descending"), ("vec_id", "ascending")]).slice(0, k)
    rnk = pa.array(np.arange(1, t.num_rows + 1), pa.int64())
    return t.select(["vec_id"]).append_column("rnk", rnk).select(["rnk", "vec_id"])


# Banded sign-LSH for the near-dup scale path. Band WIDTH must scale
# with corpus size: a random (s~0) pair collides in one band with
# probability 2^-bits, so expected spurious candidates are
# ~ n^2 * bands / 2^bits / 2; choosing bits ~= log2(n * bands) keeps
# that ~O(n) (each spurious candidate is killed by the exact verify,
# but generating them is the cost). Measured at n=300k: 16-bit bands ->
# ~22M spurious candidates / 351 s; 24-bit (the formula's value) ->
# ~170k / 15 s, recall 1.000 on planted near-dups. Recall at the
# target similarity s: 1 - (1 - (1 - acos(s)/pi)^bits)^bands — with 64
# bands and 24 bits that is ~0.99 at s = 0.95.
_ND_BANDS = 64
_ND_MIN_BITS = 16
_ND_MAX_BITS = 40  # int64 band-value packing headroom
_ND_SEED = 0xD0B


def _nd_band_bits(n_rows: int, bands: int = _ND_BANDS) -> int:
    """bits ~= log2(n * bands), clipped — the O(n)-spurious rule above."""
    import math

    return int(min(_ND_MAX_BITS, max(_ND_MIN_BITS,
                                     math.ceil(math.log2(max(n_rows, 2) * bands)))))


def _nd_planes(dim: int, bits: int) -> np.ndarray:
    rng = np.random.default_rng(_ND_SEED)
    return rng.standard_normal((dim, _ND_BANDS * bits))


# Band-bucket hot-key cap: a bucket with F members generates O(F^2)
# candidate pairs, and near-dup corpora are exactly the ones with huge
# identical clusters. Buckets above the cap are dropped WITH COUNTS
# (pair_counts surfaces them); genuine near-dup clusters far smaller
# than the cap are unaffected.
_ND_MAX_BAND_FREQ = 4096


def _vecs_to_list_col(m: np.ndarray) -> pa.Array:
    if m.ndim != 2 or m.shape[0] == 0 or m.shape[1] == 0:
        return pa.array([], pa.list_(pa.float64()))
    n, dim = m.shape
    return pa.ListArray.from_arrays(
        pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int64), pa.int32()),
        pa.array(m.ravel(), pa.float64()),
    )


def _join_vecs(ids: np.ndarray, vec_t: pa.Table) -> np.ndarray:
    """Look up normalized vectors for ``ids`` in a partition's vector
    slice (sorted-searchsorted join; every id is present by routing)."""
    vid = vec_t.column("vec_id").to_numpy()
    m = _stack(vec_t.column("embedding_n"))
    order = np.argsort(vid)
    return m[order][np.searchsorted(vid[order], ids)]


def _nd_attach_va(pid: int, pairs: pa.Table, vecs: pa.Table) -> pa.Table:
    """Stage-1 verify kernel: pairs co-partitioned with vectors on
    vec_id_a — attach the normalized a-vector to each pair."""
    if pairs.num_rows == 0 or vecs.num_rows == 0:
        return pa.table(
            {"vec_id_a": pa.array([], pa.int64()),
             "vec_id_b": pa.array([], pa.int64()),
             "va": pa.array([], pa.list_(pa.float64()))}
        )
    a = pairs.column("vec_id_a").to_numpy()
    va = _join_vecs(a, vecs)
    return pa.table(
        {
            "vec_id_a": pairs.column("vec_id_a"),
            "vec_id_b": pairs.column("vec_id_b"),
            "va": _vecs_to_list_col(va),
        }
    )


def _nd_verify(threshold: float, pid: int, pairs: pa.Table, vecs: pa.Table) -> pa.Table:
    """Stage-2 verify kernel: (pair, va) co-partitioned with vectors on
    vec_id_b — one einsum per partition, only >= threshold survivors
    leave."""
    empty = pa.table(
        {"vec_id_a": pa.array([], pa.int64()),
         "vec_id_b": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())}
    )
    if pairs.num_rows == 0 or vecs.num_rows == 0:
        return empty
    b = pairs.column("vec_id_b").to_numpy()
    vb = _join_vecs(b, vecs)
    va = _stack(pairs.column("va"))
    sims = np.einsum("ij,ij->i", va, vb)
    keep = sims >= threshold
    return pa.table(
        {
            "vec_id_a": pairs.column("vec_id_a").filter(pa.array(keep)),
            "vec_id_b": pairs.column("vec_id_b").filter(pa.array(keep)),
            "sim": pa.array(sims[keep]),
        }
    )


def _nd_band_keys(t: pa.Table, pl: np.ndarray, band_bits: int) -> pa.Table:
    """(band_key, vec_id) posting rows for one embeddings block — the
    banded sign-LSH signature kernel, shared by the exchange path and
    the physical index build (:func:`build_lsh_index`) so both routes
    sign identically by construction."""
    m = _stack(t.column("embedding"))
    nrm = np.linalg.norm(m, axis=1)
    nrm[nrm == 0] = 1.0
    mn = m / nrm[:, None]
    bits = (mn @ pl) > 0  # (n, bands*band_bits)
    weights = 1 << np.arange(band_bits, dtype=np.int64)
    keys, ids = [], []
    vid = t.column("vec_id").to_numpy()
    for b in range(_ND_BANDS):
        chunk = bits[:, b * band_bits : (b + 1) * band_bits]
        val = chunk.astype(np.int64) @ weights
        keys.append(b * (1 << band_bits) + val)
        ids.append(vid)
    return pa.table(
        {
            "band_key": pa.array(np.concatenate(keys), pa.int64()),
            "vec_id": pa.array(np.concatenate(ids), pa.int64()),
        }
    )


# Physical banded-LSH layout at rest: the signature table
# (band_key, vec_id) hash-partitioned into pid=K/ parquet dirs, built
# once per corpus (the build_ivf_index sibling). Every posting of a
# band key lives in exactly one pid, so candidate generation off the
# index is one bucket-local count task per partition — re-runs over a
# static corpus skip BOTH the signing matmul (the dominant flops) and
# the candidate exchange's split stage, for ANY threshold (signatures
# are threshold-independent, unlike the ndpairs result cache).
_ND_INDEX_VERSION = "ndlsh-v1"
_ND_INDEX_PARTS = 16


def _lsh_index_dir(sf_dir: str) -> str:
    """Deterministic per-corpus signature-index location under /tmp —
    content-fingerprinted like :func:`_ivf_index_dir`, with every
    signing parameter in the tag so a kernel-constant change can't
    serve a stale layout."""
    import glob
    import hashlib

    h = hashlib.sha1(os.path.abspath(sf_dir).encode())
    h.update(
        f"|{_ND_INDEX_VERSION}:{_ND_BANDS}:{_ND_SEED}:{_ND_INDEX_PARTS}".encode()
    )
    pat = os.path.join(sf_dir, "embeddings.parquet")
    paths = sorted(glob.glob(pat)) or sorted(
        glob.glob(os.path.join(pat, "*.parquet"))
    )
    for p in paths:
        st = os.stat(p)
        h.update(f"|{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return os.path.join(tempfile.gettempdir(), f"irr-ndlsh-{h.hexdigest()[:12]}")


def build_lsh_index(
    sf_dir: str, index_dir: str | None = None, P: int = _ND_INDEX_PARTS
) -> dict:
    """Build (or reuse) the physical banded-LSH signature layout: one
    streamed pass signs every vector and writes
    ``index_dir/pid=K/*.parquet`` partitioned by
    ``hash_key(band_key) % P`` — the SAME routing as the candidate
    exchange, so per-pid files are complete per band key. Publishes by
    atomic rename (concurrent builders: first wins). Returns the index
    meta (also persisted as ``meta.json``)."""
    import json
    import shutil

    import pyarrow.parquet as pq
    import ray

    from .exchange import hash_key

    rd = _rd()
    final = index_dir or _lsh_index_dir(sf_dir)
    meta_path = os.path.join(final, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    import glob

    pat = f"{sf_dir}/embeddings.parquet"
    paths = sorted(glob.glob(pat)) or sorted(
        glob.glob(os.path.join(pat, "*.parquet"))
    )
    # works for single-file AND directory corpora (both fingerprinted)
    n_rows = sum(pq.read_metadata(p).num_rows for p in paths)
    band_bits = _nd_band_bits(n_rows)
    first = next(pq.ParquetFile(paths[0]).iter_batches(
        batch_size=1, columns=["embedding"]))
    dim = len(first.column(0)[0])
    pl_ref = ray.put(_nd_planes(dim, band_bits))

    def sign(t: pa.Table) -> pa.Table:
        out = _nd_band_keys(t, ray.get(pl_ref), band_bits)
        pid = (hash_key(out.column("band_key")) % np.uint64(P)).astype(np.int32)
        return out.append_column("pid", pa.array(pid))

    scratch = f"{final}.building-{os.getpid()}"
    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ds.map_batches(sign, batch_format="pyarrow").write_parquet(
        scratch, partition_cols=["pid"]
    )
    meta = {
        "version": _ND_INDEX_VERSION,
        "n_rows": int(n_rows),
        "dim": int(dim),
        "bands": _ND_BANDS,
        "band_bits": int(band_bits),
        "P": int(P),
    }
    with open(os.path.join(scratch, "meta.json"), "w") as f:
        json.dump(meta, f)
    try:
        os.rename(scratch, final)
    except OSError:  # concurrent builder won the publish race
        shutil.rmtree(scratch, ignore_errors=True)
    return meta


def _lsh_index_pair_counts(
    index_dir: str, meta: dict, max_band_freq: int | None
) -> tuple[pa.Table, dict]:
    """Candidate pairs straight off the physical layout: each pid=K dir
    already holds EVERY posting of its band keys (build-time routing),
    so the exchange's split stage disappears — one bucket-local count
    task per partition, then the same tree fold as
    :func:`..dedup.pair_counts`. Output is bit-identical to the
    exchange route (both group by the hashed band key and sort
    internally)."""
    import glob

    import ray

    from .dedup import _PC_FAN, _merge_pair_partials, _pairs_in_partition
    from .exchange import hash_key

    @ray.remote
    def count_pid(paths: list, cap):
        import pyarrow.parquet as pq

        t = pa.concat_tables(
            [pq.read_table(p, columns=["band_key", "vec_id"]) for p in paths]
        )
        if t.num_rows == 0:
            e = np.array([], np.int64)
            return e, e, 0, 0
        ks = hash_key(t.column("band_key"))
        es = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return _pairs_in_partition(ks, es, max_key_freq=cap)

    @ray.remote
    def merge(*outs):
        return _merge_pair_partials(list(outs))

    outs = []
    for pid in range(meta["P"]):
        paths = sorted(
            glob.glob(os.path.join(index_dir, f"pid={pid}", "*.parquet"))
        )
        if paths:
            outs.append(count_pid.remote(paths, max_band_freq))
    if not outs:
        return (
            pa.table({"pair": pa.array([], pa.int64()),
                      "n_common": pa.array([], pa.int64())}),
            {"dropped_keys": 0, "dropped_postings": 0},
        )
    while len(outs) > 1:
        outs = [merge.remote(*outs[i : i + _PC_FAN]) for i in range(0, len(outs), _PC_FAN)]
    uniq, sums, dk, dp = ray.get(outs[0])
    if dk:
        import logging

        logging.getLogger("image_report_ray").warning(
            "lsh-index pair_counts: hot-key cap (max_key_freq=%s) dropped "
            "%d key(s) / %d posting(s)", max_band_freq, dk, dp,
        )
    t = pa.table({"pair": pa.array(uniq, pa.int64()), "n_common": pa.array(sums)})
    return t, {"dropped_keys": dk, "dropped_postings": dp}


def embedding_near_dup_lsh_refs(
    sf_dir: str,
    threshold: float = 0.95,
    max_band_freq: int = _ND_MAX_BAND_FREQ,
) -> list:
    """Near-dup pairs via banded random-hyperplane LSH, returned as the
    verify exchange's PARTITION REFS (vec_id_a, vec_id_b, sim) — the
    100 TB path behind :func:`embedding_near_dups`. Candidate pairs come
    from the shared :func:`pair_counts` exchange over band-bucket keys
    (hot buckets capped at ``max_band_freq`` with counted drops); the
    exact cosine verify is CO-PARTITIONED — two chained keyed exchanges
    attach the a-vector then the b-vector to each candidate pair and
    compute the dot product inside the partitions, so the driver holds
    only the candidate-pair list and the final survivors, never a
    vector gather. Approximate -> pytest recall gate, no SQL oracle."""
    import json
    from functools import partial as fpartial

    import pyarrow.parquet as pq
    import ray

    from .dedup import pair_counts
    from .exchange import exchange_reduce

    rd = _rd()
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    refs = ds.to_arrow_refs()

    idx_dir = _lsh_index_dir(sf_dir)
    meta_path = os.path.join(idx_dir, "meta.json")
    if os.path.exists(meta_path):
        # physical signature layout exists for this exact corpus content
        # + signing params: skip the signing matmul AND the candidate
        # exchange's split stage (bucket-local counts per pid=K dir)
        with open(meta_path) as f:
            index_meta = json.load(f)
        cands_t, _ = _lsh_index_pair_counts(idx_dir, index_meta, max_band_freq)
    else:
        pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
        band_bits = _nd_band_bits(pf.metadata.num_rows)
        first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
        dim = len(first.column(0)[0])
        # hyperplanes generated ONCE and broadcast — not rebuilt per batch
        pl_ref = ray.put(_nd_planes(dim, band_bits))

        def band_explode(t: pa.Table) -> pa.Table:
            return _nd_band_keys(t, ray.get(pl_ref), band_bits)

        bands = rd.from_arrow_refs(refs).map_batches(band_explode, batch_format="pyarrow")
        cands_t, _ = pair_counts(bands, "band_key", "vec_id", max_key_freq=max_band_freq)

    if cands_t.num_rows == 0:
        return []
    key = cands_t.column("pair").to_numpy()
    pairs_t = pa.table(
        {
            "vec_id_a": pa.array((key >> 32).astype(np.int64), pa.int64()),
            "vec_id_b": pa.array((key & 0xFFFFFFFF).astype(np.int64), pa.int64()),
        }
    )
    cand_ids = np.unique(
        np.concatenate(
            [pairs_t.column("vec_id_a").to_numpy(), pairs_t.column("vec_id_b").to_numpy()]
        )
    )
    ids_ref = ray.put(cand_ids)

    @ray.remote
    def norm_cand_vecs(block: pa.Table, need):
        """Per-block filter to candidate vectors, normalized once — the
        vector side of both verify exchanges (stays in the object store)."""
        keep = np.isin(block.column("vec_id").to_numpy(), need)
        sub = block.filter(pa.array(keep))
        m = _stack(sub.column("embedding"))
        nrm = np.linalg.norm(m, axis=1) if m.size else np.array([])
        if m.size:
            nrm[nrm == 0] = 1.0
            m = m / nrm[:, None]
        return pa.table(
            {"vec_id": sub.column("vec_id"), "embedding_n": _vecs_to_list_col(m)}
        )

    vec_refs = [norm_cand_vecs.remote(r, ids_ref) for r in refs]
    pair_refs = [ray.put(pairs_t)]
    stage1 = exchange_reduce(
        [pair_refs, vec_refs], ["vec_id_a", "vec_id"], _nd_attach_va
    )
    return exchange_reduce(
        [stage1, vec_refs], ["vec_id_b", "vec_id"],
        fpartial(_nd_verify, threshold),
    )


def _nd_empty() -> pa.Table:
    return pa.table(
        {
            "vec_id_a": pa.array([], pa.int64()),
            "vec_id_b": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float64()),
        }
    )


def embedding_near_dups_lsh(
    sf_dir: str,
    threshold: float = 0.95,
    max_band_freq: int = _ND_MAX_BAND_FREQ,
) -> pa.Table:
    """Gathered form of :func:`embedding_near_dup_lsh_refs` (the query
    result — the verify already filtered inside the partitions)."""
    from .exchange import gather_concat

    refs = embedding_near_dup_lsh_refs(sf_dir, threshold, max_band_freq)
    t = gather_concat(refs) if refs else _nd_empty()
    if t.num_rows == 0:
        return _nd_empty()
    t = round_col(t, "sim", 4)
    return finalize(t, [("vec_id_a", "ascending"), ("vec_id_b", "ascending")])


# Above this row count the O(n^2)-block exact plan stops being sane and
# the query routes to the banded-LSH scale path automatically.
_ND_MAX_BROADCAST_ROWS = 200_000


def embedding_near_dup_refs(
    sf_dir: str,
    threshold: float = 0.95,
    max_broadcast_rows: int = _ND_MAX_BROADCAST_ROWS,
) -> list:
    """Cached form of :func:`_embedding_near_dup_refs_build` — the
    verified (vec_id_a, vec_id_b, sim) pair shards persist under /tmp
    keyed by corpus content + threshold + route pins, so
    embedding_near_dups / embedding_dup_clusters / semdedup (same
    threshold) share ONE pair computation per corpus."""
    return _cached_refs(
        sf_dir,
        "ndpairs",
        f"t={threshold!r}:gate={max_broadcast_rows}"
        f":bands={_ND_BANDS}:freq={_ND_MAX_BAND_FREQ}",
        lambda: _embedding_near_dup_refs_build(
            sf_dir, threshold, max_broadcast_rows
        ),
    )


def _embedding_near_dup_refs_build(
    sf_dir: str,
    threshold: float = 0.95,
    max_broadcast_rows: int = _ND_MAX_BROADCAST_ROWS,
) -> list:
    """Near-dup pairs as partition refs, with the same exact-vs-LSH gate
    as :func:`embedding_near_dups`: below ``max_broadcast_rows`` the
    exact O(n^2)-block plan's output blocks are the refs; above it the
    LSH verify exchange's partition refs come back directly. Feeds
    :func:`..dedup.connected_components_refs` without a driver edge
    gather."""
    import pyarrow.parquet as pq
    import ray

    rd = _rd()
    n_rows = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    if n_rows > max_broadcast_rows:
        return embedding_near_dup_lsh_refs(sf_dir, threshold)
    all_t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_m = _stack(all_t.column("embedding"))
    all_norm = np.linalg.norm(all_m, axis=1)
    all_norm[all_norm == 0] = 1.0
    all_mn = all_m / all_norm[:, None]
    all_ids = all_t.column("vec_id").to_numpy()
    ref = ray.put((all_mn, all_ids))

    def block_pairs(t: pa.Table) -> pa.Table:
        mn_all, ids_all = ray.get(ref)
        m = _stack(t.column("embedding"))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        mn = m / norms[:, None]
        ids = t.column("vec_id").to_numpy()
        sims = mn @ mn_all.T
        ai, bj = np.nonzero(sims >= threshold)
        a, b, s = ids[ai], ids_all[bj], sims[ai, bj]
        keep = a < b
        return pa.table(
            {
                "vec_id_a": pa.array(a[keep], pa.int64()),
                "vec_id_b": pa.array(b[keep], pa.int64()),
                "sim": pa.array(s[keep]),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return ds.map_batches(block_pairs, batch_format="pyarrow").to_arrow_refs()


def embedding_near_dups(
    sf_dir: str,
    threshold: float = 0.95,
    max_broadcast_rows: int = _ND_MAX_BROADCAST_ROWS,
) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (vec_id_a < vec_id_b).

    Exact plan (the oracle anchor): the full normalized matrix is
    broadcast once; each batch computes its block-row of the similarity
    matrix and emits only pairs over the threshold — O(n^2) work,
    correct and fastest while the matrix fits a broadcast. Beyond
    ``max_broadcast_rows`` the query automatically switches to the
    banded-LSH buckets + exact co-partitioned verify, the same-output
    approximate scale path. Gathered form of
    :func:`embedding_near_dup_refs` (the pairs ARE the query result)."""
    from .exchange import gather_concat

    refs = embedding_near_dup_refs(sf_dir, threshold, max_broadcast_rows)
    t = gather_concat(refs) if refs else _nd_empty()
    if t.num_rows == 0 or "vec_id_a" not in t.column_names:
        return _nd_empty()
    t = round_col(t, "sim", 4)
    return finalize(t, [("vec_id_a", "ascending"), ("vec_id_b", "ascending")])


def _semdedup_attach_ca(pid: int, pairs: pa.Table, assign: pa.Table) -> pa.Table:
    """Exchange kernel 1 (above-gate route): pairs co-partitioned with
    assignments on vec_id_a — attach endpoint a's cluster id."""
    empty = pa.table(
        {"vec_id_a": pa.array([], pa.int64()),
         "vec_id_b": pa.array([], pa.int64()),
         "ca": pa.array([], pa.int64())}
    )
    if (
        pairs.num_rows == 0 or "vec_id_a" not in pairs.column_names
        or assign.num_rows == 0 or "vec_id" not in assign.column_names
    ):
        return empty
    ids = assign.column("vec_id").to_numpy().astype(np.int64)
    cl = assign.column("cluster_id").to_numpy().astype(np.int64)
    o = np.argsort(ids)
    ids, cl = ids[o], cl[o]
    a = pairs.column("vec_id_a").to_numpy().astype(np.int64)
    ca = cl[np.searchsorted(ids, a)]
    return pa.table(
        {"vec_id_a": pairs.column("vec_id_a").cast(pa.int64()),
         "vec_id_b": pairs.column("vec_id_b").cast(pa.int64()),
         "ca": pa.array(ca, pa.int64())}
    )


def _semdedup_filter_cb(pid: int, pairs: pa.Table, assign: pa.Table) -> pa.Table:
    """Exchange kernel 2: co-partitioned on vec_id_b — attach endpoint
    b's cluster id and keep only same-cluster pairs."""
    empty = pa.table(
        {"vec_id_a": pa.array([], pa.int64()),
         "vec_id_b": pa.array([], pa.int64())}
    )
    if (
        pairs.num_rows == 0 or "vec_id_b" not in pairs.column_names
        or assign.num_rows == 0 or "vec_id" not in assign.column_names
    ):
        return empty
    ids = assign.column("vec_id").to_numpy().astype(np.int64)
    cl = assign.column("cluster_id").to_numpy().astype(np.int64)
    o = np.argsort(ids)
    ids, cl = ids[o], cl[o]
    b = pairs.column("vec_id_b").to_numpy().astype(np.int64)
    cb = cl[np.searchsorted(ids, b)]
    keep = pairs.column("ca").to_numpy() == cb
    m = pa.array(keep)
    return pa.table(
        {"vec_id_a": pairs.column("vec_id_a").filter(m),
         "vec_id_b": pairs.column("vec_id_b").filter(m)}
    )


def _semdedup_keep(pid: int, assign: pa.Table, labels: pa.Table) -> pa.Table:
    """Exchange kernel 3: assignments co-partitioned with component
    labels on vec_id/node — keep = unlabeled (never in a same-cluster
    pair) or the component's minimum vec_id."""
    empty = pa.table(
        {"vec_id": pa.array([], pa.int64()),
         "cluster_id": pa.array([], pa.int64()),
         "keep": pa.array([], pa.bool_())}
    )
    if assign.num_rows == 0 or "vec_id" not in assign.column_names:
        return empty
    vid = assign.column("vec_id").to_numpy().astype(np.int64)
    cid = assign.column("cluster_id").to_numpy().astype(np.int64)
    label = vid.copy()
    if labels.num_rows and "node" in labels.column_names:
        ln = labels.column("node").to_numpy().astype(np.int64)
        lv = labels.column("label").to_numpy().astype(np.int64)
        lo = np.argsort(ln)
        ln, lv = ln[lo], lv[lo]
        pos = np.searchsorted(ln, vid)
        hit = (pos < len(ln)) & (ln[np.minimum(pos, len(ln) - 1)] == vid)
        label[hit] = lv[np.minimum(pos, len(lv) - 1)][hit]
    return pa.table(
        {"vec_id": pa.array(vid, pa.int64()),
         "cluster_id": pa.array(cid, pa.int64()),
         "keep": pa.array(label == vid)}
    )


def semdedup(
    sf_dir: str,
    tau: float = 0.4,
    max_broadcast_ids: int = 5_000_000,
) -> pa.Table:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public design):
    cluster the embedding space with the pinned k-means, then
    de-duplicate WITHIN clusters — near-dup pairs (cosine >= ``tau``)
    whose endpoints share a k-means cluster form components, and each
    component keeps only its minimum vec_id. Output: (vec_id,
    cluster_id, keep) — the semantic keep-list.

    Composition of already-verified machinery, every stage scale-shaped:
    :func:`kmeans_assign_refs` (broadcast-centroid assignment, fixed-
    cardinality folds), :func:`embedding_near_dup_refs` (exact below the
    row gate, banded-LSH verify exchange above it), a same-cluster pair
    filter, and :func:`..dedup.connected_components_refs` over the
    filtered pair refs — no driver edge array anywhere. Below
    ``max_broadcast_ids`` the (vec_id, cluster_id) map broadcasts once
    (fastest while it fits); above it NOTHING per-vector touches the
    driver — the assignment stays as partition refs and the
    same-cluster filter plus the final keep assignment run as three
    vec_id-keyed exchanges (the dedup_clusters shape), proven
    bit-equal to the broadcast route by the forced-gate pytest."""
    import pyarrow.parquet as pq
    import ray

    from ._util import finalize
    from .dedup import connected_components_refs
    from .exchange import exchange_reduce, gather_concat

    pair_refs = embedding_near_dup_refs(sf_dir, tau)
    n_vecs = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    if n_vecs > max_broadcast_ids:
        # 100-TB route: assignment refs co-partitioned with pair refs;
        # per-vector state never gathers on the driver
        assign_refs = kmeans_assign_refs(sf_dir)
        stage1 = (
            exchange_reduce(
                [pair_refs, assign_refs], ["vec_id_a", "vec_id"],
                _semdedup_attach_ca,
            )
            if pair_refs else []
        )
        filtered = (
            exchange_reduce(
                [stage1, assign_refs], ["vec_id_b", "vec_id"],
                _semdedup_filter_cb,
            )
            if stage1 else []
        )
        label_refs = (
            connected_components_refs(filtered, cols=("vec_id_a", "vec_id_b"))
            if filtered else []
        )
        out_refs = exchange_reduce(
            [assign_refs, label_refs], ["vec_id", "node"], _semdedup_keep
        )
        return finalize(gather_concat(out_refs), [("vec_id", "ascending")])

    assign_t = kmeans_embed(sf_dir)  # (vec_id, cluster_id), pinned
    vid = assign_t.column("vec_id").to_numpy().astype(np.int64)
    cid = assign_t.column("cluster_id").to_numpy().astype(np.int64)
    order = np.argsort(vid)
    amap_ref = ray.put((vid[order], cid[order]))

    @ray.remote
    def same_cluster(amap, t: pa.Table) -> pa.Table:
        if t is None or t.num_rows == 0 or "vec_id_a" not in t.column_names:
            return pa.table(
                {"vec_id_a": pa.array([], pa.int64()),
                 "vec_id_b": pa.array([], pa.int64())}
            )
        ids_s, cl_s = amap
        a = t.column("vec_id_a").to_numpy().astype(np.int64)
        b = t.column("vec_id_b").to_numpy().astype(np.int64)
        ca = cl_s[np.searchsorted(ids_s, a)]
        cb = cl_s[np.searchsorted(ids_s, b)]
        keep = ca == cb
        return pa.table(
            {"vec_id_a": pa.array(a[keep], pa.int64()),
             "vec_id_b": pa.array(b[keep], pa.int64())}
        )

    filt_refs = [same_cluster.remote(amap_ref, r) for r in pair_refs]
    labels_t = gather_concat(
        connected_components_refs(filt_refs, cols=("vec_id_a", "vec_id_b"))
    )
    label = vid.copy()
    if labels_t.num_rows and "node" in labels_t.column_names:
        ln = labels_t.column("node").to_numpy()
        lv = labels_t.column("label").to_numpy()
        lo = np.argsort(ln)
        ln, lv = ln[lo], lv[lo]
        pos = np.searchsorted(ln, vid)
        hit = (pos < len(ln)) & (ln[np.minimum(pos, len(ln) - 1)] == vid)
        label[hit] = lv[np.minimum(pos, len(lv) - 1)][hit]
    out = pa.table(
        {
            "vec_id": pa.array(vid, pa.int64()),
            "cluster_id": pa.array(cid, pa.int64()),
            "keep": pa.array(label == vid),
        }
    )
    return finalize(out, [("vec_id", "ascending")])


def embedding_dup_clusters(
    sf_dir: str, threshold: float = 0.4, max_broadcast_ids: int = 5_000_000
) -> pa.Table:
    """Near-dup CLUSTERS over embeddings: connected components of the
    exact cosine near-dup pair graph (:func:`embedding_near_dups` at the
    same threshold) via the generic distributed min-label propagation
    (:func:`..dedup.connected_components_refs`), every vector labeled
    with its component's minimum vec_id and a keep flag — the
    embedding-side keep-list (transitivity: A~B~C drops B AND C even
    when A!~C). REFS-NATIVE: the pair graph flows from
    :func:`embedding_near_dup_refs` straight into the propagate
    exchange — no edge array on the driver. The label table broadcasts
    while it fits ``max_broadcast_ids`` and rides an exact
    co-partitioned exchange on vec_id beyond it (the dedup_clusters
    gate)."""
    import ray

    from ._util import ds_to_table, finalize
    from .dedup import (
        _cc_remotes,
        _cluster_assign_partition,
        connected_components_refs,
    )
    from .exchange import exchange_reduce, gather_concat

    rd = _rd()
    pair_refs = embedding_near_dup_refs(sf_dir, threshold)
    label_refs = connected_components_refs(
        pair_refs, cols=("vec_id_a", "vec_id_b")
    )
    *_unused, row_count = _cc_remotes()
    n_labels = sum(ray.get([row_count.remote(r) for r in label_refs]))

    def rename_out(out: pa.Table) -> pa.Table:
        return out.rename_columns(["vec_id", "cluster_id", "keep"])

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    if n_labels > max_broadcast_ids:
        refs = exchange_reduce(
            [
                ds.map_batches(
                    lambda t: t.rename_columns(["doc_id"]),
                    batch_format="pyarrow",
                ),
                label_refs,
            ],
            ["doc_id", "node"],
            lambda pid, docs, lab: rename_out(
                _cluster_assign_partition(pid, docs, lab)
            ),
        )
        return finalize(gather_concat(refs), [("vec_id", "ascending")])

    lbl_ref = ray.put(gather_concat(label_refs))

    def assign(t: pa.Table) -> pa.Table:
        return rename_out(
            _cluster_assign_partition(0, t.rename_columns(["doc_id"]), ray.get(lbl_ref))
        )

    return finalize(ds_to_table(ds.map_batches(assign, batch_format="pyarrow")),
                    [("vec_id", "ascending")])


# ---- distributed k-means over embeddings ------------------------------
#
# Bounded-iteration Lloyd with everything pinned for cross-engine
# determinism: seeds = the K smallest vec_ids' vectors, squared-L2
# distances ROUNDED to 9 decimals before the argmin (ties -> smallest
# cluster id), and centroid means ROUNDED to 6 decimals after every
# update. The roundings erase the ~1e-13 summation-order drift between
# numpy and any other engine, which is what lets an iterative float
# algorithm carry a full SQL oracle (the twin unrolls the fixed
# iterations as CTE rounds with the same rounding rules).

_KM_K = 8
_KM_ITERS = 2
_KM_CENT_ROUND = 6
_KM_DIST_ROUND = 9


def _km_assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Rounded-distance argmin; ``np.argmin`` takes the FIRST minimum,
    which is the smallest cluster id — the pinned tie rule."""
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(np.round(d2, _KM_DIST_ROUND), axis=1)


def kmeans_assign_refs(
    sf_dir: str, k: int = _KM_K, iters: int = _KM_ITERS
) -> list:
    """Cached form of :func:`_kmeans_assign_refs_build` — the (vec_id,
    cluster_id) shards persist under /tmp keyed by corpus content +
    kernel pins, so kmeans_embed / semdedup / repeat runs share ONE
    Lloyd execution per corpus."""
    return _cached_refs(
        sf_dir,
        "kmeans",
        f"k={k}:iters={iters}:cr={_KM_CENT_ROUND}:dr={_KM_DIST_ROUND}",
        lambda: _kmeans_assign_refs_build(sf_dir, k, iters),
    )


def _kmeans_assign_refs_build(
    sf_dir: str, k: int = _KM_K, iters: int = _KM_ITERS
) -> list:
    """Per-block (vec_id, cluster_id) assignment REFS after ``iters``
    pinned Lloyd updates — the refs-native core behind
    :func:`kmeans_embed`, consumable by further exchanges (semdedup's
    same-cluster filter) without a driver gather.

    Scale shape: the table reads ONCE into block refs, then each round
    (seed election, every Lloyd iteration, the final assignment) is a
    wave of raw tasks over those refs — no re-read, no re-execution of
    the pipeline per round. Every block emits a fixed-cardinality
    partial (k rows of dim-wide sums + counts), so the driver folds
    O(k * dim * num_blocks) floats, never the vectors (the
    ``fold_partials`` fixed-cardinality rule; the fold order is the
    stable ref order, and the 6-decimal centroid rounding absorbs any
    last-ulp summation difference — the same pin the SQL twin relies
    on). Empty clusters keep their previous centroid. The final pass
    emits (vec_id, cluster_id) only — no float columns reach the result
    surface."""
    import ray

    rd = _rd()
    refs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_arrow_refs()
    cents = _kmeans_centroids_cached(sf_dir, refs, k, iters)

    @ray.remote
    def assign_block(c: np.ndarray, t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "cluster_id": pa.array([], pa.int64())}
            )
        m = _stack(t.column("embedding"))
        a = _km_assign(m, c)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster_id": pa.array(a.astype(np.int64), pa.int64()),
            }
        )

    final_ref = ray.put(cents)
    return [assign_block.remote(final_ref, r) for r in refs]


def _kmeans_centroids_cached(
    sf_dir: str, refs: list, k: int, iters: int
) -> np.ndarray:
    """Content-fingerprinted /tmp cache around :func:`_kmeans_centroids`
    (the npy sibling of `_cached_refs`): one Lloyd run per (corpus
    content, pins) serves kmeans assignment builds AND the outlier
    query across processes. Atomic-rename publish; np.save round-trips
    float64 bit-exactly. ``refs`` may be a zero-arg CALLABLE producing
    the block refs — callers whose only use of the corpus is training
    (cluster_separation) then skip the read entirely on a cache hit."""
    tag = _emb_tag(
        sf_dir,
        f"kmcent:k={k}:iters={iters}:cr={_KM_CENT_ROUND}:dr={_KM_DIST_ROUND}",
    )
    path = os.path.join(_SIM_CACHE_ROOT, f"kmcent-{tag}.npy")
    if os.path.exists(path):
        return np.load(path)
    if callable(refs):
        refs = refs()
    cents = _kmeans_centroids(refs, k, iters)
    os.makedirs(_SIM_CACHE_ROOT, exist_ok=True)
    fd, tmp = tempfile.mkstemp(suffix=".npy", dir=_SIM_CACHE_ROOT)
    os.close(fd)
    np.save(tmp, cents)
    os.replace(tmp, path)
    return cents


def _kmeans_centroids(refs: list, k: int, iters: int) -> np.ndarray:
    """Seed election + ``iters`` pinned Lloyd rounds over embedding
    block refs — the shared trainer behind :func:`kmeans_assign_refs`
    and :func:`embedding_outliers`; bit-identical to the loop the SQL
    twin unrolls (k smallest vec_ids seed, rounded-distance argmin with
    smallest-cid ties, ``_KM_CENT_ROUND``-rounded means, empty clusters
    keep their previous centroid)."""
    import ray

    @ray.remote
    def seed_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "embedding": pa.array([], pa.list_(pa.float32()))}
            )
        ids = t.column("vec_id").to_numpy()
        if len(ids) > k:
            sel = np.argsort(ids, kind="stable")[:k]
            return t.take(pa.array(sel))
        return t

    @ray.remote
    def sum_partial(c: np.ndarray, t: pa.Table):
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return np.zeros_like(c), np.zeros(c.shape[0], np.int64)
        m = _stack(t.column("embedding"))
        a = _km_assign(m, c)
        sums = np.zeros_like(c)
        np.add.at(sums, a, m)
        counts = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
        return sums, counts

    seed_tabs = [
        t for t in ray.get([seed_partial.remote(r) for r in refs])
        if t.num_rows
    ]
    if not seed_tabs:
        return np.zeros((0, 0))
    seeds_t = pa.concat_tables(seed_tabs, promote_options="default")
    order = np.argsort(seeds_t.column("vec_id").to_numpy(), kind="stable")[:k]
    seeds_t = seeds_t.take(pa.array(order))
    cents = _stack(seeds_t.column("embedding"))
    kk = cents.shape[0]  # corpus smaller than k: every vector seeds

    for _ in range(iters):
        cent_ref = ray.put(cents)
        parts = ray.get([sum_partial.remote(cent_ref, r) for r in refs])
        sums = np.zeros_like(cents)
        counts = np.zeros(kk, np.int64)
        for s, n in parts:
            sums += s
            counts += n
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        cents = np.round(new, _KM_CENT_ROUND)

    return cents


def kmeans_embed(
    sf_dir: str, k: int = _KM_K, iters: int = _KM_ITERS
) -> pa.Table:
    """Gathered form of :func:`kmeans_assign_refs` — the (vec_id,
    cluster_id) query result, sorted by vec_id."""
    import ray

    out = pa.concat_tables(
        [
            t
            for t in ray.get(kmeans_assign_refs(sf_dir, k, iters))
            if t.num_rows
        ],
        promote_options="default",
    )
    return finalize(out, [("vec_id", "ascending")])


# ---- product-quantization ANN (the third index family) -----------------

# PQ constants — every one of them appears verbatim in the SQL twin
# (__ray_entry__._knn_pq_sql), which unrolls the SAME pinned per-subspace
# Lloyd iterations; change them here and the twin regenerates.
_PQ_M = 8              # subspaces (dim must divide evenly)
_PQ_K = 16             # centroids per subspace codebook
_PQ_ITERS = 4          # Lloyd iterations per codebook
_PQ_TRAIN_SAMPLE = 1024
_PQ_D_ROUND = 6        # L2 assignment distances
_PQ_CENT_ROUND = 6     # centroid coordinates
_PQ_SCORE_ROUND = 6    # per-subspace dots and the final ADC score


def _pq_train_codebooks(sf_dir: str) -> tuple[list, int]:
    """Pinned per-subspace L2 Lloyd on the unit-normalized
    ``_PQ_TRAIN_SAMPLE`` smallest vec_ids (the shared order-free sample
    rule): init = first K sample subvectors by vec_id, assignment =
    argmin of ROUNDED squared distance (ties → smallest cid), update =
    rounded mean (empty keeps previous). Driver-bounded like the IVF
    trainer; the SQL twin replays it bit-for-bit."""
    t = _smallest_vectors(sf_dir, _PQ_TRAIN_SAMPLE)
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids)
    m = _stack(t.column("embedding")).astype(np.float64)[order]
    nrm = np.linalg.norm(m, axis=1)
    nrm[nrm == 0] = 1.0
    vh = m / nrm[:, None]
    dim = vh.shape[1]
    if dim % _PQ_M:
        raise ValueError(f"embedding dim {dim} not divisible by PQ M={_PQ_M}")
    S = dim // _PQ_M
    books = []
    for mi in range(_PQ_M):
        sub = vh[:, mi * S:(mi + 1) * S]
        c = np.round(sub[:_PQ_K].copy(), _PQ_CENT_ROUND)
        for _ in range(_PQ_ITERS):
            d = np.round(
                ((sub[:, None, :] - c[None, :, :]) ** 2).sum(-1), _PQ_D_ROUND
            )
            a = np.argmin(d, axis=1)     # first occurrence = smallest cid
            for j in range(_PQ_K):
                sel = a == j
                if sel.any():
                    c[j] = np.round(sub[sel].mean(axis=0), _PQ_CENT_ROUND)
        books.append(c)
    return books, S


_PQ_RERANK = 128       # ADC shortlist floor fed to the exact rerank
_PQ_RERANK_DIV = 256   # shortlist grows as max(floor, n_vectors // DIV)


def _pq_shortlist_depth(sf_dir: str) -> int:
    """R = max(128, n // 256): a FIXED depth goes recall-blind as the
    corpus grows (ADC ranks of true neighbors spread with n), a fixed
    FRACTION wastes rerank at small n — the same expression closes the
    twin's LIMIT via COUNT(*)."""
    import pyarrow.parquet as pqt

    n = pqt.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    return max(_PQ_RERANK, n // _PQ_RERANK_DIV)


def knn_cosine_pq(sf_dir: str, k: int = 10) -> pa.Table:
    """Approximate top-k cosine neighbors of vec_id 0 via PRODUCT
    QUANTIZATION with asymmetric distance + exact rerank (the ADC →
    shortlist → rerank composition of Jégou et al. 2011) — the third
    ANN family beside the LSH prefilter and the physical IVF index:
    the corpus is summarized as M per-subspace codes, a query scans an
    (M × K) lookup table, and only the ``_PQ_RERANK`` best quantized
    scores get their raw vectors touched.

    Distributed shape: codebooks train driver-side on the bounded
    shared sample (the IVF economics) and broadcast with the query's
    lookup table; pass 1 keeps a per-block partial shortlist of the
    rounded ADC scores (driver folds O(blocks × R) rows); pass 2
    broadcast-filters the same read-once blocks to the R shortlist ids
    and the exact cosine rerank closes on R × dim numbers. Recall
    floor vs the exact scan is pytest-gated; every rounding is pinned
    so the unrolled SQL twin matches bit-for-bit."""
    import ray

    rd = _rd()
    idx = _pq_index(sf_dir)
    if idx is not None:
        # physical PQ index at rest: stored codebooks + codes replace
        # both the training pass and the per-query encode — codes are
        # pinned-identical to the inline route by construction
        codes_dir, books, S = idx
    else:
        books, S = _pq_train_codebooks(sf_dir)
        codes_dir = None
    q = _query_vector(sf_dir, 0).astype(np.float64)
    qn = np.linalg.norm(q)
    qh = q / (qn if qn else 1.0)
    # ADC lookup table: lut[m][j] = rounded dot(q_m, codebook_m[j])
    lut = [
        np.round(books[mi] @ qh[mi * S:(mi + 1) * S], _PQ_SCORE_ROUND)
        for mi in range(_PQ_M)
    ]
    state_ref = ray.put((books, lut))
    R = _pq_shortlist_depth(sf_dir)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    base_refs = ds.to_arrow_refs()

    @ray.remote
    def block_shortlist(t: pa.Table) -> pa.Table:
        bks, lt = ray.get(state_ref)
        m = _stack(t.column("embedding")).astype(np.float64)
        nrm = np.linalg.norm(m, axis=1)
        nrm[nrm == 0] = 1.0
        vh = m / nrm[:, None]
        score = None
        for mi in range(_PQ_M):
            sub = vh[:, mi * S:(mi + 1) * S]
            d = np.round(
                ((sub[:, None, :] - bks[mi][None, :, :]) ** 2).sum(-1),
                _PQ_D_ROUND,
            )
            code = np.argmin(d, axis=1)
            part = lt[mi][code]
            score = part if score is None else score + part
        score = np.round(score, _PQ_SCORE_ROUND)
        ids = t.column("vec_id").to_numpy()
        keep = ids != 0
        score, ids = score[keep], ids[keep]
        if len(ids) > R:
            sel = np.lexsort((ids, -score))[:R]
            score, ids = score[sel], ids[sel]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "score": pa.array(score)}
        )

    @ray.remote
    def code_shortlist(t: pa.Table) -> pa.Table:
        _, lt = ray.get(state_ref)
        arr = t.column("codes")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        raw = np.frombuffer(arr.buffers()[1], np.uint8)
        codes = raw[arr.offset * _PQ_M:(arr.offset + len(arr)) * _PQ_M
                    ].reshape(-1, _PQ_M)
        score = np.zeros(len(arr), np.float64)
        for mi in range(_PQ_M):
            score += lt[mi][codes[:, mi]]
        score = np.round(score, _PQ_SCORE_ROUND)
        ids = t.column("vec_id").to_numpy()
        keep = ids != 0
        score, ids = score[keep], ids[keep]
        if len(ids) > R:
            sel = np.lexsort((ids, -score))[:R]
            score, ids = score[sel], ids[sel]
        return pa.table(
            {"vec_id": pa.array(ids, pa.int64()), "score": pa.array(score)}
        )

    if codes_dir is not None:
        short_refs = [code_shortlist.remote(r) for r in
                      rd.read_parquet(codes_dir).to_arrow_refs()]
    else:
        short_refs = [block_shortlist.remote(r) for r in base_refs]
    parts = [t for t in ray.get(short_refs) if t.num_rows]
    if not parts:
        return pa.table({"rnk": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    pool = pa.concat_tables(parts)
    ps = pool.column("score").to_numpy()
    pi = pool.column("vec_id").to_numpy()
    sel = np.lexsort((pi, -ps))[:R]
    short = np.sort(pi[sel])
    short_ref = ray.put(short)

    @ray.remote
    def fetch(t: pa.Table, ids: np.ndarray) -> pa.Table:
        return t.filter(
            pc.is_in(t.column("vec_id"), value_set=pa.array(ids, pa.int64()))
        )

    cand = pa.concat_tables(
        [t for t in ray.get([fetch.remote(r, short_ref) for r in base_refs])
         if t.num_rows]
    )
    m = _stack(cand.column("embedding")).astype(np.float64)
    nrm = np.linalg.norm(m, axis=1)
    nrm[nrm == 0] = 1.0
    sims = (m / nrm[:, None]) @ qh
    ids = cand.column("vec_id").to_numpy()
    order = np.lexsort((ids, -sims))[:k]
    return pa.table(
        {"rnk": pa.array(np.arange(1, len(order) + 1), pa.int64()),
         "vec_id": pa.array(ids[order], pa.int64())}
    )


# ---- per-cluster distance outliers --------------------------------------

_OUT_TOPN = 3


def embedding_outliers(sf_dir: str, topn: int = _OUT_TOPN) -> pa.Table:
    """Per-cluster distance outliers: for every pinned-kmeans cluster,
    the ``topn`` members FARTHEST from their centroid — the
    curation-time "inspect what the cluster barely holds" lens (and the
    SemDeDup paper's suggested keep-rule flipped to surface anomalies).
    Distance is the assignment kernel's own ``_KM_DIST_ROUND``-rounded
    squared L2 to the FINAL centroid, so ranking ties are pinned the
    same way assignment ties are; rank ties break by vec_id asc and no
    float reaches the result surface (cluster_id, vec_id, rank).

    Shape: one read into block refs, the shared Lloyd trainer
    (:func:`_kmeans_centroids` — driver folds k×dim partials per
    round), then ONE wave computing assignment + rounded distance with
    a per-cluster top-``topn`` cut block-locally (a provable superset
    of the global cut under the total (d2 desc, vec_id asc) order); the
    driver folds P·k·topn candidate rows, never the vectors."""
    import ray

    rd = _rd()
    refs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_arrow_refs()
    empty = pa.table({"cluster_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
    cents = _kmeans_centroids_cached(sf_dir, refs, _KM_K, _KM_ITERS)
    if cents.size == 0:
        return empty
    cref = ray.put(cents)

    def _cut(t: pa.Table) -> tuple[pa.Table, np.ndarray]:
        """Sort by (cluster, d2 desc, vec_id) and rank within cluster."""
        idx = pc.sort_indices(
            t, sort_keys=[("cluster_id", "ascending"), ("d2", "descending"),
                          ("vec_id", "ascending")]
        )
        s = t.take(idx)
        cid = s.column("cluster_id").to_numpy()
        starts = np.flatnonzero(np.r_[True, cid[1:] != cid[:-1]])
        rank = np.arange(len(cid)) - np.repeat(
            starts, np.diff(np.r_[starts, len(cid)])
        )
        return s, rank

    @ray.remote
    def block_outliers(c: np.ndarray, t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return pa.table({"cluster_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.float64())})
        m = _stack(t.column("embedding"))
        a = _km_assign(m, c)
        d2 = np.round(((m - c[a]) ** 2).sum(axis=1), _KM_DIST_ROUND)
        t2 = pa.table(
            {"cluster_id": pa.array(a.astype(np.int64), pa.int64()),
             "vec_id": t.column("vec_id").cast(pa.int64()),
             "d2": pa.array(d2, pa.float64())}
        )
        s, rank = _cut(t2)
        return s.filter(pa.array(rank < topn))

    parts = [p for p in ray.get([block_outliers.remote(cref, r)
                                 for r in refs]) if p.num_rows]
    if not parts:
        return empty
    s, rank = _cut(pa.concat_tables(parts).combine_chunks())
    keep = rank < topn
    out = pa.table(
        {"cluster_id": s.column("cluster_id").filter(pa.array(keep)),
         "vec_id": s.column("vec_id").filter(pa.array(keep)),
         "rank": pa.array(rank[keep] + 1, pa.int64())}
    )
    return finalize(out, [("cluster_id", "ascending"), ("rank", "ascending")])


# ---- inter-cluster separation profile -------------------------------------


def cluster_separation(sf_dir: str) -> pa.Table:
    """Pairwise squared-L2 distances between the pinned-kmeans FINAL
    centroids — the cluster-geometry health check (two near-coincident
    centroids mean k is too high or the corpus collapsed; one far
    outlier centroid usually holds junk). K is a pinned constant, so
    the K·(K−1)/2-row result is driver-computable from the shared
    cached Lloyd trainer (`_kmeans_centroids_cached` — one training run
    serves kmeans_embed / embedding_outliers / semdedup / this);
    distances carry the assignment kernel's own ``_KM_DIST_ROUND``
    rounding so the SQL twin (the kmeans CTE chain's c2 centroids,
    self-joined) reproduces every value bit-for-bit."""
    rd = _rd()

    def refs_thunk():  # corpus read only on a centroid-cache MISS
        return rd.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).to_arrow_refs()

    empty = pa.table({"cid_a": pa.array([], pa.int64()),
                      "cid_b": pa.array([], pa.int64()),
                      "d2": pa.array([], pa.float64())})
    cents = _kmeans_centroids_cached(sf_dir, refs_thunk, _KM_K, _KM_ITERS)
    if cents.size == 0:
        return empty
    k = cents.shape[0]
    ia, ib, dd = [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            ia.append(i)
            ib.append(j)
            dd.append(float(np.round(((cents[i] - cents[j]) ** 2).sum(),
                                     _KM_DIST_ROUND)))
    return pa.table({"cid_a": pa.array(ia, pa.int64()),
                     "cid_b": pa.array(ib, pa.int64()),
                     "d2": pa.array(dd, pa.float64())})


def filtered_knn(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pa.Table:
    """Metadata-filtered exact retrieval — the hybrid-search shape
    (vector similarity AND a structured predicate): top-``k`` cosine
    neighbors of the query vector restricted to candidates sharing the
    query's ``label``, excluding the query itself.

    The predicate is pushed into the scan (only the label's rows are
    scored), the query row itself is fetched with a parquet row-group
    filter (never a full driver read), and each surviving batch does
    one matmul + per-batch top-k — the driver folds O(blocks x k)
    candidate rows. Output is rank + vec_id (float sims never surface,
    the knn_cosine convention)."""
    import pyarrow.parquet as pq
    import ray

    rd = _rd()
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding", "label"],
                       filters=[("vec_id", "==", query_vec_id)])
    if qt.num_rows == 0:
        raise ValueError(f"vec_id {query_vec_id} not found")
    q = _stack(qt.column("embedding"))[0]
    qlabel = qt.column("label")[0].as_py()
    qn = q / np.linalg.norm(q)
    q_ref = ray.put(qn)

    def batch_topk(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.equal(t.column("label"), qlabel),
            pc.not_equal(t.column("vec_id"), query_vec_id),
        )
        t = t.filter(keep)
        if t.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        qv = ray.get(q_ref)
        m = _stack(t.column("embedding"))
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        sims = (m @ qv) / norms
        ids = t.column("vec_id").to_numpy()
        if len(ids) > k:
            part = np.argpartition(-sims, k)[:k]
            sims, ids = sims[part], ids[part]
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "sim": pa.array(sims, pa.float64())})

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    t = ds_to_table(ds.map_batches(batch_topk, batch_format="pyarrow"))
    t = finalize(t, [("sim", "descending"), ("vec_id", "ascending")]).slice(0, k)
    rnk = pa.array(np.arange(1, t.num_rows + 1), pa.int64())
    return t.select(["vec_id"]).append_column("rnk", rnk).select(["rnk", "vec_id"])


def cluster_balance(sf_dir: str, k: int = _KM_K, iters: int = _KM_ITERS) -> pa.Table:
    """Cluster-size balance of the pinned k-means partitioning — the
    capacity-planning view of the ANN/semdedup cluster map (a skewed
    balance means hot IVF cells and lopsided semdedup work), and the
    fifth consumer of the shared cached Lloyd trainer.

    Assignment refs stay distributed: each partition folds its own
    cluster counts (K fixed small), the driver sums P×K ints and closes
    exact basis-point shares."""
    import ray

    refs = kmeans_assign_refs(sf_dir, k, iters)

    @ray.remote
    def count_task(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "cluster_id" not in t.column_names:
            return pa.table({"cluster_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        g = t.group_by(["cluster_id"]).aggregate([([], "count_all")])
        return pa.table({"cluster_id": g.column("cluster_id").cast(pa.int64()),
                         "n": g.column("count_all").cast(pa.int64())})

    tabs = [t for t in ray.get([count_task.remote(r) for r in refs])
            if t.num_rows]
    if not tabs:
        return pa.table({"cluster_id": pa.array([], pa.int64()),
                         "n_vectors": pa.array([], pa.int64()),
                         "share_bp": pa.array([], pa.int64())})
    g = (pa.concat_tables(tabs).group_by(["cluster_id"])
         .aggregate([("n", "sum")]).rename_columns(["cluster_id", "n"]))
    n = g.column("n").to_numpy()
    total = int(n.sum())
    out = pa.table({"cluster_id": g.column("cluster_id"),
                    "n_vectors": pa.array(n.astype(np.int64)),
                    "share_bp": pa.array(
                        10_000 * n // max(total, 1), pa.int64())})
    return finalize(out, [("cluster_id", "ascending")])


# ---- physical PQ-codes index at rest (the fourth index family) ---------

_PQ_INDEX_ALGO_VERSION = 1  # bump when codes layout / encoding changes


def _pq_index_dir(sf_dir: str) -> str:
    """Content-fingerprinted per-corpus PQ index location under /tmp —
    the `_ivf_index_dir` rule (path + algo version + size/mtime of every
    embeddings file), so regenerated embeddings invalidate the index."""
    import glob
    import hashlib

    h = hashlib.sha1(os.path.abspath(sf_dir).encode())
    h.update(f"|pq{_PQ_INDEX_ALGO_VERSION}|{_PQ_M}|{_PQ_K}".encode())
    pat = os.path.join(sf_dir, "embeddings.parquet")
    paths = sorted(glob.glob(pat)) or sorted(
        glob.glob(os.path.join(pat, "*.parquet")))
    for p in paths:
        st = os.stat(p)
        h.update(f"|{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}".encode())
    return os.path.join(tempfile.gettempdir(), f"irr-pq-{h.hexdigest()[:12]}")


def _pq_encode_batch(t: pa.Table, books: list, S: int) -> pa.Table:
    """(vec_id, M-byte code) rows for one batch — the SAME pinned
    rounded-argmin assignment as the inline ADC pass, so index and
    fresh routes are code-identical by construction."""
    m = _stack(t.column("embedding")).astype(np.float64)
    nrm = np.linalg.norm(m, axis=1)
    nrm[nrm == 0] = 1.0
    vh = m / nrm[:, None]
    codes = np.empty((len(vh), _PQ_M), np.uint8)
    for mi in range(_PQ_M):
        sub = vh[:, mi * S:(mi + 1) * S]
        d = np.round(
            ((sub[:, None, :] - books[mi][None, :, :]) ** 2).sum(-1),
            _PQ_D_ROUND,
        )
        codes[:, mi] = np.argmin(d, axis=1)
    buf = pa.py_buffer(np.ascontiguousarray(codes).tobytes())
    arr = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(_PQ_M), len(vh), [None, buf])
    return pa.table({"vec_id": t.column("vec_id"), "codes": arr})


def build_pq_index(sf_dir: str, index_dir: str) -> dict:
    """Persist the PQ summary of the corpus at rest: the pinned
    per-subspace codebooks (`codebooks.npy`) plus one streamed encode
    pass writing ``codes/*.parquet`` (vec_id, M bytes per vector —
    a 32× I/O reduction vs raw float32 vectors at dim 64). Repeat ADC
    queries over a static corpus then skip the encode entirely: the
    shortlist pass reads M bytes/vector and scans a lookup table."""
    import ray

    rd = _rd()
    books, S = _pq_train_codebooks(sf_dir)
    b_ref = ray.put(books)

    def encode(t: pa.Table) -> pa.Table:
        return _pq_encode_batch(t, ray.get(b_ref), S)

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ds.map_batches(encode, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "codes"))
    np.save(os.path.join(index_dir, "codebooks.npy"), np.stack(books))
    import pyarrow.parquet as pqt
    import glob

    n_rows = sum(pqt.read_metadata(f).num_rows for f in glob.glob(
        os.path.join(index_dir, "codes", "*.parquet")))
    return {"m": _PQ_M, "k": _PQ_K, "subdim": S, "n_vectors": n_rows}


def _pq_index(sf_dir: str):
    """(codes_dir, codebooks, S) when a published PQ index exists for
    this exact corpus content, else None."""
    d = _pq_index_dir(sf_dir)
    books_path = os.path.join(d, "codebooks.npy")
    if not os.path.exists(books_path):
        return None
    stacked = np.load(books_path)
    books = [stacked[i] for i in range(stacked.shape[0])]
    return os.path.join(d, "codes"), books, stacked.shape[2]


# ---- k-center coreset selection (farthest-first traversal) ---------------

_KC_K = 8


def kcenter_sample(sf_dir: str, k: int = _KC_K) -> pa.Table:
    """Farthest-first traversal (Gonzalez' 2-approximate k-center) over
    the embedding corpus — the diversity-maximizing coreset selector a
    training-data pipeline uses to seed active learning, pick
    representative exemplars, or cap redundant regions: each step adds
    the vector FARTHEST (max-min squared L2) from everything selected
    so far.

    Scale shape: the corpus reads ONCE into block refs; each of the
    ``k`` steps is one task wave that scores every block against the
    broadcast selected set (≤ k×dim floats) and emits a single local
    champion — the driver folds P candidate rows per wave, never the
    vectors. Distances round at ``_KM_DIST_ROUND`` decimals BEFORE the
    min/argmax (the kmeans pin, so numpy/DuckDB summation drift never
    survives a boundary); ties break to the smallest vec_id; already-
    selected ids are excluded so duplicate-saturated corpora still
    select k distinct vectors. Twin: ``__ray_entry__._kcenter_sql``
    (incremental LEAST-chain, one CTE round per step)."""
    import ray

    rd = _rd()
    empty = pa.table({"step": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "d2": pa.array([], pa.float64())})
    refs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_arrow_refs()

    @ray.remote
    def champion(cents: np.ndarray, chosen_ids: list, t: pa.Table):
        """Local (dmin, vec_id, vector) champion of one block: max
        rounded min-distance to the selected set, ties to smallest id;
        ``cents`` is None for the seed wave (global min vec_id)."""
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            return None
        ids = t.column("vec_id").to_numpy()
        keep = ~np.isin(ids, np.asarray(chosen_ids, dtype=ids.dtype))
        if not keep.any():
            return None
        m = _stack(t.column("embedding"))[keep]
        ids = ids[keep]
        if cents is None:  # seed: smallest vec_id
            i = int(np.argmin(ids))
            return (0.0, int(ids[i]), m[i])
        d2 = np.round(
            ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2),
            _KM_DIST_ROUND,
        )
        dmin = d2.min(axis=1)
        best = np.lexsort((ids, -dmin))[0]
        return (float(dmin[best]), int(ids[best]), m[best])

    steps: list[tuple[int, int, float]] = []
    cents: np.ndarray | None = None
    chosen: list[int] = []
    for s in range(1, k + 1):
        cref = ray.put(cents)
        cands = [c for c in ray.get(
            [champion.remote(cref, chosen, r) for r in refs]) if c]
        if not cands:
            break
        if cents is None:
            d, vid, vec = min(cands, key=lambda c: c[1])
        else:
            d, vid, vec = max(cands, key=lambda c: (c[0], -c[1]))
        steps.append((s, vid, d))
        chosen.append(vid)
        cents = (vec[None, :] if cents is None
                 else np.vstack([cents, vec[None, :]]))
    if not steps:
        return empty
    return pa.table({
        "step": pa.array([s for s, _, _ in steps], pa.int64()),
        "vec_id": pa.array([v for _, v, _ in steps], pa.int64()),
        "d2": pa.array([d for _, _, d in steps], pa.float64()),
    })


# ---- MMR diversified retrieval -------------------------------------------

_MMR_K = 8
_MMR_POOL = 32


def mmr_diversified_search(
    sf_dir: str, query_vec_id: int = 0, k: int = _MMR_K, pool: int = _MMR_POOL
) -> pa.Table:
    """Maximal-marginal-relevance top-``k``: the rerank-window retrieval a
    RAG / training-data pipeline uses when plain top-k returns near-
    duplicate passages — greedily pick the candidate maximizing
    ``lambda*rel - (1-lambda)*max_sim_to_selected`` with ``lambda=0.5``
    (argmax of ``rel - max_sim``, no float scale factor needed).

    Scale shape: stage 1 is the knn_cosine stream — every block emits its
    local top-``pool`` candidates BY ROUNDED RELEVANCE (cosine to the
    broadcast query, ties to smallest vec_id) carrying their vectors, a
    tree fold cuts to the global pool, so the driver holds pool x dim
    floats; stage 2's greedy runs on that O(pool**2) simility matrix
    driver-side. Cosines compute as dot/(sqrt(da)*sqrt(db)) and round at
    ``_KM_DIST_ROUND`` decimals BEFORE any compare (the kmeans pin);
    zero-norm vectors are excluded on BOTH sides. Twin:
    ``__ray_entry__._mmr_sql`` (pool CTE + pairwise sims + the kcenter
    twin's incremental GREATEST chain)."""
    import ray

    rd = _rd()
    q = _query_vector(sf_dir, query_vec_id).astype(np.float64)
    nq = float(np.sqrt(np.dot(q, q)))
    q_ref = ray.put(q)
    empty = pa.table({"step": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64())})
    if nq == 0.0:
        return empty

    def cut(ids: np.ndarray, rel: np.ndarray, m: np.ndarray):
        """Top-``pool`` by (rel desc, vec_id asc) — the fold rule."""
        order = np.lexsort((ids, -rel))[:pool]
        return ids[order], rel[order], m[order]

    @ray.remote
    def block_pool(t: pa.Table):
        if t.num_rows == 0 or "vec_id" not in t.column_names:
            return None
        qv = ray.get(q_ref)
        ids = t.column("vec_id").to_numpy()
        m = _stack(t.column("embedding"))
        da = (m * m).sum(axis=1)
        keep = (ids != query_vec_id) & (da > 0)
        if not keep.any():
            return None
        ids, m, da = ids[keep], m[keep], da[keep]
        rel = np.round((m @ qv) / (np.sqrt(da) * nq), _KM_DIST_ROUND)
        return cut(ids, rel, m)

    @ray.remote
    def fold(*parts):
        live = [p for p in parts if p is not None]
        if not live:
            return None
        ids = np.concatenate([p[0] for p in live])
        rel = np.concatenate([p[1] for p in live])
        m = np.vstack([p[2] for p in live])
        return cut(ids, rel, m)

    refs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_arrow_refs()
    outs = [block_pool.remote(r) for r in refs]
    while len(outs) > 1:
        outs = [fold.remote(*outs[i : i + 8]) for i in range(0, len(outs), 8)]
    top = ray.get(outs[0])
    if top is None:
        return empty
    ids, rel, m = top

    # pairwise rounded cosines inside the pool (pool**2 doubles, driver)
    dots = m @ m.T
    nr = np.sqrt((m * m).sum(axis=1))
    sims = np.round(dots / np.outer(nr, nr), _KM_DIST_ROUND)

    first = int(np.lexsort((ids, -rel))[0])
    sel = [first]
    smax = sims[:, first].copy()
    steps = [(1, int(ids[first]))]
    for s in range(2, min(k, len(ids)) + 1):
        score = rel - smax
        score[sel] = -np.inf
        best = int(np.lexsort((ids, -score))[0])
        steps.append((s, int(ids[best])))
        sel.append(best)
        smax = np.maximum(smax, sims[:, best])
    return pa.table({
        "step": pa.array([a for a, _ in steps], pa.int64()),
        "vec_id": pa.array([b for _, b in steps], pa.int64()),
    })


def label_purity(sf_dir: str, k: int = _KM_K, iters: int = _KM_ITERS) -> pa.Table:
    """Cluster <-> ground-truth-label agreement census — the standard
    clustering-quality eval (does the pinned k-means partitioning track
    the ``label`` column?): per cluster, its size, majority label (ties
    to the smallest label) and exact basis-point purity. Sixth consumer
    of the shared cached Lloyd trainer.

    Scale shape: assignment shards and the (vec_id, label) read
    co-partition on vec_id through ``exchange_reduce``; each partition
    joins locally and folds a fixed-cardinality (cluster, label)
    contingency, so the driver sums P x K x L small ints — vectors and
    full assignments never leave the cluster. Twin: the kmeans CTE
    chain joined back to ``embeddings`` for labels."""
    import ray  # noqa: F401  (exchange_reduce drives the tasks)

    from .exchange import exchange_reduce, gather_concat

    rd = _rd()
    refs = kmeans_assign_refs(sf_dir, k, iters)
    lab_refs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_arrow_refs()

    def contingency(pid: int, asn: pa.Table, lab: pa.Table) -> pa.Table | None:
        if asn.num_rows == 0 or lab.num_rows == 0:
            return None
        j = asn.select(["vec_id", "cluster_id"]).join(
            lab.select(["vec_id", "label"]), keys="vec_id", join_type="inner"
        )
        g = j.group_by(["cluster_id", "label"]).aggregate([([], "count_all")])
        return pa.table({
            "cluster_id": g.column("cluster_id").cast(pa.int64()),
            "label": g.column("label").cast(pa.int64()),
            "n": g.column("count_all").cast(pa.int64()),
        })

    ct = gather_concat(
        exchange_reduce([refs, lab_refs], ["vec_id", "vec_id"], contingency, P=8)
    )
    empty = pa.table({"cluster_id": pa.array([], pa.int64()),
                      "n_vectors": pa.array([], pa.int64()),
                      "top_label": pa.array([], pa.int64()),
                      "purity_bp": pa.array([], pa.int64())})
    if ct.num_rows == 0 or "cluster_id" not in ct.column_names:
        return empty
    g = (ct.group_by(["cluster_id", "label"]).aggregate([("n", "sum")])
         .rename_columns(["cluster_id", "label", "n"]))
    cid = g.column("cluster_id").to_numpy()
    lab = g.column("label").to_numpy()
    n = g.column("n").to_numpy()
    rows = []
    for c in np.unique(cid):
        m = cid == c
        tot = int(n[m].sum())
        best = np.lexsort((lab[m], -n[m]))[0]
        rows.append((int(c), tot, int(lab[m][best]),
                     10_000 * int(n[m][best]) // max(tot, 1)))
    return pa.table({
        "cluster_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_vectors": pa.array([r[1] for r in rows], pa.int64()),
        "top_label": pa.array([r[2] for r in rows], pa.int64()),
        "purity_bp": pa.array([r[3] for r in rows], pa.int64()),
    })


_LM_PROBES = 64


def knn_label_match(sf_dir: str, n_probes: int = _LM_PROBES) -> pa.Table:
    """Leave-one-out 1-NN label agreement — the standard intrinsic eval
    of embedding quality (does cosine neighborhood structure respect the
    ``label`` column?): for each of the ``n_probes`` smallest-vec_id
    probe vectors, find its exact nearest OTHER vector in one streamed
    corpus pass (the knn_join shape, k=1) and score whether the
    neighbor's label matches; report per-label probe counts, matches and
    exact basis-point accuracy.

    Scale shape: probes broadcast once (dim x Q matrix), each block does
    one matmul and emits <= Q candidate rows; the label lookup for the
    <= 2Q interesting ids is a broadcast-membership fold — the corpus
    label column never gathers. Twin: QUALIFY top-1 per probe + label
    join."""
    import ray

    rd = _rd()
    nn = knn_join(sf_dir, n_queries=n_probes, k=1)
    empty = pa.table({"label": pa.array([], pa.int64()),
                      "n_probes": pa.array([], pa.int64()),
                      "n_matches": pa.array([], pa.int64()),
                      "acc_bp": pa.array([], pa.int64())})
    if nn.num_rows == 0:
        return empty
    qids = nn.column("query_vec_id").to_numpy().astype(np.int64)
    nids = nn.column("vec_id").to_numpy().astype(np.int64)
    want = np.unique(np.concatenate([qids, nids]))
    want_ref = ray.put(want)

    @ray.remote
    def pick(t: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        ids = t.column("vec_id").to_numpy()
        m = np.isin(ids, w)
        return pa.table({
            "vec_id": pa.array(ids[m].astype(np.int64), pa.int64()),
            "label": t.column("label").filter(pa.array(m)).cast(pa.int64()),
        })

    refs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    ).to_arrow_refs()
    lt = pa.concat_tables(
        [t for t in ray.get([pick.remote(r) for r in refs]) if t.num_rows],
        promote_options="default",
    )
    lab = dict(zip(lt.column("vec_id").to_numpy(),
                   lt.column("label").to_numpy()))
    ql = np.array([lab[q] for q in qids], np.int64)
    match = np.array([lab[q] == lab[n] for q, n in zip(qids, nids)])
    rows = []
    for lv in np.unique(ql):
        m = ql == lv
        np_, nm = int(m.sum()), int(match[m].sum())
        rows.append((int(lv), np_, nm, 10_000 * nm // np_))
    return pa.table({
        "label": pa.array([r[0] for r in rows], pa.int64()),
        "n_probes": pa.array([r[1] for r in rows], pa.int64()),
        "n_matches": pa.array([r[2] for r in rows], pa.int64()),
        "acc_bp": pa.array([r[3] for r in rows], pa.int64()),
    })


# ---- distributed PCA (top principal component, power iteration) ----------

_PCA_ITERS = 64
_PCA_COV_ROUND = 6  # covariance entries pin here before any iteration
_PCA_VEC_ROUND = 9  # iterate pins per round (the kmeans-style boundary)
_PCA_OUT_ROUND = 6


def embedding_pca(sf_dir: str, iters: int = _PCA_ITERS) -> pa.Table:
    """Top principal component of the embedding corpus by ``iters``
    pinned power-iteration rounds over the covariance matrix — the
    drift/collapse monitor a training-data pipeline runs on its
    embedding space (a dominant component explaining most variance
    means collapsed representations).

    Scale shape: ONE streamed pass folds per-block moment partials
    (sum x, x^T x, n — each a fixed dim^2 float block, tree-reduced),
    the dim x dim covariance closes on the driver and the iteration is
    O(iters * dim^2) driver math. Determinism pins: covariance rounds at
    ``_PCA_COV_ROUND`` BEFORE the first iteration, each normalized
    iterate rounds at ``_PCA_VEC_ROUND`` (so cross-engine summation
    drift never compounds), v0 = e1, and the sign fixes so the
    largest-|loading| component is positive (ties -> smallest index).
    Twin: ``__ray_entry__._pca_sql`` (unnest covariance + one CTE round
    per iteration)."""
    import ray

    rd = _rd()
    empty = pa.table({"i": pa.array([], pa.int64()),
                      "loading": pa.array([], pa.float64())})

    @ray.remote
    def moments(t: pa.Table):
        if t.num_rows == 0 or "embedding" not in t.column_names:
            return None
        m = _stack(t.column("embedding"))
        return (m.sum(axis=0), m.T @ m, m.shape[0])

    @ray.remote
    def fold(*parts):
        live = [p for p in parts if p is not None]
        if not live:
            return None
        return (sum(p[0] for p in live), sum(p[1] for p in live),
                sum(p[2] for p in live))

    refs = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).to_arrow_refs()
    outs = [moments.remote(r) for r in refs]
    while len(outs) > 1:
        outs = [fold.remote(*outs[i : i + 8]) for i in range(0, len(outs), 8)]
    got = ray.get(outs[0])
    if got is None or got[2] == 0:
        return empty
    s1, s2, n = got
    mean = s1 / n
    cov = np.round(s2 / n - np.outer(mean, mean), _PCA_COV_ROUND)
    dim = cov.shape[0]
    v = np.zeros(dim)
    v[0] = 1.0
    for _ in range(iters):
        w = cov @ v
        nz = float(np.sqrt((w * w).sum()))
        if nz == 0.0:
            break
        v = np.round(w / nz, _PCA_VEC_ROUND)
    top = int(np.lexsort((np.arange(dim), -np.abs(v)))[0])
    s = -1.0 if v[top] < 0 else 1.0
    return pa.table({
        "i": pa.array(np.arange(1, dim + 1), pa.int64()),
        "loading": pa.array(np.round(v * s, _PCA_OUT_ROUND), pa.float64()),
    })
