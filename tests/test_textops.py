"""Text-analysis operator tests: winnowing fingerprints vs a naive
reference implementation, language-ID kernels on a corpus with real
per-language signal, and ANN recall floors."""

from __future__ import annotations

import numpy as np
import pytest

from image_report_ray.pipelines.text import (
    _FP_BASE,
    _FP_K,
    _FP_W,
    fit_lang_profiles,
    predict_langs,
    winnow_fingerprints_kernel,
)

SF = "/root/testdata/sf0.001"


def _naive_winnow(s: str) -> set[int]:
    b = s.encode("utf-8")
    if len(b) < _FP_K:
        return set()
    hs = []
    for i in range(len(b) - _FP_K + 1):
        h = np.uint64(0)
        for c in b[i : i + _FP_K]:
            h = h * _FP_BASE + np.uint64(c)
        hs.append(int(h))
    if len(hs) <= _FP_W:
        return {min(hs)}
    out = set()
    for i in range(len(hs) - _FP_W + 1):
        win = hs[i : i + _FP_W]
        m = min(win)
        # rightmost minimum (robust winnowing)
        j = max(k for k, v in enumerate(win) if v == m)
        out.add(win[j])
    return out


def test_winnow_matches_naive():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short",
        "aaaaaaaaaaaaaaaa",  # degenerate: identical grams
        "",
        "exactly8",          # == K bytes -> single gram
    ]
    got = winnow_fingerprints_kernel(texts)
    for t, g in zip(texts, got):
        assert set(int(x) for x in g) == _naive_winnow(t), t


def test_winnow_batch_matches_kernel():
    """The batch-wide offsets kernel must agree with the per-text
    reference kernel on every doc — including empties, exact-K texts,
    degenerate repeats, multibyte UTF-8, and a sliced (non-zero offset)
    Arrow array."""
    import pyarrow as pa

    from image_report_ray.pipelines.text import winnow_fingerprints_batch

    rng = np.random.default_rng(11)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "short", "", "exactly8", "aaaaaaaaaaaaaaaa",
        "你好世界这是一个测试文本哈哈", "emoji 🎉🎊 party 🎉🎊 again",
    ] + ["".join(rng.choice(list("abcd e"), size=int(n))) for n in
         rng.integers(0, 60, size=40)]
    sets = winnow_fingerprints_kernel(texts)
    for col in (pa.array(texts), pa.array(["pad"] + texts).slice(1),
                pa.chunked_array([texts[:10], texts[10:]])):
        n, mn, xr = winnow_fingerprints_batch(col)
        for i, s in enumerate(sets):
            assert n[i] == len(s), texts[i]
            assert mn[i] == (int(s[0]) if len(s) else 0), texts[i]
            assert xr[i] == (int(np.bitwise_xor.reduce(s)) if len(s) else 0)


def test_winnow_shared_substring_shares_fingerprints():
    a = "prefix COMMON SHARED WINDOW OF TEXT suffix-a-very-different-tail"
    b = "other COMMON SHARED WINDOW OF TEXT completely-unrelated-ending"
    fa, fb = winnow_fingerprints_kernel([a, b])
    assert len(np.intersect1d(fa, fb)) > 0


def test_winnow_unicode_multibyte():
    """Multibyte UTF-8 (CJK, emoji) hashes over BYTES — must round-trip
    against the naive reference and never crash on non-ASCII."""
    texts = ["你好世界这是一个测试文本哈哈", "emoji 🎉🎊 party 🎉🎊 again", "héllo wörld ünïcode tëxt"]
    got = winnow_fingerprints_kernel(texts)
    for t, g in zip(texts, got):
        assert set(int(x) for x in g) == _naive_winnow(t), t


def test_dedup_kernels_unicode():
    import pyarrow as pa

    from image_report_ray.pipelines.dedup import doc_shingles, simhash64

    texts = ["你好 世界 这是 测试 文本", "héllo wörld ünïcode tëxt is größer", "🎉 a b c 🎊"]
    batch = pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)})
    df = doc_shingles(batch)
    assert set(df[df.doc_id == 0].shingle) == {"你好 世界 这是", "世界 这是 测试", "这是 测试 文本"}
    sh = simhash64(batch)
    assert len(set(sh.column("simhash").to_pylist())) == 3  # distinct, no crash


def test_lang_kernels_separate_real_signal():
    # constructed corpus with disjoint per-language vocabularies
    rng = np.random.default_rng(7)
    vocab = {
        "en": [f"en{i}" for i in range(40)],
        "fr": [f"fr{i}" for i in range(40)],
        "de": [f"de{i}" for i in range(40)],
    }
    texts, labels = [], []
    for lang, words in vocab.items():
        for _ in range(30):
            texts.append(" ".join(rng.choice(words, size=20)))
            labels.append(lang)
    profiles = fit_lang_profiles(texts[::3], labels[::3], top_k=25)
    preds = predict_langs(texts, profiles)
    acc = float(np.mean([p == l for p, l in zip(preds, labels)]))
    assert acc == 1.0, acc


def test_lang_id_pipeline_shape(ray_session):
    from image_report_ray.pipelines.text import lang_id

    t = lang_id(SF)
    assert t.column_names == ["doc_id", "lang_pred", "lang_true", "correct"]
    assert t.num_rows == 500
    # deterministic: second run identical
    assert t.equals(lang_id(SF))


def test_knn_lsh_recall_floor(ray_session):
    from image_report_ray.pipelines.similarity import knn_cosine, knn_cosine_lsh

    exact = set(knn_cosine(SF).column("vec_id").to_pylist())
    approx = set(knn_cosine_lsh(SF).column("vec_id").to_pylist())
    assert len(exact & approx) / len(exact) >= 0.5


def test_knn_ivf_recall_floor_and_determinism(ray_session):
    from image_report_ray.pipelines.similarity import knn_cosine, knn_cosine_ivf

    exact = set(knn_cosine(SF).column("vec_id").to_pylist())
    ivf = knn_cosine_ivf(SF)
    approx = set(ivf.column("vec_id").to_pylist())
    assert len(exact & approx) / len(exact) >= 0.5
    assert ivf.equals(knn_cosine_ivf(SF))  # seeded k-means -> deterministic


def test_ivf_index_layout_and_reuse(ray_session, tmp_path):
    """build_ivf_index writes a physical cell-partitioned layout; the
    query path prunes to probe cells and reuses the published index."""
    import glob
    import os

    from image_report_ray.pipelines.similarity import (
        _IVF_CELLS,
        _ivf_index_dir,
        knn_cosine_ivf,
    )

    knn_cosine_ivf(SF)  # builds (or reuses) the index
    idx = _ivf_index_dir(SF)
    assert os.path.exists(os.path.join(idx, "centroids.npy"))
    cells = glob.glob(os.path.join(idx, "cell=*"))
    assert 1 < len(cells) <= _IVF_CELLS
    # every vector landed in exactly one cell
    import pyarrow.parquet as pq

    n = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(idx, "cell=*", "*.parquet"))
    )
    assert n == pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(idx, "**"))}
    knn_cosine_ivf(SF, query_vec_id=1)
    assert mtimes == {
        f: os.path.getmtime(f) for f in glob.glob(os.path.join(idx, "**"))
    }  # second query did not rebuild


def test_ivf_cache_invalidates_on_content_change(tmp_path):
    """The index cache tag is a content fingerprint: rewriting
    embeddings.parquet in place must yield a different index dir (no
    silently-stale neighbors)."""
    import os
    import shutil

    from image_report_ray.pipelines.similarity import _ivf_index_dir

    sf = str(tmp_path)
    shutil.copy(f"{SF}/embeddings.parquet", os.path.join(sf, "embeddings.parquet"))
    tag1 = _ivf_index_dir(sf)
    assert tag1 == _ivf_index_dir(sf)  # stable while content is unchanged
    # regenerate in place: same path, different bytes/mtime
    with open(os.path.join(sf, "embeddings.parquet"), "ab") as f:
        f.write(b"\0")
    os.utime(os.path.join(sf, "embeddings.parquet"))
    assert _ivf_index_dir(sf) != tag1


def test_predict_langs_vectorized_equals_loop_kernel():
    import pyarrow as pa

    from image_report_ray.pipelines.text import (
        fit_lang_profiles,
        predict_langs,
        predict_langs_vectorized,
    )

    rng = np.random.default_rng(3)
    vocab = {"aa": [f"a{i}" for i in range(30)],
             "bb": [f"b{i}" for i in range(30)],
             "cc": [f"c{i}" for i in range(30)]}
    texts, labels = [], []
    for lang, words in vocab.items():
        for _ in range(20):
            # overlap some shared words so ties/ambiguity exercise paths
            texts.append(" ".join(list(rng.choice(words, 12)) + ["the", "x"]))
            labels.append(lang)
    texts += ["", "   ", "the x the x"]  # empty + tie cases
    profiles = fit_lang_profiles(texts[:60:2], labels[:60:2], top_k=10)
    loop = predict_langs(texts, profiles)
    vec = predict_langs_vectorized(pa.array(texts), profiles)
    assert list(vec) == loop


def test_distributed_lang_fit_matches_kernel(ray_session):
    """The pipeline's distributed sample fit must equal fit_lang_profiles
    on the same 10% sample."""
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import fit_lang_profiles, lang_id

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    df = t.to_pandas()
    s = df[df.doc_id % 10 == 0]
    kernel_prof = fit_lang_profiles(s.text.tolist(), s.lang.tolist(), top_k=30)
    out = lang_id(SF)
    # rebuild what the pipeline predicted using the kernel profiles: the
    # pipeline is deterministic, so loop-kernel predictions on kernel
    # profiles must reproduce its lang_pred column exactly
    from image_report_ray.pipelines.text import predict_langs

    exp = predict_langs(df.sort_values("doc_id").text.tolist(), kernel_prof)
    assert out.column("lang_pred").to_pylist() == exp


def test_embedding_near_dups_lsh_recall(ray_session, tmp_path):
    """Banded-LSH scale path: planted near-dup pairs (cos >= 0.97) are
    recovered vs the exact pipeline; sims agree to 4 decimals."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.similarity import (
        embedding_near_dups,
        embedding_near_dups_lsh,
    )

    rng = np.random.default_rng(21)
    dim = 32
    base = rng.standard_normal((60, dim))
    jit = base[:20] + 0.05 * rng.standard_normal((20, dim))  # near-dups of 0..19
    mat = np.concatenate([base, jit])
    d = tmp_path / "emb"
    os.makedirs(d)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                   pa.list_(pa.float32())),
        }),
        str(d / "embeddings.parquet"),
    )
    exact = embedding_near_dups(str(d), threshold=0.95)
    approx = embedding_near_dups_lsh(str(d), threshold=0.95)
    ep = set(zip(exact.column("vec_id_a").to_pylist(),
                 exact.column("vec_id_b").to_pylist()))
    ap = set(zip(approx.column("vec_id_a").to_pylist(),
                 approx.column("vec_id_b").to_pylist()))
    assert len(ep) >= 15          # the planted pairs exist
    assert len(ep & ap) / len(ep) >= 0.9
    assert ap <= ep               # exact verify: no false positives
    # the gate: force the size cutoff and confirm the routed result
    routed = embedding_near_dups(str(d), threshold=0.95, max_broadcast_rows=10)
    assert routed.num_rows == approx.num_rows


def test_funnel_stages_constructed_edges(ray_session, tmp_path):
    """Ordered-funnel semantics on a constructed table: all four stages
    reachable, same-timestamp events do NOT chain (strictly-after), and
    out-of-order events don't count."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.relational import funnel_stages

    def ev(uid, typ, us):
        return (uid, typ, us)

    rows = [
        ev(0, "error", 10),                                  # stage 0
        ev(1, "view", 10),                                   # stage 1
        ev(2, "view", 10), ev(2, "click", 20),               # stage 2
        ev(3, "view", 10), ev(3, "click", 20), ev(3, "purchase", 30),  # 3
        # same-ts click as the view: strictly-after fails -> stage 1
        ev(4, "view", 10), ev(4, "click", 10),
        # purchase BEFORE the click completes: no chain -> stage 2
        ev(5, "view", 10), ev(5, "purchase", 15), ev(5, "click", 20),
        # later view re-opens nothing: greedy earliest view at 10,
        # click at 5 precedes it -> stage 1
        ev(6, "click", 5), ev(6, "view", 10),
    ]
    t = pa.table(
        {"user_id": pa.array([r[0] for r in rows], pa.int64()),
         "event_type": pa.array([r[1] for r in rows]),
         "ts": pa.array([r[2] for r in rows], pa.timestamp("us"))}
    )
    d = tmp_path / "ev"
    os.makedirs(d)
    pq.write_table(t, str(d / "events.parquet"))
    out = funnel_stages(str(d))
    got = dict(zip(out.column("user_id").to_pylist(),
                   out.column("funnel_stage").to_pylist()))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 2, 6: 1}


def test_retention_cohorts_constructed(ray_session, tmp_path):
    """Multi-cohort retention triangle on a constructed table: Monday
    truncation, distinct-week dedup (two events in one week count the
    user once), and cross-cohort separation."""
    import os
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.relational import retention_cohorts

    def ts(s):
        return datetime.fromisoformat(s)

    # 2024-01-01 and 2024-01-08 are Mondays
    rows = [
        (0, ts("2024-01-03")), (0, ts("2024-01-05")),  # cohort w0, off 0 (x2 -> once)
        (0, ts("2024-01-16")),                          # off 2
        (1, ts("2024-01-07")),                          # Sunday -> cohort w0
        (1, ts("2024-01-08")),                          # Monday -> off 1
        (2, ts("2024-01-10")),                          # cohort w1 only
    ]
    t = pa.table(
        {"user_id": pa.array([r[0] for r in rows], pa.int64()),
         "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))}
    )
    d = tmp_path / "ev"
    os.makedirs(d)
    pq.write_table(t, str(d / "events.parquet"))
    out = retention_cohorts(str(d))
    got = {
        (c.date().isoformat(), o): n
        for c, o, n in zip(out.column("cohort_week").to_pylist(),
                           out.column("week_offset").to_pylist(),
                           out.column("n_users").to_pylist())
    }
    assert got == {
        ("2024-01-01", 0): 2,   # users 0 and 1 in cohort week 2024-01-01
        ("2024-01-01", 1): 1,   # user 1 active the next week
        ("2024-01-01", 2): 1,   # user 0 two weeks later
        ("2024-01-08", 0): 1,   # user 2's own cohort
    }


def test_lsh_index_layout_route_equality_and_reuse(ray_session, tmp_path):
    """build_lsh_index writes the physical pid-partitioned signature
    layout; the near-dup query auto-routes through it and the result is
    BIT-IDENTICAL to the exchange route — at the build threshold, at a
    different threshold (signatures are threshold-independent), and
    under the hot-bucket cap. Re-queries reuse the published files."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.similarity import (
        _ND_BANDS,
        _lsh_index_dir,
        build_lsh_index,
        embedding_near_dups_lsh,
    )

    rng = np.random.default_rng(33)
    dim = 32
    base = rng.standard_normal((60, dim))
    jit = base[:15] + 0.05 * rng.standard_normal((15, dim))
    hot = np.tile(base[0], (10, 1))  # identical cluster -> hot buckets
    mat = np.concatenate([base, jit, hot])
    d = tmp_path / "emb"
    os.makedirs(d)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                   pa.list_(pa.float32())),
        }),
        str(d / "embeddings.parquet"),
    )
    sf = str(d)
    # exchange-route results BEFORE any index exists
    ex_95 = embedding_near_dups_lsh(sf, 0.95)
    ex_99 = embedding_near_dups_lsh(sf, 0.99)
    ex_cap = embedding_near_dups_lsh(sf, 0.95, max_band_freq=4)
    assert ex_95.num_rows > 0

    meta = build_lsh_index(sf)
    idx = _lsh_index_dir(sf)
    assert os.path.exists(os.path.join(idx, "meta.json"))
    assert meta["n_rows"] == len(mat) and meta["bands"] == _ND_BANDS
    files = glob.glob(os.path.join(idx, "pid=*", "*.parquet"))
    assert files
    # every (vector, band) posting landed in exactly one pid
    n = sum(pq.read_metadata(f).num_rows for f in files)
    assert n == len(mat) * _ND_BANDS

    # index route == exchange route, bit-for-bit, all three variants
    assert embedding_near_dups_lsh(sf, 0.95).equals(ex_95)
    assert embedding_near_dups_lsh(sf, 0.99).equals(ex_99)
    assert embedding_near_dups_lsh(sf, 0.95, max_band_freq=4).equals(ex_cap)

    # reuse: neither the re-build nor the queries rewrote any file
    assert build_lsh_index(sf) == meta
    mtimes = {f: os.path.getmtime(f) for f in files}
    embedding_near_dups_lsh(sf, 0.95)
    assert mtimes == {f: os.path.getmtime(f) for f in files}


def test_lsh_index_dir_invalidates_on_content_change(tmp_path):
    """The signature-index tag is a content fingerprint (the IVF rule):
    rewriting embeddings.parquet in place must yield a different dir."""
    import os
    import shutil

    from image_report_ray.pipelines.similarity import _lsh_index_dir

    sf = str(tmp_path)
    shutil.copy(f"{SF}/embeddings.parquet", os.path.join(sf, "embeddings.parquet"))
    tag1 = _lsh_index_dir(sf)
    assert tag1 == _lsh_index_dir(sf)
    with open(os.path.join(sf, "embeddings.parquet"), "ab") as f:
        f.write(b"\0")
    os.utime(os.path.join(sf, "embeddings.parquet"))
    assert _lsh_index_dir(sf) != tag1


def test_documents_corpus_deterministic(tmp_path):
    from image_report_ray.sources.synth import write_documents_corpus
    import pyarrow.parquet as pq

    d1 = write_documents_corpus(str(tmp_path / "a"), 2_000, seed=9)
    d2 = write_documents_corpus(str(tmp_path / "b"), 2_000, seed=9)
    t1 = pq.read_table(f"{d1}/documents.parquet")
    t2 = pq.read_table(f"{d2}/documents.parquet")
    assert t1.equals(t2)
    # planted exact duplicates exist
    n_uniq = len(set(t1.column("text").to_pylist()))
    assert n_uniq < t1.num_rows


def test_dedup_exact_semijoin_path_matches_broadcast(ray_session):
    """Forcing the winner count over the broadcast bound must produce the
    identical result through the co-partitioned semi-join."""
    from image_report_ray.pipelines.text import dedup_exact

    base = dedup_exact(SF)
    routed = dedup_exact(SF, max_broadcast_ids=10)
    assert base.equals(routed)


def test_pack_docs_distributed_scan_multiblock(ray_session, tmp_path):
    """The two-pass prefix-sum must preserve doc order across many
    blocks: per-block totals + exclusive prefix == a single global
    cumulative sum."""
    import numpy as np
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import pack_docs
    from image_report_ray.sources.synth import write_documents_corpus

    d = write_documents_corpus(str(tmp_path / "c"), 8_000, seed=4,
                               rows_per_file=1_000)  # 8 row groups
    t = pack_docs(d, budget=512)
    n = np.array(t.column("n_tokens").to_pylist())
    cum = np.array(t.column("cum_tokens").to_pylist())
    pid = np.array(t.column("pack_id").to_pylist())
    assert (cum == np.cumsum(n)).all()
    assert (pid == (cum - n) // 512).all()
    assert t.column("doc_id").to_pylist() == sorted(t.column("doc_id").to_pylist())


def test_shuffle_docs_seeded_determinism(ray_session):
    from image_report_ray.pipelines.text import shuffle_docs

    a = shuffle_docs(SF, seed=1)
    b = shuffle_docs(SF, seed=1)
    c = shuffle_docs(SF, seed=2)
    assert a.equals(b)                       # reproducible
    ra = a.column("shuffle_rank").to_pylist()
    rc = c.column("shuffle_rank").to_pylist()
    assert ra != rc                          # seed actually reshuffles
    # ranks are a permutation of 1..n (bijective key -> tie-free)
    assert sorted(ra) == list(range(1, a.num_rows + 1))


def test_operators_tolerate_empty_corpus(ray_session, tmp_path):
    """No query operator may crash on an empty table (Ray emits
    schema-less empty blocks for empty inputs)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines import relational as R
    from image_report_ray.pipelines import text as T

    d = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
                  "lang": pa.array([], pa.string()), "n_chars": pa.array([], pa.int64())}),
        os.path.join(d, "documents.parquet"))
    pq.write_table(
        pa.table({"event_id": pa.array([], pa.int64()), "user_id": pa.array([], pa.int64()),
                  "event_type": pa.array([], pa.string()),
                  "ts": pa.array([], pa.timestamp("us")),
                  "value": pa.array([], pa.float64())}),
        os.path.join(d, "events.parquet"))
    for fn in (T.shuffle_docs, T.lang_stats, T.dedup_exact, T.top_tokens,
               T.quality_score, T.text_stats, T.pack_docs, T.bm25_search,
               R.hll_user_sketch, R.clicks_before_purchase_count,
               R.user_hour_activity, R.distinct_event_types,
               R.sessionize_users):
        assert fn(d).num_rows == 0, fn.__name__


def test_tfidf_top_terms_known_corpus(ray_session, tmp_path):
    """3-doc corpus with hand-computable tf-idf: 'rare' appears only in
    doc 0 (df=1, idf=3e6); 'common' in all (idf=1e6)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import tfidf_top_terms

    docs = ["rare rare common", "common common other", "common other other"]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(docs)})
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    out = tfidf_top_terms(str(tmp_path), k=2).to_pandas()
    d0 = out[out.doc_id == 0]
    assert list(d0.token) == ["rare", "common"]
    assert list(d0.score) == [2 * 3_000_000, 1 * 1_000_000]
    assert list(d0["rank"]) == [1, 2]
    d1 = out[out.doc_id == 1]  # common tf=2 score 2e6 > other tf=1 score 1.5e6
    assert list(d1.token) == ["common", "other"]
    assert list(d1.score) == [2_000_000, 1_500_000]


def test_stratified_sample_rates_and_determinism(ray_session):
    from image_report_ray.pipelines.text import stratified_sample

    t = stratified_sample(SF).to_pandas()
    assert list(t.columns) == ["doc_id", "lang", "h_bucket", "sampled"]
    non_en = t[t.lang != "en"]
    assert non_en.sampled.all()  # rate 1.0 strata keep everything
    en = t[t.lang == "en"]
    if len(en) >= 50:
        assert 0.1 < en.sampled.mean() < 0.4  # ~0.25 by the seeded coin
    t2 = stratified_sample(SF).to_pandas()
    assert t.equals(t2)  # reproducible membership
    t3 = stratified_sample(SF, seed=99).to_pandas()
    assert not t.sampled.equals(t3.sampled)  # the seed actually matters


def test_lang_char_quantiles_matches_numpy_disc(ray_session):
    """Histogram-fold quantiles == direct discrete quantiles of the raw
    column (smallest value whose cumulative count reaches ceil(q*n))."""
    import math

    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import lang_char_quantiles

    got = lang_char_quantiles(SF).to_pandas()
    raw = pq.read_table(f"{SF}/documents.parquet",
                        columns=["lang", "n_chars"]).to_pandas()
    for (lang, q), grp in got.groupby(["lang", "q"]):
        vals = np.sort(raw[raw.lang == lang].n_chars.to_numpy())
        idx = max(math.ceil(q * len(vals)), 1) - 1
        assert grp.n_chars_q.iloc[0] == vals[idx], (lang, q)


def test_content_flags_constructed_corpus(ray_session, tmp_path):
    """The synthetic driver corpus has no URLs/emails, so pin the rule
    pack on a constructed one — counts, flag verdicts, and DuckDB parity
    (both engines run RE2)."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import content_flags

    docs = [
        "plain text only",
        "see https://a.example/x and http://b.example/y?z=1",
        "mail me at a.b+c@ex-ample.co.uk thanks",
        "tel 12345678 and card 99999999999",
        " ".join(f"https://spam{i}.example" for i in range(5)),  # >3 urls
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    got = content_flags(str(tmp_path)).to_pandas()
    assert list(got.n_urls) == [0, 2, 0, 0, 5, 0]
    assert list(got.n_emails) == [0, 0, 1, 0, 0, 0]
    assert list(got.n_long_numbers) == [0, 0, 0, 2, 0, 0]
    assert list(got.content_ok) == [True, True, False, True, False, True]

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(e.oracle_sql()["content_flags"]).arrow().to_pandas()
    assert got.equals(oracle[got.columns.tolist()])


def test_kmeans_embed_matches_naive_lloyd(ray_session):
    """Distributed k-means == a single-process Lloyd replay with the same
    pinned rounding rules (seeds, 9dp distance argmin, 6dp means)."""
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.similarity import (
        _KM_CENT_ROUND,
        _KM_DIST_ROUND,
        _KM_ITERS,
        _KM_K,
        _stack,
        kmeans_embed,
    )

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = _stack(t.column("embedding"))
    order = np.argsort(ids, kind="stable")
    cents = m[order[:_KM_K]]

    def assign(c):
        d2 = ((m[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return np.argmin(np.round(d2, _KM_DIST_ROUND), axis=1)

    for _ in range(_KM_ITERS):
        a = assign(cents)
        new = cents.copy()
        for j in range(_KM_K):
            if (a == j).any():
                new[j] = m[a == j].mean(axis=0)
        cents = np.round(new, _KM_CENT_ROUND)
    expect = dict(zip(ids.tolist(), assign(cents).tolist()))

    out = kmeans_embed(SF)
    got = dict(
        zip(
            out.column("vec_id").to_pylist(),
            out.column("cluster_id").to_pylist(),
        )
    )
    assert got == expect
    # every cluster id is in range and the clustering is non-trivial
    vals = set(got.values())
    assert vals <= set(range(_KM_K)) and len(vals) > 1


def test_redact_text_sequential_masking(ray_session, tmp_path):
    """Redaction is SEQUENTIAL over the rule pack: a URL containing
    digits is masked as one <URL> (the later digit rule must not fire
    inside it), and counts reflect each rule over already-masked text —
    plus DuckDB parity for the nested regexp_replace twin."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import redact_text

    docs = [
        "plain text only",
        "go to https://a.example/12345678/x now",   # URL eats the digits
        "mail a.b+c@ex-ample.co.uk or 99999999",    # email + number
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    got = redact_text(str(tmp_path)).to_pandas()
    assert list(got.text_redacted) == [
        "plain text only",
        "go to <URL> now",
        "mail <EMAIL> or <NUM>",
        "",
    ]
    assert list(got.n_redacted) == [0, 1, 2, 0]
    assert list(got.redacted) == [False, True, True, False]

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(e.oracle_sql()["redact_text"]).arrow().to_pandas()
    assert got.equals(oracle[got.columns.tolist()])


def test_repetition_stats_constructed_corpus(ray_session, tmp_path):
    """Pin the duplicate-instance semantics on hand-built docs: a
    looping doc is flagged out, a clean doc keeps, sub-gram docs
    surface with zero counts — plus DuckDB parity."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import repetition_stats

    docs = [
        "a b " * 20,                      # pure loop: almost all dup grams
        "the quick brown fox jumps over the lazy dog",  # clean
        "one",                            # no 2-grams at all
        "",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    pq.write_table(t, os.path.join(str(tmp_path), "documents.parquet"))
    got = repetition_stats(str(tmp_path)).to_pandas()
    # doc 0: 40 tokens -> 39 2-grams, only 2 distinct ("a b", "b a")
    assert got.n_2grams[0] == 39 and got.n_dup_2grams[0] == 37
    assert not got.rep_ok[0]
    assert got.rep_ok[1] and got.n_dup_2grams[1] == 0
    assert got.n_2grams[2] == 0 and got.rep_ok[2]
    assert got.n_3grams[3] == 0 and got.rep_ok[3]

    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet')"
    )
    oracle = con.execute(e.oracle_sql()["repetition_stats"]).arrow().to_pandas()
    assert got.equals(oracle[got.columns.tolist()])


def test_corpus_export_consistent_with_standalone_gates(ray_session):
    """corpus_export's per-gate booleans equal the standalone queries'
    verdicts (same kernels by construction — this pins the composition
    wiring), keep is their conjunction, and the forced exchange route
    equals the broadcast route."""
    from image_report_ray.pipelines.dedup import decontaminate
    from image_report_ray.pipelines.text import (
        content_flags,
        corpus_export,
        dedup_exact,
        quality_score,
        repetition_stats,
    )

    sf = "/root/testdata/sf0.001"
    out = corpus_export(sf).to_pandas().set_index("doc_id")
    q = quality_score(sf).to_pandas().set_index("doc_id")
    r = repetition_stats(sf).to_pandas().set_index("doc_id")
    c = content_flags(sf).to_pandas().set_index("doc_id")
    d = decontaminate(sf).to_pandas().set_index("doc_id")
    winners = set(dedup_exact(sf).to_pandas().doc_id)

    assert (out.quality_ok == q.quality_ok.loc[out.index]).all()
    assert (out.rep_ok == r.rep_ok.loc[out.index]).all()
    assert (out.content_ok == c.content_ok.loc[out.index]).all()
    assert (out.decontam_ok == ~d.contaminated.loc[out.index]).all()
    assert (out.dedup_keep == out.index.isin(winners)).all()
    assert (
        out.keep == (out.quality_ok & out.rep_ok & out.content_ok
                     & out.dedup_keep & out.decontam_ok)
    ).all()
    assert out.keep.sum() > 0

    forced = corpus_export(sf, max_broadcast_ids=0)
    assert forced.equals(corpus_export(sf))


def test_shuffle_docs_rejects_non_power_of_two_P(ray_session):
    from image_report_ray.pipelines.text import shuffle_docs

    with pytest.raises(ValueError, match="power of two"):
        shuffle_docs(SF, P=6)


def test_domain_cap_matches_naive_and_is_deterministic(ray_session):
    from image_report_ray.pipelines.text import _splitmix64, domain_cap

    import pyarrow.parquet as pq

    cap = 7
    t = domain_cap(SF, cap=cap)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "lang"])
    did = docs.column("doc_id").to_numpy().astype(np.uint64)
    lang = docs.column("lang").to_numpy(zero_copy_only=False)
    key = _splitmix64(did + np.uint64(0xD0CA))
    want = {}
    for lg in sorted(set(lang)):
        m = lang == lg
        order = np.argsort(key[m], kind="stable")[:cap]
        want[lg] = list(did[m][order].astype(int))
    got = {}
    for r in t.to_pylist():
        got.setdefault(r["lang"], []).append(r["doc_id"])
        assert r["sample_rank"] == len(got[r["lang"]])  # dense 1..cap
    assert got == want
    # per-group cap respected and re-run identical
    assert all(len(v) <= cap for v in got.values())
    assert domain_cap(SF, cap=cap).equals(t)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="cap"):
        domain_cap(SF, cap=0)


def test_perplexity_score_orders_rare_docs_higher(ray_session, tmp_path):
    """Unigram-LM cross-entropy sanity on a constructed corpus: a doc of
    corpus-common tokens scores LOWER (more in-distribution) than a doc
    of rare tokens, OOV tokens score highest, empty docs score 0, and
    the math matches a naive Python model exactly."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import perplexity_score

    texts = ["common common common common"] * 8 + [
        "common rare1 rare2",       # mixes in rare tokens
        "",                         # empty -> ce 0
    ]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts),
         "lang": pa.array(["en"] * len(texts)),
         "n_chars": pa.array([len(x) for x in texts], pa.int64())}
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    res = perplexity_score(str(d))
    ce = dict(zip(res.column("doc_id").to_pylist(), res.column("ce").to_pylist()))
    assert ce[0] < ce[8]          # all-common doc beats the mixed doc
    assert ce[9] == 0.0           # empty doc
    # naive replica: counts common=33, rare1=1, rare2=1; V=3
    total, V = 35, 3
    lp = {k: round(math.log((n + 1) / (total + V + 1)), 9)
          for k, n in (("common", 33), ("rare1", 1), ("rare2", 1))}
    want8 = round(-(lp["common"] + lp["rare1"] + lp["rare2"]) / 3, 4)
    want0 = round(-lp["common"], 4)
    assert ce[8] == want8 and ce[0] == want0
    assert perplexity_score(str(d)).equals(res)  # deterministic


def test_perplexity_score_trailing_empty_doc_exact(ray_session, tmp_path):
    """Regression: a block ENDING with a zero-token doc must not truncate
    the last non-empty doc's segment sum (the old reduceat start-clipping
    dropped its final token's log-prob: ce=1.0 instead of the correct
    full-segment value for ['alpha beta gamma', '   '])."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import perplexity_score

    texts = ["alpha beta gamma", "   "]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts),
         "lang": pa.array(["en"] * len(texts)),
         "n_chars": pa.array([len(x) for x in texts], pa.int64())}
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    res = perplexity_score(str(d))
    ce = dict(zip(res.column("doc_id").to_pylist(), res.column("ce").to_pylist()))
    # counts: alpha=1 beta=1 gamma=1; total=3, V=3 -> each lp=log(2/7)
    lp = round(math.log(2 / 7), 9)
    assert ce[0] == round(-lp, 4)   # full 3-token segment, not truncated
    assert ce[1] == 0.0             # whitespace-only doc


def test_boilerplate_flags_detects_shared_header(ray_session, tmp_path):
    """A 10-token header chunk shared by many docs flags as boilerplate
    in each of them; unique-body docs keep; a doc that is ALL header
    crosses the basis-point gate and drops."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import boilerplate_flags

    header = " ".join(f"h{i}" for i in range(10))
    texts = [
        # header + 30 unique tokens -> 4 chunks, 1 boilerplate (2500bp)
        header + " " + " ".join(f"u{d}x{i}" for i in range(30))
        for d in range(6)
    ] + [header]  # all-header doc: 1/1 chunks boilerplate -> drop
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts),
         "lang": pa.array(["en"] * len(texts)),
         "n_chars": pa.array([len(x) for x in texts], pa.int64())}
    )
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    res = boilerplate_flags(str(d))
    rows = {r["doc_id"]: r for r in res.to_pylist()}
    for i in range(6):
        assert rows[i]["n_chunks"] == 4 and rows[i]["n_boiler"] == 1
        assert rows[i]["boiler_bp"] == 2500 and rows[i]["keep"]
    assert rows[6]["n_chunks"] == 1 and rows[6]["n_boiler"] == 1
    assert rows[6]["boiler_bp"] == 10000 and not rows[6]["keep"]
    assert boilerplate_flags(str(d)).equals(res)  # deterministic

    import pytest as _pytest

    with _pytest.raises(ValueError, match="chunk_tokens"):
        boilerplate_flags(str(d), chunk_tokens=0)


def test_mixture_weights_temperature_rule(ray_session):
    import math

    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import mixture_weights

    t = mixture_weights(SF)
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["lang"])
    import collections

    counts = collections.Counter(docs.column("lang").to_pylist())
    w = {lg: math.pow(n, 0.5) for lg, n in counts.items()}
    tot = sum(w.values())
    for r in t.to_pylist():
        assert r["n_docs"] == counts[r["lang"]]
        assert r["mix_weight"] == round(w[r["lang"]] / tot, 6)
    # weights sum to ~1 and small sources are up-weighted vs raw share
    assert abs(sum(r["mix_weight"] for r in t.to_pylist()) - 1.0) < 1e-4
    small = min(counts, key=counts.get)
    raw_share = counts[small] / sum(counts.values())
    got = {r["lang"]: r["mix_weight"] for r in t.to_pylist()}
    assert got[small] > raw_share


def test_bm25_search_exact_integer_scores(ray_session, tmp_path):
    """3-doc corpus with a hand-replayable BM25: top-2 DF terms are
    'the' (df=3) and 'cat' (df=2); scores must equal the exact
    floor-per-term integer formula and rank by (score desc, doc_id)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import bm25_search

    docs = ["the cat sat", "the the dog", "a the cat"]
    d = str(tmp_path)
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(docs),
                  "lang": pa.array(["en"] * 3),
                  "n_chars": pa.array([len(s) for s in docs], pa.int64())}),
        os.path.join(d, "documents.parquet"))
    out = bm25_search(d)
    N, L = 3, 9
    dfm = {"the": 3, "cat": 2}
    exp = {}
    for did, s in enumerate(docs):
        toks = s.split()
        dl = len(toks)
        sc = 0
        for w, df in dfm.items():
            tf = toks.count(w)
            if tf:
                sc += ((2 * N - 2 * df + 1) * 44 * L * tf * 10**6) // (
                    (2 * df + 1) * (20 * L * tf + 6 * L + 18 * dl * N)
                )
        exp[did] = sc
    got = dict(zip(out.column("doc_id").to_pylist(),
                   out.column("score_micro").to_pylist()))
    assert got == exp
    assert out.column("doc_id").to_pylist() == sorted(
        exp, key=lambda i: (-exp[i], i)
    )


def test_heavy_hitters_routes_bit_equal(ray_session):
    """The certified MG-sketch path and the forced exact-exchange
    fallback (m too small to certify) must return identical tables."""
    from image_report_ray.pipelines.text import heavy_hitters

    a = heavy_hitters(SF)
    b = heavy_hitters(SF, m=4)  # certification must fail at m=4
    assert a.equals(b)
    assert a.num_rows > 0


def test_heavy_hitters_constructed_corpus(ray_session, tmp_path):
    """Hand-checkable φ=1/3 heavy hitters per language."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import heavy_hitters

    # en: 6 tokens, 'x' appears 3 (> 6/3=2 ✓), 'y' 2 (not > 2), 'z' 1
    # fr: 3 tokens, 'a' appears 2 (> 1 ✓), 'b' 1 (not > 1)
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["x x y", "x y z", "a a b"]),
                  "lang": pa.array(["en", "en", "fr"]),
                  "n_chars": pa.array([5, 5, 5], pa.int64())}),
        os.path.join(str(tmp_path), "documents.parquet"))
    out = heavy_hitters(str(tmp_path), phi_inv=3)
    assert out.to_pylist() == [
        {"lang": "en", "token": "x", "n": 3},
        {"lang": "fr", "token": "a", "n": 2},
    ]


def test_pareto_kernel_matches_bruteforce_random():
    """O(n log n) sweep vs the O(n²) dominance definition, including
    duplicate points (never dominate each other) and empty input."""
    from image_report_ray.pipelines.text import pareto_kernel

    rng = np.random.default_rng(3)
    for _ in range(300):
        n = int(rng.integers(0, 40))
        x = rng.integers(0, 8, n).astype(np.int64)
        y = rng.integers(0, 8, n).astype(np.int64)
        got = pareto_kernel(x, y)
        exp = np.array(
            [not any((x[j] >= x[i] and y[j] <= y[i])
                     and (x[j] > x[i] or y[j] < y[i]) for j in range(n))
             for i in range(n)], bool) if n else np.zeros(0, bool)
        assert (got == exp).all()


def test_pareto_docs_block_split_invariant(ray_session, tmp_path):
    """The local+global sweep must equal a single global sweep — write
    the same corpus as 1 file and as 4 row groups and compare."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.text import pareto_docs

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(words, size=int(k)))
             for k in rng.integers(1, 60, size=200)]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * 200),
                  "n_chars": pa.array([len(s) for s in texts], pa.int64())})
    d1, d2 = tmp_path / "one", tmp_path / "many"
    os.makedirs(d1); os.makedirs(d2)
    pq.write_table(t, str(d1 / "documents.parquet"))
    pq.write_table(t, str(d2 / "documents.parquet"), row_group_size=50)
    a, b = pareto_docs(str(d1)), pareto_docs(str(d2))
    assert a.equals(b)
    assert a.num_rows > 0


def test_embedding_outliers_consistent_with_kmeans(ray_session):
    """Every outlier (cluster_id, vec_id) must agree with kmeans_embed's
    assignment, ranks are 1..topn per cluster, and the trainer refactor
    keeps the run deterministic."""
    from image_report_ray.pipelines.similarity import (
        embedding_outliers,
        kmeans_embed,
    )

    out = embedding_outliers(SF)
    assert out.num_rows > 0
    assign = dict(zip(kmeans_embed(SF).column("vec_id").to_pylist(),
                      kmeans_embed(SF).column("cluster_id").to_pylist()))
    ranks = {}
    for r in out.to_pylist():
        assert assign[r["vec_id"]] == r["cluster_id"]
        ranks.setdefault(r["cluster_id"], []).append(r["rank"])
    for rs in ranks.values():
        assert rs == list(range(1, len(rs) + 1))
    assert out.equals(embedding_outliers(SF))


def test_pq_index_route_equality_and_reuse(ray_session, tmp_path):
    """build_pq_index persists codebooks + M-byte codes; knn_cosine_pq
    auto-routes through them and the result is BIT-IDENTICAL to the
    fresh encode route (codes share the pinned rounded-argmin kernel).
    Re-queries reuse the published files; the dir tag is content-
    fingerprinted like the IVF/LSH indexes."""
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.similarity import (
        _PQ_M,
        _pq_index_dir,
        build_pq_index,
        knn_cosine_pq,
    )

    rng = np.random.default_rng(77)
    dim = 32
    mat = rng.standard_normal((90, dim))
    mat[5] = mat[0] + 0.01 * rng.standard_normal(dim)  # a clear neighbor
    d = tmp_path / "emb"
    os.makedirs(d)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat],
                                   pa.list_(pa.float32())),
        }),
        str(d / "embeddings.parquet"),
    )
    sf = str(d)
    fresh = knn_cosine_pq(sf)
    assert fresh.num_rows > 0

    idx = _pq_index_dir(sf)
    assert not os.path.exists(idx)
    scratch = f"{idx}.building-test"
    meta = build_pq_index(sf, scratch)
    os.rename(scratch, idx)
    assert meta["n_vectors"] == len(mat) and meta["m"] == _PQ_M
    files = glob.glob(os.path.join(idx, "codes", "*.parquet"))
    assert files
    # indexed route == fresh route, bit-for-bit
    assert knn_cosine_pq(sf).equals(fresh)
    # reuse: the query rewrote nothing
    mtimes = {f: os.path.getmtime(f) for f in files}
    knn_cosine_pq(sf)
    assert mtimes == {f: os.path.getmtime(f) for f in files}
    # content change -> different tag (invalidation)
    with open(os.path.join(sf, "embeddings.parquet"), "ab") as f:
        f.write(b"\0")
    os.utime(os.path.join(sf, "embeddings.parquet"))
    assert _pq_index_dir(sf) != idx
    shutil.rmtree(idx, ignore_errors=True)
