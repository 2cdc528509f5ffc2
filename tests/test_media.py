"""Multimodal stage tests: FMED codec round-trip, actor-pool stage
contracts (binary in, typed out; 1->N frame explode), pipeline
determinism."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from image_report_ray.stages.media import (
    HEADER_LEN,
    ByteHistogramFeatures,
    FrameSampler,
    MediaDecoder,
    pack_media,
    unpack_header,
)

SF = "/root/testdata/sf0.001"


def test_pack_unpack_roundtrip():
    p = pack_media(2, 320, 240, 17, b"framedata")
    assert unpack_header(p) == (2, 320, 240, 17)
    assert p[HEADER_LEN:] == b"framedata"
    assert len(p) == HEADER_LEN + 9


def test_unpack_rejects_garbage():
    with pytest.raises(ValueError):
        unpack_header(b"NOPExxxxxxxxxxxxxxxx")


def _batch():
    return pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [
                    pack_media(0, 64, 32, 1, b"image-bytes"),
                    pack_media(1, 16, 8000, 1, b"audio-bytes!"),
                    pack_media(2, 320, 240, 9, b"video-bytes!!"),
                ],
                pa.binary(),
            ),
        }
    )


def test_decoder_stage_contract():
    out = MediaDecoder()(_batch())
    assert out.column("kind").to_pylist() == ["image", "audio", "video"]
    assert out.column("width").to_pylist() == [64, 16, 320]
    assert out.column("n_frames").to_pylist() == [1, 1, 9]
    assert out.column("n_body_bytes").to_pylist() == [11, 12, 13]


def test_frame_sampler_explodes_video_only():
    out = FrameSampler(stride=4)(_batch())
    rows = list(
        zip(out.column("media_id").to_pylist(), out.column("frame_idx").to_pylist())
    )
    # image/audio: one pseudo-frame; video with 9 frames, stride 4: 0,4,8
    assert rows == [(1, 0), (2, 0), (3, 0), (3, 4), (3, 8)]


def test_feature_stage_deterministic_and_normalized():
    f1 = ByteHistogramFeatures()(_batch())
    f2 = ByteHistogramFeatures()(_batch())
    assert f1.equals(f2)
    for feat, nb in zip(
        f1.column("feature").to_pylist(), f1.column("n_body_bytes").to_pylist()
    ):
        assert len(feat) == ByteHistogramFeatures.N_BINS
        assert abs(sum(feat) - 1.0) < 1e-5  # histogram / n_bytes sums to 1
        assert nb > 0


def test_media_pipeline_actor_pool(ray_session):
    from image_report_ray.pipelines.multimodal import media_features, media_meta

    meta = media_meta(SF)
    assert meta.num_rows == 500
    kinds = set(meta.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}
    feats = media_features(SF)
    assert feats.num_rows == 500
    # determinism across runs (fresh actor pools)
    assert feats.equals(media_features(SF))


def test_parse_headers_matches_unpack_header():
    import numpy as np

    from image_report_ray.stages.media import parse_headers

    payloads = [
        pack_media(0, 64, 32, 1, b"image-bytes"),
        pack_media(1, 16, 8000, 1, b""),
        pack_media(2, 320, 240, 17, b"video!" * 100),
    ]
    col = pa.array(payloads, pa.binary())
    hdr = parse_headers(col)
    for i, p in enumerate(payloads):
        k, w, h, nf = unpack_header(p)
        assert (hdr["kind"][i], hdr["width"][i], hdr["height"][i],
                hdr["n_frames"][i]) == (k, w, h, nf)
        assert hdr["body_len"][i] == len(p) - 16
    # sliced column: buffer offsets must be honored
    hdr2 = parse_headers(col.slice(1))
    assert list(hdr2["kind"]) == [1, 2]
    with pytest.raises(ValueError, match="FMED"):
        parse_headers(pa.array([b"XXXX" + b"\0" * 12], pa.binary()))
    with pytest.raises(ValueError, match="FMED"):
        parse_headers(pa.array([b"FM"], pa.binary()))
    empty = parse_headers(pa.array([], pa.binary()))
    assert len(empty["kind"]) == 0


def test_synth_media_batch_matches_per_row_pack():
    from image_report_ray.pipelines.multimodal import synth_media_batch

    ids = [0, 1, 2, 5, 17, 100]
    texts = ["hello world", "", "a", "répété", "x" * 500, "tail"]
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts)})
    got = synth_media_batch(t)
    for i, (did, text) in enumerate(zip(ids, texts)):
        kind = did % 3
        expected = pack_media(
            kind,
            16 + (did * 7919) % 240,
            16 + (did * 104729) % 240,
            8 + (did * 31) % 25 if kind == 2 else 1,
            text.encode("utf-8"),
        )
        assert got.column("payload")[i].as_py() == expected, i


def test_media_resizer_semantics():
    """Resized payloads: floor-scaled dims (audio keeps its rate), every
    f-th body byte, headers still valid FMED — verified per row against
    a hand-built expectation."""
    from image_report_ray.stages.media import MediaResizer, unpack_header

    rows = [
        (0, 100, 60, 1, b"0123456789abc"),   # image
        (1, 44, 8000, 1, b"samples-data"),   # audio: rate 44 preserved
        (2, 33, 17, 12, b"videobodybytes!"), # video
        (0, 1, 1, 1, b""),                   # degenerate: dims floor at 1
    ]
    payloads = [pack_media(*r) for r in rows]
    batch = pa.table(
        {"media_id": pa.array(range(len(rows)), pa.int64()),
         "payload": pa.array(payloads, pa.binary())}
    )
    out = MediaResizer(factor=2)(batch)
    for i, (kind, w, h, nf, body) in enumerate(rows):
        p = out.column("payload")[i].as_py()
        k2, w2, h2, nf2 = unpack_header(p)
        assert k2 == kind
        assert w2 == (w if kind == 1 else max(w // 2, 1))
        assert h2 == max(h // 2, 1)
        assert nf2 == nf
        assert p[16:] == body[::2], i


def test_stages_accept_large_binary_payloads():
    """large_binary payloads (Arrow's >2 GiB promotion / upstream writer
    choice) parse identically to binary — int64 offsets, not garbage."""
    from image_report_ray.stages.media import MediaResizer

    b = _batch()
    lb = b.set_column(
        1, "payload", b.column("payload").cast(pa.large_binary())
    )
    out_lb, out_b = MediaDecoder()(lb), MediaDecoder()(b)
    # pass-through payload keeps its input type; values must match
    assert out_lb.set_column(
        6, "payload", out_lb.column("payload").cast(pa.binary())
    ).equals(out_b)
    assert ByteHistogramFeatures()(lb).equals(ByteHistogramFeatures()(b))
    assert FrameSampler(stride=4)(lb).equals(FrameSampler(stride=4)(b))
    assert MediaResizer(factor=2)(lb).equals(MediaResizer(factor=2)(b))


def test_binary_offsets_rejects_non_binary():
    from image_report_ray.stages.media import _binary_offsets

    with pytest.raises(TypeError):
        _binary_offsets(pa.array([1, 2, 3], pa.int64()))


def test_media_dedup_planted_duplicates(ray_session, tmp_path):
    """Two docs share a body (different doc_id => different header): the
    smaller media_id wins with n_copies=2 and ITS kind; unique bodies
    come back with n_copies=1."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from image_report_ray.pipelines.multimodal import media_dedup

    texts = ["same body text", "unique one", "same body text", "unique two"]
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * 4),
                  "source": pa.array(["s"] * 4),
                  "n_chars": pa.array([len(s) for s in texts], pa.int64())}),
        os.path.join(str(tmp_path), "documents.parquet"))
    out = media_dedup(str(tmp_path))
    assert out.to_pylist() == [
        {"media_id": 0, "kind": "image", "n_copies": 2},
        {"media_id": 1, "kind": "audio", "n_copies": 1},
        {"media_id": 3, "kind": "image", "n_copies": 1},
    ]


def test_media_content_hasher_multibyte_bodies():
    """The body gather must respect utf-8 byte lengths (CJK/emoji) and
    batch slicing."""
    import pyarrow as pa

    from image_report_ray.pipelines.multimodal import synth_media_batch
    from image_report_ray.stages.media import MediaContentHasher

    texts = ["你好世界", "emoji 🎉🎊", "plain", "你好世界"]
    t = pa.table({"doc_id": pa.array([5, 6, 7, 8], pa.int64()),
                  "text": pa.array(texts)})
    m = synth_media_batch(t)
    h = MediaContentHasher()
    full = h(m)
    assert full.num_rows == 3  # 你好世界 deduped in-batch (min id 5)
    by_h = {r["h"]: r for r in full.to_pylist()}
    dup = [r for r in full.to_pylist() if r["n_part"] == 2]
    assert dup and dup[0]["media_id"] == 5
    # sliced application hashes identically
    sliced = h(m.slice(3, 1))
    assert sliced.column("h").to_pylist()[0] in by_h
