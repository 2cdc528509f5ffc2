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
