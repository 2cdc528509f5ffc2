"""RLE codec: round-trips (random + structured) and malformed input.

Mirrors the reference's codec tests (/root/reference/tests/test_rle.py:20-37).
"""

import numpy as np
import pytest

from image_report_ray.codec import rle_decode, rle_encode


def test_empty():
    assert rle_encode([]) == ""
    assert rle_decode("") == []


def test_structured():
    assert rle_encode([5, 5, 5, 0, 0, 7]) == "5:3 0:2 7:1"
    assert rle_decode("5:3 0:2 7:1") == [5, 5, 5, 0, 0, 7]


def test_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(50):
        vals = rng.integers(-3, 4, size=rng.integers(0, 200)).tolist()
        assert rle_decode(rle_encode(vals)) == vals


def test_compresses_runs():
    vals = [1] * 1000 + [2] * 1000
    assert len(rle_encode(vals)) < len(" ".join(map(str, vals)))


def test_negative_values_roundtrip():
    vals = [-5, -5, 0, 3]
    assert rle_decode(rle_encode(vals)) == vals


@pytest.mark.parametrize("bad", ["5", "5:0", "5:-1", "a:2", "1:b"])
def test_malformed_raises(bad):
    with pytest.raises(ValueError):
        rle_decode(bad)
