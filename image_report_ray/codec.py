"""Run-length codec for integer profiles in lineage reports.

Same ``"value:run"`` token format as the reference's one purpose-built
codec (/root/reference/utils.py:229-267, round-trip tested at
/root/reference/tests/test_rle.py:20-37). Used here to compactly embed
per-epoch op-count profiles and other integer sequences in lineage XML
(declared as ``encoding="rle"`` on the element, mirroring
/root/reference/ir:280-283).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence


def rle_encode(values: Iterable[int]) -> str:
    """Encode an integer sequence as space-separated ``value:run`` tokens.

    ``[5, 5, 5, 0, 0, 7] -> "5:3 0:2 7:1"``. Empty input encodes to ``""``.
    """
    out: list[str] = []
    it = iter(values)
    try:
        cur = next(it)
    except StopIteration:
        return ""
    run = 1
    for v in it:
        if v == cur:
            run += 1
        else:
            out.append(f"{cur}:{run}")
            cur, run = v, 1
    out.append(f"{cur}:{run}")
    return " ".join(out)


def rle_decode(encoded: str) -> list[int]:
    """Inverse of :func:`rle_encode`. ``"" -> []``.

    Raises ``ValueError`` on malformed tokens (non-integer value/run or a
    non-positive run length).
    """
    if not encoded:
        return []
    out: list[int] = []
    for tok in encoded.split():
        value_s, sep, run_s = tok.partition(":")
        if not sep:
            raise ValueError(f"malformed RLE token (no ':'): {tok!r}")
        value, run = int(value_s), int(run_s)
        if run <= 0:
            raise ValueError(f"non-positive run length in token: {tok!r}")
        out.extend([value] * run)
    return out


def rle_roundtrip_ok(values: Sequence[int]) -> bool:
    """Convenience validator: does encode->decode reproduce ``values``?"""
    return rle_decode(rle_encode(values)) == list(values)
