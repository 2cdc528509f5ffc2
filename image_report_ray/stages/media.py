"""Multimodal (image/audio/video) actor-pool stages over binary columns.

Media payloads are opaque ``binary`` columns with typed metadata — the
engine treats decode / feature-extract / resize / frame-sample as
stateful ``map_batches`` stages (callable classes: codec setup once per
actor in ``__init__``, per-batch work in ``__call__`` — the reference's
construct-hash-objects-once pattern, /root/reference/hashing_config.py:446-459).

The real decoders (cv2 / PIL / libav) are NOT in this container, so the
codec is resolved at actor construction: a real library if importable,
else the deterministic FAKE codec for the synthetic payload format below.
The Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested either way.

Synthetic payload format (16-byte header + body)::

    bytes 0-3   magic  b"FMED"
    byte  4     kind   0=image 1=audio 2=video
    bytes 5-8   width  (image: px) | sample_rate/1000 (audio) | frame w (video)
    bytes 9-12  height (image: px) | n_samples (audio) | frame h (video)
    bytes 13-15 n_frames (video; 1 otherwise)
    body        payload bytes (utf-8 text stand-in for pixel/sample data)
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MAGIC = b"FMED"
KINDS = ("image", "audio", "video")
HEADER_LEN = 16


def pack_media(kind: int, width: int, height: int, n_frames: int, body: bytes) -> bytes:
    return (
        MAGIC
        + struct.pack("<BII", kind, width, height)
        + struct.pack("<I", n_frames)[:3]
        + body
    )


def unpack_header(payload: bytes) -> tuple[int, int, int, int]:
    if payload[:4] != MAGIC:
        raise ValueError("not a FMED payload")
    kind, width, height = struct.unpack("<BII", payload[4:13])
    n_frames = struct.unpack("<I", payload[13:16] + b"\0")[0]
    return kind, width, height, n_frames


def _binary_offsets(col: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, n+1], data[uint8]) views straight off an Arrow
    binary array's buffers — the zero-copy path every batch-wide media
    kernel starts from. Handles both ``binary`` (int32 offsets) and
    ``large_binary`` (int64 offsets — Arrow's automatic promotion for
    >2 GiB blocks, or an upstream writer choice); anything else is a
    caller error, not garbage offsets."""
    n = len(col)
    if pa.types.is_large_binary(col.type) or pa.types.is_large_string(col.type):
        off_dtype = np.int64
    elif pa.types.is_binary(col.type) or pa.types.is_string(col.type):
        off_dtype = np.int32
    else:
        raise TypeError(f"expected a (large_)binary payload column, got {col.type}")
    offs = np.frombuffer(col.buffers()[1], off_dtype)[
        col.offset : col.offset + n + 1
    ].astype(np.int64)
    buf = col.buffers()[2]
    data = np.frombuffer(buf, np.uint8) if buf is not None else np.empty(0, np.uint8)
    return offs, data


def _le_field(data: np.ndarray, starts: np.ndarray, n_bytes: int) -> np.ndarray:
    """Little-endian unsigned ints gathered batch-wide: one lane gather
    per byte, no per-row struct.unpack."""
    out = np.zeros(len(starts), dtype=np.int64)
    for k in range(n_bytes):
        out |= data[starts + k].astype(np.int64) << (8 * k)
    return out


def parse_headers(col: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Vectorized FMED header parse over a whole batch's payload column.

    Returns kind/width/height/n_frames/body_len numpy arrays plus the
    (offsets, data) buffer views for kernels that also need the body.
    Raises on any non-FMED payload (same contract as
    :func:`unpack_header`)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offs, data = _binary_offsets(col)
    starts = offs[:-1]
    if len(starts):
        if ((offs[1:] - starts) < HEADER_LEN).any():
            raise ValueError("not a FMED payload")
        magic = np.frombuffer(MAGIC, np.uint8)
        ok = np.ones(len(starts), dtype=bool)
        for k in range(4):
            ok &= data[starts + k] == magic[k]
        if not ok.all():
            raise ValueError("not a FMED payload")
    return {
        "kind": data[starts + 4].astype(np.int64) if len(starts) else np.array([], np.int64),
        "width": _le_field(data, starts + 5, 4),
        "height": _le_field(data, starts + 9, 4),
        "n_frames": _le_field(data, starts + 13, 3),
        "body_len": offs[1:] - starts - HEADER_LEN,
        "offsets": offs,
        "data": data,
    }


class MediaDecoder:
    """Actor-pool stage: payload binary -> decoded metadata + pixel view.

    ``__init__`` resolves the codec ONCE per actor (try the real library,
    fall back to the fake codec); ``__call__`` decodes a batch. A real
    deployment would swap ``_decode_real`` for cv2.imdecode /
    soundfile.read — the stage contract (binary in, array + typed meta
    out) is unchanged."""

    def __init__(self) -> None:
        try:  # pragma: no cover - cv2 absent in this container
            import cv2  # noqa: F401

            self._backend = "cv2"
        except ImportError:
            self._backend = "fake"

    def _decode(self, payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
        if self._backend != "fake":  # pragma: no cover
            raise NotImplementedError(
                "real decode backend present but intentionally stubbed in "
                "this environment (no image libs baked in)"
            )
        kind, w, h, n_frames, body = *unpack_header(payload), payload[HEADER_LEN:]
        return kind, w, h, n_frames, np.frombuffer(body, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._backend != "fake":  # pragma: no cover
            # a real codec decodes per item (inherent); only the fake
            # header-parse path is fully batch-vectorizable
            raise NotImplementedError(
                "real decode backend present but intentionally stubbed in "
                "this environment (no image libs baked in)"
            )
        hdr = parse_headers(batch.column("payload"))
        kinds = hdr["kind"]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": pa.array(np.array(KINDS, dtype=object)[kinds], pa.string()),
                "width": pa.array(hdr["width"], pa.int32()),
                "height": pa.array(hdr["height"], pa.int32()),
                "n_frames": pa.array(hdr["n_frames"], pa.int32()),
                "n_body_bytes": pa.array(hdr["body_len"], pa.int64()),
                "payload": batch.column("payload"),
            }
        )


class ByteHistogramFeatures:
    """Actor-pool stage: decoded payload -> 32-bin byte-histogram feature
    vector (the multimodal stand-in for a model-embedding stage; at real
    scale ``__init__`` loads the model weights once per actor).

    Vectorized: one ``np.bincount`` over the batch's concatenated bytes
    with per-row segment offsets."""

    N_BINS = 32

    def __init__(self) -> None:
        # "model load" happens once per actor; the weight here is the
        # fixed bin projection
        self._edges = np.arange(0, 257, 256 // self.N_BINS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column("payload")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        # zero-copy body extraction straight from the Arrow binary
        # buffers: per-row [offset+HEADER, next_offset) byte ranges
        offs, data = _binary_offsets(col)
        starts = np.minimum(offs[:-1] + HEADER_LEN, offs[1:])
        lens = offs[1:] - starts
        cum = np.r_[0, np.cumsum(lens)]
        pos = np.arange(cum[-1]) - np.repeat(cum[:-1], lens) + np.repeat(starts, lens)
        body = data[pos]
        rows = np.repeat(np.arange(n), lens)
        # ONE bincount over the batch: flat (row, bin) index space
        hist = np.bincount(
            rows * self.N_BINS + (body >> 3), minlength=n * self.N_BINS
        ).reshape(n, self.N_BINS).astype(np.float32)
        hist /= np.maximum(lens, 1).astype(np.float32)[:, None]
        feature = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * self.N_BINS, self.N_BINS), pa.int32()),
            pa.array(hist.ravel(), pa.float32()),
        )
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "feature": feature,
                "n_body_bytes": pa.array(lens, pa.int64()),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payloads -> one output row per sampled
    frame (every ``stride``-th frame). Non-video rows pass through as a
    single pseudo-frame. Demonstrates the 1->N explode contract of a
    frame-sampling stage (``map_batches`` may return more rows than it
    received)."""

    def __init__(self, stride: int = 4) -> None:
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        hdr = parse_headers(batch.column("payload"))
        kinds = hdr["kind"]
        is_video = kinds == KINDS.index("video")
        # rows out per item: ceil(n_frames/stride) for video, 1 otherwise
        n_out = np.where(
            is_video,
            -(-np.maximum(hdr["n_frames"], 1) // self.stride),
            1,
        ).astype(np.int64)
        mids = np.repeat(batch.column("media_id").to_numpy(), n_out)
        row_of = np.repeat(np.arange(len(n_out)), n_out)
        seg_start = np.repeat(np.cumsum(n_out) - n_out, n_out)
        frame_idx = (np.arange(len(row_of)) - seg_start) * self.stride
        kind_str = np.repeat(np.array(KINDS, dtype=object)[kinds], n_out)
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "kind": pa.array(kind_str, pa.string()),
            }
        )


class MediaResizer:
    """Actor-pool stage: FMED payload -> resized FMED payload (the
    thumbnail / downsample stage of a media pipeline). Image and video
    payloads scale width and height by ``1/factor`` (floor, min 1);
    audio keeps its rate and scales the sample count. The body is
    nearest-neighbor downsampled (every ``factor``-th byte of the 1-D
    byte stand-in — a real backend would swap in cv2.resize / resampy
    with the same binary-in/binary-out contract).

    Fully batch-vectorized: headers are rebuilt as one (n, 16) uint8
    matrix and bodies gather through one strided index — no per-row
    codec calls on the fake path."""

    def __init__(self, factor: int = 2) -> None:
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor
        try:  # pragma: no cover - cv2 absent in this container
            import cv2  # noqa: F401

            self._backend = "cv2"
        except ImportError:
            self._backend = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._backend != "fake":  # pragma: no cover
            raise NotImplementedError(
                "real resize backend present but intentionally stubbed in "
                "this environment (no image libs baked in)"
            )
        f = self.factor
        hdr = parse_headers(batch.column("payload"))
        n = len(hdr["kind"])
        kind = hdr["kind"]
        scale_w = kind != KINDS.index("audio")  # audio keeps its rate
        new_w = np.where(scale_w, np.maximum(hdr["width"] // f, 1), hdr["width"])
        new_h = np.maximum(hdr["height"] // f, 1)
        body_len = hdr["body_len"]
        m = -(-body_len // f)  # ceil: resized body byte count

        heads = np.empty((n, HEADER_LEN), np.uint8)
        heads[:, 0:4] = np.frombuffer(MAGIC, np.uint8)
        heads[:, 4] = kind.astype(np.uint8)
        for k in range(4):
            heads[:, 5 + k] = (new_w >> (8 * k)).astype(np.uint8)
            heads[:, 9 + k] = (new_h >> (8 * k)).astype(np.uint8)
        for k in range(3):
            heads[:, 13 + k] = (hdr["n_frames"] >> (8 * k)).astype(np.uint8)

        out_offs = np.zeros(n + 1, np.int64)
        np.cumsum(HEADER_LEN + m, out=out_offs[1:])
        out = np.empty(int(out_offs[-1]), np.uint8)
        out[(out_offs[:-1][:, None] + np.arange(HEADER_LEN)).ravel()] = heads.ravel()
        if m.sum():
            j = np.arange(int(m.sum())) - np.repeat(np.cumsum(m) - m, m)
            body_starts = hdr["offsets"][:-1] + HEADER_LEN
            out[np.repeat(out_offs[:-1] + HEADER_LEN, m) + j] = hdr["data"][
                np.repeat(body_starts, m) + f * j
            ]
        payload = pa.Array.from_buffers(
            pa.binary(),
            n,
            [None, pa.py_buffer(out_offs.astype(np.int32)), pa.py_buffer(out)],
        )
        return pa.table(
            {"media_id": batch.column("media_id"), "payload": payload}
        )


def combine_media_digests(t: pa.Table) -> pa.Table:
    """Min-combine (h, media_id, kind[, n_part]) digest rows: one row per
    digest with the smallest media_id (its kind rides along) and the
    summed copy count. Shared by the hasher stage (in-batch combine) and
    the dedup partition kernel (final fold) so both sides of the
    exchange apply the identical winner rule."""
    if t.num_rows == 0:
        return pa.table({"h": pa.array([], pa.binary(16)),
                         "media_id": pa.array([], pa.int64()),
                         "kind": pa.array([], pa.string()),
                         "n_part": pa.array([], pa.int64())})
    if "n_part" not in t.column_names:
        t = t.append_column(
            "n_part", pa.array(np.ones(t.num_rows, np.int64), pa.int64())
        )
    idx = pc.sort_indices(
        t, sort_keys=[("h", "ascending"), ("media_id", "ascending")]
    )
    s = t.take(idx)
    h = s.column("h").to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    n = np.add.reduceat(s.column("n_part").to_numpy(), starts)
    w = s.take(pa.array(starts))
    return pa.table({"h": w.column("h"),
                     "media_id": w.column("media_id").cast(pa.int64()),
                     "kind": w.column("kind"),
                     "n_part": pa.array(n.astype(np.int64), pa.int64())})


class MediaContentHasher:
    """Actor-pool stage: payload -> (h, media_id, kind, n_part) content-
    digest partials for media dedup. ``__init__`` resolves the codec
    once per actor; ``__call__`` parses + validates every FMED header,
    packs the bodies with one vectorized gather, digests them with the
    exact-dedup two-key 128-bit scheme, and min-combines
    within the batch so only (digest, winner, kind, count) rows leave
    the actor — payload bytes never re-enter the object store."""

    def __init__(self) -> None:
        try:  # pragma: no cover - cv2 absent in this container
            import cv2  # noqa: F401

            self._backend = "cv2"
        except ImportError:
            self._backend = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._backend != "fake":  # pragma: no cover
            raise NotImplementedError(
                "real decode backend present but intentionally stubbed in "
                "this environment (no image libs baked in)"
            )
        import pandas as pd

        hdr = parse_headers(batch.column("payload"))
        offs, data = hdr["offsets"], hdr["data"]
        n = batch.num_rows
        # bodies are per-row suffixes, so one vectorized gather packs
        # them (an offsets array can only describe contiguous spans —
        # an offset shift would bleed each row into the next header)
        body_lens = (offs[1:] - offs[:-1] - HEADER_LEN).astype(np.int64)
        out_offs = np.zeros(n + 1, np.int64)
        np.cumsum(body_lens, out=out_offs[1:])
        pos = np.arange(int(out_offs[-1])) - np.repeat(
            out_offs[:-1], body_lens
        )
        packed = data[np.repeat(offs[:-1] + HEADER_LEN, body_lens) + pos]
        bodies = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(out_offs.astype(np.int32)),
             pa.py_buffer(packed)],
        )
        # the fake codec's body is utf-8 text; a real deployment hashes
        # the raw decoded bytes with the same two-key scheme
        arr = bodies.cast(pa.string()).to_numpy(zero_copy_only=False).astype(
            object
        )
        h1 = pd.util.hash_array(arr, hash_key="irrmediadedupk01")
        h2 = pd.util.hash_array(arr, hash_key="irrmediadedupk02")
        digest = np.concatenate(
            [h1.astype(np.uint64).byteswap().view(np.uint8).reshape(-1, 8),
             h2.astype(np.uint64).byteswap().view(np.uint8).reshape(-1, 8)],
            axis=1,
        ).tobytes()
        part = pa.table(
            {"h": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(16), n, [None, pa.py_buffer(digest)]),
             "media_id": batch.column("media_id"),
             "kind": pa.array(
                 np.array(KINDS, dtype=object)[hdr["kind"]], pa.string())}
        )
        return combine_media_digests(part)
