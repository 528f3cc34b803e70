"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata columns; the
Ray-side contract (schemas, batch sizing, actor signatures, output layout) is
real and tested, while the codec itself is STUBBED behind
``DecodeNotAvailable`` (no image/audio libraries in this container) with a
deterministic fake decoder for tests.

Scale notes baked into the design:
- binary payloads make rows WIDE: callers should drop ``batch_size`` to keep
  ``batch_size × payload × concurrency`` inside worker heaps (e.g. 64 rows of
  4 MB images × 8 actors ≈ 2 GB in flight)
- decode/feature stages are actor pools (codec init is expensive)
- outputs are separate feature columns, never re-encoded payloads, so the
  heavy bytes stay in their original blocks
"""

from __future__ import annotations

import hashlib
import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.string()),
        pa.field("media_type", pa.string()),   # image/png, audio/wav, ...
        pa.field("payload", pa.large_binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


class DecodeNotAvailable(NotImplementedError):
    """Raised by the real decode path: codec libraries are not installed."""


def _real_decode(payload: bytes, media_type: str) -> np.ndarray:
    raise DecodeNotAvailable(
        f"no codec available for {media_type}; install an image/audio library "
        "and replace MediaDecoder.decode"
    )


def _fake_decode(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic stand-in: 'pixels' derived from the payload digest —
    stable shapes/dtypes so downstream plumbing is fully exercised."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * 48)[: 32 * 32], dtype=np.uint8)
    return arr.reshape(32, 32).astype(np.float32) / 255.0


class MediaDecoder:
    """Actor-pool stage: ``ds.map_batches(MediaDecoder, concurrency=N,
    batch_size=SMALL, fn_constructor_kwargs={"use_fake": True})``.

    Emits ``feat`` (list<float> pooled feature vector) + ``payload_sha256``;
    never mutates or re-emits the payload column downstream (project it away
    with ``select_columns`` after this stage to free the heavy bytes)."""

    def __init__(self, use_fake: bool = False, feat_dim: int = 16):
        self.decode = _fake_decode if use_fake else _real_decode
        self.feat_dim = feat_dim

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column("payload").combine_chunks()
        types = tbl.column("media_type").combine_chunks()
        feats = []
        shas = []
        for i in range(len(payloads)):
            raw = payloads[i].as_py() if payloads[i].is_valid else b""
            shas.append(hashlib.sha256(raw).hexdigest())
            img = self.decode(raw, types[i].as_py())
            # mean-pool rows into a fixed-dim feature (the plumbing contract;
            # a real model replaces this in `decode`)
            pooled = img.mean(axis=0)
            k = max(len(pooled) // self.feat_dim, 1)
            feats.append([float(x) for x in pooled[: self.feat_dim * k : k][: self.feat_dim]])
        tbl = tbl.append_column("payload_sha256", pa.array(shas, pa.string()))
        tbl = tbl.append_column("feat", pa.array(feats, pa.list_(pa.float32())))
        return tbl


def make_fake_media_table(n: int, seed: int = 11) -> pa.Table:
    """Deterministic media fixture rows (synthetic payload bytes)."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8).tobytes()
                for i in range(n)]
    return pa.table({
        "media_id": pa.array([f"m{i}" for i in range(n)], pa.string()),
        "media_type": pa.array(["image/png" if i % 2 else "audio/wav" for i in range(n)]),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array([32] * n, pa.int32()),
        "height": pa.array([32] * n, pa.int32()),
        "duration_ms": pa.array([0 if i % 2 else 1000 for i in range(n)], pa.int32()),
    })


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of a decoded (H, W[, C]) array — pure numpy
    index math, no codec needed (the resize itself is NOT stubbed; only the
    bytes->array decode is)."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[rows][:, cols]


class MediaResizer:
    """Actor-pool stage: decode -> nearest-neighbor resize -> pooled feature.
    ``ds.map_batches(MediaResizer, concurrency=N, batch_size=SMALL,
    fn_constructor_kwargs={"use_fake": True, "out_h": 16, "out_w": 16})``."""

    def __init__(self, use_fake: bool = False, out_h: int = 16, out_w: int = 16):
        self.decode = _fake_decode if use_fake else _real_decode
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column("payload").combine_chunks()
        types = tbl.column("media_type").combine_chunks()
        out = []
        for i in range(len(payloads)):
            raw = payloads[i].as_py() if payloads[i].is_valid else b""
            img = self.decode(raw, types[i].as_py())
            small = resize_nearest(img, self.out_h, self.out_w)
            out.append(small.reshape(-1).astype(np.float32).tolist())
        tbl = tbl.append_column("resized", pa.array(out, pa.list_(pa.float32())))
        tbl = tbl.append_column(
            "resized_shape",
            pa.array([[self.out_h, self.out_w]] * tbl.num_rows, pa.list_(pa.int32())),
        )
        return tbl


class FrameSampler:
    """Video frame sampling as a flat-map-shaped actor stage: each payload
    row expands to one row per sampled frame (uniform stride from
    ``duration_ms`` at ``fps``), each with a pooled frame feature.  The frame
    DECODE is behind the same stub; the sampling math (which frames, how
    many, output layout) is the real contract.

    Output: media_id, frame_idx, frame_ms, frame_feat — payload dropped so
    the heavy bytes never fan out with the frames."""

    def __init__(self, use_fake: bool = False, fps: float = 1.0,
                 max_frames: int = 8, feat_dim: int = 16):
        self.decode = _fake_decode if use_fake else _real_decode
        self.fps = fps
        self.max_frames = max_frames
        self.feat_dim = feat_dim

    def sample_times_ms(self, duration_ms: int) -> list[int]:
        if duration_ms <= 0:
            return [0]
        n = min(max(int(duration_ms / 1000.0 * self.fps), 1), self.max_frames)
        step = duration_ms / n
        return [int(i * step) for i in range(n)]

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payloads = tbl.column("payload").combine_chunks()
        ids = tbl.column("media_id").combine_chunks()
        types = tbl.column("media_type").combine_chunks()
        durs = tbl.column("duration_ms").combine_chunks()
        out_id, out_idx, out_ms, out_feat = [], [], [], []
        for i in range(len(payloads)):
            raw = payloads[i].as_py() if payloads[i].is_valid else b""
            base = self.decode(raw, types[i].as_py())
            for j, t_ms in enumerate(self.sample_times_ms(int(durs[i].as_py() or 0))):
                # fake path: derive the frame from (payload, t_ms) so frames
                # differ deterministically; a real codec seeks to t_ms
                frame = (
                    self.decode(raw + t_ms.to_bytes(4, "little"), types[i].as_py())
                    if self.decode is _fake_decode else base
                )
                pooled = frame.mean(axis=0)
                k = max(len(pooled) // self.feat_dim, 1)
                out_feat.append(
                    [float(x) for x in pooled[: self.feat_dim * k : k][: self.feat_dim]]
                )
                out_id.append(ids[i].as_py())
                out_idx.append(j)
                out_ms.append(t_ms)
        return pa.table({
            "media_id": pa.array(out_id, pa.string()),
            "frame_idx": pa.array(out_idx, pa.int32()),
            "frame_ms": pa.array(out_ms, pa.int32()),
            "frame_feat": pa.array(out_feat, pa.list_(pa.float32())),
        })
