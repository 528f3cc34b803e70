"""Multimodal plumbing: schema, actor stage contract, stubbed decode."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from great_expectations_ray.stages.multimodal import (
    DecodeNotAvailable,
    MediaDecoder,
    make_fake_media_table,
)


def test_fake_decode_pipeline():
    import ray.data as rd

    t = make_fake_media_table(40)
    ds = rd.from_arrow(t).repartition(2)
    out = ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"use_fake": True},
        batch_format="pyarrow",
        batch_size=8,
        concurrency=2,
    )
    df = out.to_pandas()
    assert len(df) == 40
    assert df.payload_sha256.str.len().eq(64).all()
    assert df.feat.map(len).eq(16).all()
    # deterministic: same payload -> same feature
    df2 = (
        rd.from_arrow(t)
        .map_batches(MediaDecoder, fn_constructor_kwargs={"use_fake": True},
                     batch_format="pyarrow", batch_size=8, concurrency=2)
        .to_pandas()
    )
    a = df.sort_values("media_id").reset_index(drop=True)
    b = df2.sort_values("media_id").reset_index(drop=True)
    assert (a.payload_sha256 == b.payload_sha256).all()
    assert all(list(x) == list(y) for x, y in zip(a.feat, b.feat))


def test_real_decode_raises_clearly():
    dec = MediaDecoder(use_fake=False)
    t = make_fake_media_table(2)
    with pytest.raises(DecodeNotAvailable):
        dec(t)


def test_resize_nearest_math():
    from great_expectations_ray.stages.multimodal import resize_nearest

    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4)
    assert small[0, 0] == img[0, 0] and small[3, 3] == img[6, 6]
    up = resize_nearest(img, 16, 16)
    assert up.shape == (16, 16) and up[15, 15] == img[7, 7]


def test_media_resizer_stage():
    import ray.data as rd

    from great_expectations_ray.stages.multimodal import (
        MediaResizer,
        make_fake_media_table,
    )

    ds = rd.from_arrow(make_fake_media_table(12))
    out = ds.map_batches(
        MediaResizer, fn_constructor_kwargs={"use_fake": True, "out_h": 8, "out_w": 8},
        batch_size=4, batch_format="pyarrow", concurrency=2,
    )
    rows = out.take_all()
    assert len(rows) == 12
    assert all(len(r["resized"]) == 64 for r in rows)
    assert all(list(r["resized_shape"]) == [8, 8] for r in rows)


def test_frame_sampler_stage():
    import ray.data as rd

    from great_expectations_ray.stages.multimodal import (
        FrameSampler,
        make_fake_media_table,
    )

    t = make_fake_media_table(6)  # duration 1000ms on even rows, 0 on odd
    ds = rd.from_arrow(t)
    out = ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"use_fake": True, "fps": 2.0, "max_frames": 4},
        batch_size=3, batch_format="pyarrow", concurrency=2,
    )
    rows = out.take_all()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # 1000 ms at 2 fps -> 2 frames; duration 0 -> 1 frame
    for mid, frames in by_id.items():
        want = 2 if int(mid[1:]) % 2 == 0 else 1
        assert len(frames) == want, (mid, frames)
        assert sorted(f["frame_idx"] for f in frames) == list(range(want))
        # frames are deterministic and differ across frame times
        if want == 2:
            feats = [tuple(f["frame_feat"]) for f in sorted(frames, key=lambda f: f["frame_idx"])]
            assert feats[0] != feats[1]
    # payload column is NOT fanned out
    assert set(rows[0].keys()) == {"media_id", "frame_idx", "frame_ms", "frame_feat"}
