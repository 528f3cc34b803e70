"""Multimodal plumbing: schema, actor stage contract, stubbed decode."""

from __future__ import annotations

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
