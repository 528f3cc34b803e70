"""Distributed prefix-sum sequence packing (stages/packing.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from great_expectations_ray.stages.packing import global_token_offsets


def _run(vals, seq_len, parts, ray_unused=None):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array(np.arange(len(vals)), pa.int64()),
        "tokens": pa.array(np.asarray(vals, dtype=np.int64)),
    })
    ds = rd.from_arrow(t).repartition(parts)
    return (
        global_token_offsets(ds, token_col="tokens", order_col="doc_id", seq_len=seq_len)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_offsets_match_serial_cumsum(ray_session):
    rng = np.random.default_rng(13)
    vals = rng.integers(0, 500, size=3_000)
    out = _run(vals, 2048, parts=9)
    expect = np.zeros(len(vals), dtype=np.int64)
    np.cumsum(vals[:-1], out=expect[1:])
    assert np.array_equal(out["token_offset"].to_numpy(), expect)
    assert np.array_equal(out["seq_id"].to_numpy(), expect // 2048)


def test_zero_token_docs_share_offsets(ray_session):
    out = _run([5, 0, 0, 3, 0, 2], 4, parts=3)
    assert out["token_offset"].tolist() == [0, 5, 5, 5, 8, 8]
    assert out["seq_id"].tolist() == [0, 1, 1, 1, 2, 2]


def test_single_block(ray_session):
    out = _run([10, 10, 10], 15, parts=1)
    assert out["seq_id"].tolist() == [0, 0, 1]


def test_bad_seq_len(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": [1], "tokens": [2]}))
    with pytest.raises(ValueError):
        global_token_offsets(ds, token_col="tokens", order_col="doc_id", seq_len=0)
