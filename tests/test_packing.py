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


# ---- deterministic training shuffle (stages/shuffle.py) ------------------- #


def test_training_shuffle_positions_and_shards(ray_session):
    import ray.data as rd

    from great_expectations_ray.stages.shuffle import training_shuffle

    n = 101
    ds = rd.from_arrow(pa.table({"doc_id": list(range(n))})).repartition(5)
    out = training_shuffle(ds, n_shards=8, seed=0).to_pandas()
    assert sorted(out["pos"].tolist()) == list(range(n))  # a permutation
    assert (out["shard"] == out["pos"] % 8).all()
    sizes = out["shard"].value_counts()
    assert sizes.max() - sizes.min() <= 1  # balanced to +/- 1


def test_training_shuffle_deterministic_and_seeded(ray_session):
    import ray.data as rd

    from great_expectations_ray.stages.shuffle import training_shuffle

    ds1 = rd.from_arrow(pa.table({"doc_id": list(range(64))}))
    ds2 = rd.from_arrow(pa.table({"doc_id": list(range(64))})).repartition(7)
    a = training_shuffle(ds1, seed=3).to_pandas().sort_values("doc_id")
    b = training_shuffle(ds2, seed=3).to_pandas().sort_values("doc_id")
    assert a["pos"].tolist() == b["pos"].tolist()  # partitioning-invariant
    c = training_shuffle(ds1, seed=4).to_pandas().sort_values("doc_id")
    assert a["pos"].tolist() != c["pos"].tolist()  # seed changes the order
    # not the identity order (it actually shuffles)
    assert a["pos"].tolist() != sorted(a["pos"].tolist())
