from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.mixing import (
    _hex8_to_u64,
    mix_with_repetition,
    repeat_plan,
    weight_threshold_hex,
)


def _tbl(n=40, sources=("a", "b", "c", "d")):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array([sources[i % len(sources)] for i in range(n)]),
    })


def test_hex8_matches_hashlib():
    from great_expectations_ray.stages.dedup import md5_column

    ids = pa.array([0, 1, 42, 99999], pa.int64())
    got = _hex8_to_u64(md5_column(ids))
    exp = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in [0, 1, 42, 99999]]
    assert got.tolist() == exp


def test_integer_weights_exact_repeats():
    reps = repeat_plan(_tbl(), {"a": 3.0, "b": 0.0}, default_weight=1.0)
    src = _tbl().column("source").to_pylist()
    for r, s in zip(reps, src):
        assert r == {"a": 3, "b": 0}.get(s, 1)


def test_fractional_weight_matches_md5_threshold():
    w = {"a": 1.5}
    reps = repeat_plan(_tbl(), w, default_weight=1.0)
    thr = int(weight_threshold_hex(1.5), 16)
    for i, (r, s) in enumerate(zip(reps, _tbl().column("source").to_pylist())):
        if s != "a":
            assert r == 1
        else:
            rank = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            assert r == (2 if rank < thr else 1)


def test_explode_epochs_and_drop():
    ds = rd.from_arrow(_tbl(20, ("a", "b"))).repartition(3)
    out = (
        mix_with_repetition(ds, {"a": 2.0, "b": 0.0})
        .to_pandas()
        .sort_values(["doc_id", "epoch"])
        .reset_index(drop=True)
    )
    assert set(out["source"]) == {"a"}
    assert len(out) == 20  # 10 'a' docs x 2 epochs
    assert list(out.groupby("doc_id")["epoch"].apply(list)) == [[0, 1]] * 10


def test_expected_fraction_roughly_half():
    n = 2000
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "source": pa.array(["x"] * n)})
    reps = repeat_plan(tbl, {"x": 0.5})
    frac = (reps == 1).mean()
    assert 0.45 < frac < 0.55 and set(np.unique(reps)) <= {0, 1}
