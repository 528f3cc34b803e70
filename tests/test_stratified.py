"""Deterministic stratified sampling (stages/stratified.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from great_expectations_ray.stages.stratified import stratified_sample


def _brute(ids, strata, k):
    """Independent per-stratum smallest-md5 selection."""
    rows = sorted(
        zip(strata, ids),
        key=lambda r: (r[0], hashlib.md5(str(r[1]).encode()).hexdigest(), r[1]),
    )
    out, counts = [], {}
    for s, i in rows:
        if counts.get(s, 0) < k:
            out.append((s, i))
            counts[s] = counts.get(s, 0) + 1
    return sorted(out)


def test_matches_bruteforce_across_partitions(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    n = 2_000
    ids = rng.permutation(n)
    strata = np.array(["abcdef"[i] for i in rng.integers(0, 6, n)])
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "grp": pa.array(strata)})
    for parts in (1, 7):
        out = (
            stratified_sample(
                rd.from_arrow(t).repartition(parts),
                strata_cols=["grp"], id_col="doc_id", k=3,
            )
            .to_pandas()
            .sort_values(["grp", "doc_id"])
        )
        got = sorted(zip(out["grp"], out["doc_id"]))
        assert got == _brute(ids, strata, 3), f"parts={parts}"


def test_small_stratum_returns_all(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": [1, 2, 3], "grp": ["x", "x", "y"]})
    out = stratified_sample(
        rd.from_arrow(t), strata_cols=["grp"], id_col="doc_id", k=10
    ).to_pandas()
    assert len(out) == 3  # quotas larger than strata return every row


def test_bad_k(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": [1], "grp": ["x"]})
    with pytest.raises(ValueError):
        stratified_sample(rd.from_arrow(t), strata_cols=["grp"], id_col="doc_id", k=0)


def test_null_stratum_gets_its_own_quota(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "grp": pa.array(["a", "a", None, None, None, "b"]),
    })
    out = stratified_sample(
        rd.from_arrow(t).repartition(3), strata_cols=["grp"], id_col="doc_id", k=2
    ).to_pandas()
    # null stratum keeps exactly k=2 of its 3 rows; a/b keep all theirs
    assert len(out[out["grp"].isna()]) == 2
    assert len(out[out["grp"] == "a"]) == 2
    assert len(out[out["grp"] == "b"]) == 1
