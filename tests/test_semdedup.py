"""SemDeDup semantic dedup (stages/semdedup.py) + deterministic-sample
regression for the k-means trainer sites."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from great_expectations_ray.stages.semdedup import _greedy_prune, semdedup


def _emb_df(vectors: list[list[float]]) -> pd.DataFrame:
    return pd.DataFrame(
        {"vec_id": list(range(len(vectors))), "embedding": [list(v) for v in vectors]}
    )


def test_greedy_prune_keeps_first_of_each_ball():
    M = np.array([[1.0, 0.0], [0.999, 0.04], [0.0, 1.0], [1.0, 0.001]])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    dup = _greedy_prune(M, threshold=0.99)
    # row0 kept; row1 ~row0 dup; row2 orthogonal kept; row3 ~row0 dup
    assert dup.tolist() == [False, True, False, True]


def test_semdedup_marks_planted_neardups(ray_session):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((20, 8))
    # plant near-copies of rows 0..4 (tiny perturbation, same direction)
    copies = base[:5] + 1e-4 * rng.standard_normal((5, 8))
    vecs = np.vstack([base, copies])
    ds = rd.from_pandas(_emb_df(vecs.tolist()))
    out = (
        semdedup(ds, threshold=0.99, n_centroids=4, sample_rows=100)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert len(out) == 25
    # every planted copy (ids 20..24) marks dup; its original survives
    for i in range(5):
        assert bool(out.at[20 + i, "is_dup"]), i
        assert not bool(out.at[i, "is_dup"]), i


def test_semdedup_run_to_run_deterministic(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 8))
    ds = rd.from_pandas(_emb_df(vecs.tolist()))
    a = semdedup(ds, n_centroids=4).to_pandas().sort_values("vec_id")
    b = semdedup(ds, n_centroids=4).to_pandas().sort_values("vec_id")
    assert a.cluster.tolist() == b.cluster.tolist()
    assert a.is_dup.tolist() == b.is_dup.tolist()


def test_max_cluster_size_caps_work(ray_session):
    # 30 identical vectors, one cluster: overflow past the cap is marked dup
    vecs = [[1.0, 0.0, 0.0]] * 30
    ds = rd.from_pandas(_emb_df(vecs))
    out = (
        semdedup(ds, threshold=0.9, n_centroids=1, max_cluster_size=10)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert not bool(out.iloc[0].is_dup)
    assert out.is_dup.sum() == 29  # 9 exact-verified + 20 capped


def test_ivf_prefix_sample_deterministic(ray_session):
    """Regression: the k-means sample is an id predicate, not limit() —
    identical quantizer (hence identical result) across runs."""
    from great_expectations_ray.stages.ann import ivf_topk

    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((200, 16))
    df = _emb_df(vecs.tolist())
    q = vecs[3]
    r1 = ivf_topk(rd.from_pandas(df), q, k=5, sample_rows=150)
    r2 = ivf_topk(rd.from_pandas(df.sample(frac=1.0, random_state=1)), q, k=5,
                  sample_rows=150)
    assert r1 == r2  # row order of the input never changes the quantizer
