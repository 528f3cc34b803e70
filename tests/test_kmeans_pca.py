"""Distributed k-means (stages/kmeans.py) and streaming PCA (stages/pca.py):
the core claim under test is BIT-reproducibility under re-partitioning —
fixed-point integer partials make every cross-block fold exact, so changing
how Ray splits blocks must not change a single output bit."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from great_expectations_ray.stages.kmeans import (
    assign_kmeans,
    fit_kmeans,
    init_centroids,
)
from great_expectations_ray.stages.pca import fit_pca, project_pca


def _emb_df(n: int = 120, dim: int = 12, seed: int = 5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((4, dim)) * 3.0
    rows = centers[rng.integers(0, 4, n)] + 0.3 * rng.standard_normal((n, dim))
    rows = np.clip(rows, -7.9, 7.9).astype(np.float32)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": [list(map(float, r)) for r in rows]})


def test_kmeans_bitwise_stable_under_repartition(ray_session):
    df = _emb_df()
    ds1 = rd.from_pandas(df)
    ds2 = rd.from_pandas(df).repartition(7)
    # max_driver_rows=0 forces the distributed path on both
    C1 = fit_kmeans(ds1, k=4, iters=4, seed=3, max_driver_rows=0)
    C2 = fit_kmeans(ds2, k=4, iters=4, seed=3, max_driver_rows=0)
    assert np.array_equal(C1, C2)  # bit-identical, not allclose

    a1 = assign_kmeans(ds1, C1).to_pandas().sort_values("vec_id")
    a2 = assign_kmeans(ds2, C2).to_pandas().sort_values("vec_id")
    assert a1["cluster"].tolist() == a2["cluster"].tolist()
    assert a1["sim"].tolist() == a2["sim"].tolist()


def test_kmeans_driver_fast_path_is_bit_identical(ray_session):
    """The small-table fast path (one materialization, same integer math)
    must equal the distributed path bit-for-bit."""
    df = _emb_df(100, seed=7)
    ds = rd.from_pandas(df).repartition(5)
    C_fast = fit_kmeans(ds, k=4, iters=4, seed=3)  # 100 <= cap -> fast
    C_dist = fit_kmeans(ds, k=4, iters=4, seed=3, max_driver_rows=0)
    assert np.array_equal(C_fast, C_dist)


def test_kmeans_init_is_partitioning_free(ray_session):
    df = _emb_df(60)
    c1 = init_centroids(rd.from_pandas(df), 5, seed=11)
    c2 = init_centroids(rd.from_pandas(df).repartition(9), 5, seed=11)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_kmeans_assignment_is_nearest_centroid(ray_session):
    df = _emb_df(80)
    ds = rd.from_pandas(df)
    C = fit_kmeans(ds, k=4, iters=4, seed=0)
    out = assign_kmeans(ds, C).to_pandas().sort_values("vec_id")
    M = np.stack(df.sort_values("vec_id")["embedding"].to_numpy()).astype(np.float64)
    Xn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Xn @ C.T
    assert out["cluster"].tolist() == np.argmax(sims, axis=1).tolist()
    # planted 4-cluster data: the fit should separate it
    assert out["cluster"].nunique() == 4


def test_pca_bitwise_stable_under_repartition(ray_session):
    df = _emb_df(150, dim=10, seed=9)
    m1 = fit_pca(rd.from_pandas(df), n_components=3)
    m2 = fit_pca(rd.from_pandas(df).repartition(11), n_components=3)
    assert np.array_equal(m1.components, m2.components)
    assert np.array_equal(m1.mean, m2.mean)
    assert np.array_equal(m1.explained_variance, m2.explained_variance)

    p1 = project_pca(rd.from_pandas(df), m1).to_pandas().sort_values("vec_id")
    p2 = project_pca(rd.from_pandas(df).repartition(11), m2) \
        .to_pandas().sort_values("vec_id")
    for c in ("pc1", "pc2", "pc3"):
        assert p1[c].tolist() == p2[c].tolist()


def test_pca_matches_local_float_pca(ray_session):
    """Quantization (2^-20 per element) must stay far below the signal:
    components agree with plain float64 PCA to ~1e-4."""
    df = _emb_df(200, dim=8, seed=2)
    model = fit_pca(rd.from_pandas(df), n_components=2)
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    cov = np.cov(M, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    ref = evecs[:, order].T
    for r in range(2):
        piv = int(np.argmax(np.abs(ref[r])))
        if ref[r, piv] < 0:
            ref[r] = -ref[r]
    assert np.allclose(model.components, ref, atol=1e-4)
    assert np.allclose(model.explained_variance, evals[order], rtol=1e-4)
    # contract: descending variance, orthonormal rows, positive pivot
    assert model.explained_variance[0] >= model.explained_variance[1]
    assert np.allclose(model.components @ model.components.T, np.eye(2),
                       atol=1e-9)
    for r in range(2):
        assert model.components[r, int(np.argmax(np.abs(model.components[r])))] > 0


def test_pca_magnitude_guard(ray_session):
    df = pd.DataFrame({"vec_id": [0, 1, 2],
                       "embedding": [[100.0, 1.0], [2.0, 3.0], [4.0, 5.0]]})
    with pytest.raises(Exception) as ei:
        fit_pca(rd.from_pandas(df), n_components=1)
    assert "magnitude" in str(ei.value)
