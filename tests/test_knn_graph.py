"""Multi-query kNN-graph strip (stages/ann.multi_query_topk): fixed-point
int64 dots make the result bit-reproducible under re-partitioning and let
the catalog query carry a pure-SQL oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from great_expectations_ray.stages.ann import multi_query_topk


def _emb_df(n: int = 90, dim: int = 6, seed: int = 4) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, dim)).astype(np.float32)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": [list(map(float, r)) for r in M]})


def _queries(df: pd.DataFrame, q: int):
    qdf = df[df.vec_id < q]
    Qm = np.stack(qdf["embedding"].to_numpy()).astype(np.float64)
    return qdf["vec_id"].tolist(), Qm


def test_knn_bitwise_stable_under_repartition(ray_session):
    df = _emb_df()
    qids, Qm = _queries(df, 4)
    r1 = multi_query_topk(rd.from_pandas(df), qids, Qm, k=5)
    r2 = multi_query_topk(rd.from_pandas(df).repartition(8), qids, Qm, k=5)
    assert r1 == r2  # exact triple equality, sims included


def test_knn_matches_float_cosine_ranking(ray_session):
    df = _emb_df(n=70, seed=8)
    qids, Qm = _queries(df, 3)
    out = multi_query_topk(rd.from_pandas(df), qids, Qm, k=4)
    M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in qids:
        got = [nid for (q, nid, _) in out if q == qid]
        sims = Mn @ Mn[qid]
        sims[qid] = -np.inf  # self excluded
        want = np.argsort(-sims)[:4].tolist()
        assert got == want
        # neighbor sims within quantization error of true cosine
        got_sims = [s for (q, _, s) in out if q == qid]
        assert np.allclose(got_sims, np.sort(sims)[::-1][:4], atol=1e-4)


def test_knn_excludes_self_and_zero_norm_rows(ray_session):
    df = _emb_df(n=20, seed=1)
    df.at[7, "embedding"] = [0.0] * 6  # quantized norm 0 -> excluded
    qids, Qm = _queries(df, 2)
    out = multi_query_topk(rd.from_pandas(df), qids, Qm, k=19)
    for qid, nid, _ in out:
        assert nid != qid
        assert nid != 7
    assert len([r for r in out if r[0] == 0]) == 18  # 20 - self - zero row
