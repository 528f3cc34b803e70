"""Distributed logistic regression (stages/logreg.py): bit-reproducibility
under re-partitioning (per-row quantized gradients -> exact integer folds),
driver fast path == distributed path, and that full-batch GD actually
separates a separable corpus."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.logreg import (
    fit_logreg,
    score_logreg,
)


def _corpus(n: int = 120, seed: int = 3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        pos = bool(i % 2)
        toks = (["def", "import", "self", "return"] if pos
                else ["the", "and", "was", "of"])
        k = int(rng.integers(5, 30))
        rows.append({
            "doc_id": i,
            "text": " ".join(toks[int(j) % 4] for j in rng.integers(0, 4, k)),
            "y": pos,
        })
    return pd.DataFrame(rows)


def test_logreg_bitwise_stable_under_repartition(ray_session):
    df = _corpus()
    ds1 = rd.from_pandas(df)
    ds2 = rd.from_pandas(df).repartition(7)
    w1 = fit_logreg(ds1, y_col="y", iters=4, max_driver_rows=0)
    w2 = fit_logreg(ds2, y_col="y", iters=4, max_driver_rows=0)
    assert np.array_equal(w1, w2)  # bit-identical, not allclose

    s1 = score_logreg(ds1, w1).to_pandas().sort_values("doc_id")
    s2 = score_logreg(ds2, w2).to_pandas().sort_values("doc_id")
    assert s1["prob"].tolist() == s2["prob"].tolist()
    assert s1["pred"].tolist() == s2["pred"].tolist()


def test_logreg_driver_fast_path_matches_distributed(ray_session):
    df = _corpus(n=60)
    ds = rd.from_pandas(df).repartition(5)
    w_dist = fit_logreg(ds, y_col="y", iters=3, max_driver_rows=0)
    w_fast = fit_logreg(ds, y_col="y", iters=3, max_driver_rows=10_000)
    assert np.array_equal(w_dist, w_fast)


def test_logreg_learns_separable_corpus(ray_session):
    df = _corpus(n=200)
    ds = rd.from_pandas(df)
    w = fit_logreg(ds, y_col="y", iters=12, lr=4.0)
    scored = score_logreg(ds, w).to_pandas()
    acc = (scored["pred"] == df.sort_values("doc_id")["y"].astype(int)
           .to_numpy()).mean()
    assert acc > 0.9
    # probabilities separate by class
    pos = scored.loc[df["y"].to_numpy(), "prob"].mean()
    neg = scored.loc[~df["y"].to_numpy(), "prob"].mean()
    assert pos > neg + 0.1


def test_logreg_empty_and_null_text(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": ["def import", None, ""],
                       "y": [True, False, False]})
    ds = rd.from_pandas(df)
    w = fit_logreg(ds, y_col="y", iters=2)
    scored = score_logreg(ds, w).to_pandas().sort_values("doc_id")
    assert len(scored) == 3
    assert scored["prob"].between(0, 1).all()
    # null/empty text -> zero features -> identical bias-only probability
    assert scored["prob"].iloc[1] == scored["prob"].iloc[2]
