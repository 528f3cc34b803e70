"""Exact top-fraction selection (stages/topfrac.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from great_expectations_ray.stages.topfrac import select_top_fraction


def _expected(df: pd.DataFrame, N: int) -> set:
    order = df.sort_values(["score", "doc_id"],
                           ascending=[False, True], kind="mergesort")
    return set(order["doc_id"].head(N))


def _run(df: pd.DataFrame, parts: int, **kw) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(parts)
    out = select_top_fraction(ds, score_col="score", id_col="doc_id", **kw)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_top_fraction_exact_count_and_membership():
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"doc_id": np.arange(200),
                       "score": rng.normal(size=200)})
    out = _run(df, 7, frac=0.25)
    N = int(np.ceil(0.25 * 200))
    assert out["selected"].sum() == N
    assert set(out.loc[out["selected"], "doc_id"]) == _expected(df, N)


def test_top_fraction_boundary_ties_lowest_id_wins():
    # 10 rows share the boundary score; only the lowest ids among them win
    df = pd.DataFrame({
        "doc_id": np.arange(20),
        "score": [5.0] * 4 + [3.0] * 10 + [1.0] * 6,
    })
    out = _run(df, 5, top_n=9)  # 4 fives + 5 of the 3.0 ties
    sel = set(out.loc[out["selected"], "doc_id"])
    assert sel == set(range(4)) | set(range(4, 9))


def test_top_fraction_fast_and_distributed_paths_identical():
    rng = np.random.default_rng(11)
    # quantized scores force heavy boundary ties
    df = pd.DataFrame({"doc_id": np.arange(300),
                       "score": np.round(rng.uniform(size=300), 1)})
    fast = _run(df, 4, frac=0.3)
    dist = _run(df, 9, frac=0.3, max_driver_rows=0)
    assert fast.equals(dist)
    assert fast["selected"].sum() == int(np.ceil(0.3 * 300))


@pytest.mark.parametrize("frac,expect", [(0.0, 0), (1.0, 50)])
def test_top_fraction_degenerate_fracs(frac, expect):
    df = pd.DataFrame({"doc_id": np.arange(50), "score": np.arange(50.0)})
    out = _run(df, 3, frac=frac)
    assert out["selected"].sum() == expect


def test_top_fraction_arg_validation():
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1], "score": [1.0]}))
    with pytest.raises(ValueError):
        select_top_fraction(ds, score_col="score", id_col="doc_id")
    with pytest.raises(ValueError):
        select_top_fraction(ds, score_col="score", id_col="doc_id",
                            frac=0.5, top_n=3)


def test_top_fraction_decimal_exact_ceil():
    """Regression: frac=0.07 over 100 rows keeps exactly 7 (DECIMAL
    semantics), despite double(0.07)*100 ceiling to 8."""
    df = pd.DataFrame({"doc_id": np.arange(100),
                       "score": np.arange(100, dtype=np.float64)})
    out = _run(df, 4, frac=0.07)
    assert out["selected"].sum() == 7
