"""Per-group selection quotas (stages/quota.py)."""

import numpy as np
import pandas as pd
import ray

from great_expectations_ray.stages.quota import (
    select_top_fraction_grouped,
    token_budget_cutoff,
)


def _expected_grouped(df, frac):
    keep = set()
    for g, grp in df.groupby("grp"):
        n = int(np.ceil(frac * len(grp)))
        order = grp.sort_values(["score", "doc_id"],
                                ascending=[False, True], kind="mergesort")
        keep |= set(order["doc_id"].head(n))
    return keep


def test_grouped_top_fraction_quota_exact():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "doc_id": np.arange(120),
        "grp": [f"g{i % 3}" for i in range(120)],
        "score": np.round(rng.uniform(size=120), 1),  # heavy ties
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = (select_top_fraction_grouped(
        ds, score_col="score", id_col="doc_id", group_col="grp", frac=0.3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True))
    sel = set(out.loc[out["selected"], "doc_id"])
    assert sel == _expected_grouped(df, 0.3)
    for _, grp in out.groupby("grp"):
        assert grp["selected"].sum() == int(np.ceil(0.3 * len(grp)))


def test_grouped_top_fraction_partition_invariance():
    df = pd.DataFrame({
        "doc_id": np.arange(60),
        "grp": [f"g{i % 4}" for i in range(60)],
        "score": (np.arange(60) * 7 % 10).astype(float),
    })
    runs = []
    for parts in (1, 5):
        ds = ray.data.from_pandas(df).repartition(parts)
        runs.append(select_top_fraction_grouped(
            ds, score_col="score", id_col="doc_id", group_col="grp",
            frac=0.5).to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert runs[0].equals(runs[1])


def test_token_budget_cutoff_running_sum():
    df = pd.DataFrame({
        "doc_id": np.arange(10),
        "src": ["a"] * 5 + ["b"] * 5,
        "tok": [3, 4, 5, 1, 10, 8, 8, 8, 8, 8],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    out = (token_budget_cutoff(ds, token_col="tok", id_col="doc_id",
                               group_col="src", budget=12)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # a: cum 3,7,12,13,... -> first three kept (12 <= 12), then cut
    # b: cum 8,16,... -> only the first kept
    assert out["selected"].tolist() == [True, True, True, False, False,
                                        True, False, False, False, False]


def test_token_budget_cutoff_partition_invariance():
    df = pd.DataFrame({
        "doc_id": np.arange(80),
        "src": [f"s{i % 3}" for i in range(80)],
        "tok": (np.arange(80) % 7 + 1),
    })
    runs = []
    for parts in (1, 8):
        ds = ray.data.from_pandas(df).repartition(parts)
        runs.append(token_budget_cutoff(
            ds, token_col="tok", id_col="doc_id", group_col="src",
            budget=40).to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert runs[0].equals(runs[1])
    assert 0 < runs[0]["selected"].sum() < 80


def test_grouped_quota_decimal_exact_ceil():
    """Regression: frac=0.07 on a 100-row group keeps 7, not 8 (double
    0.07*100 = 7.000000000000001 would ceil to 8)."""
    df = pd.DataFrame({
        "doc_id": np.arange(100),
        "grp": ["g"] * 100,
        "score": np.arange(100, dtype=np.float64),
    })
    ds = ray.data.from_pandas(df).repartition(4)
    out = (select_top_fraction_grouped(
        ds, score_col="score", id_col="doc_id", group_col="grp", frac=0.07)
        .to_pandas())
    assert out["selected"].sum() == 7
