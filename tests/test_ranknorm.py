"""Percent-rank normalization (functions/ranknorm.py)."""

import numpy as np
import pandas as pd
import pytest
import ray

from great_expectations_ray.functions.ranknorm import percent_rank_transform


def _run(values, parts=4):
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(values)), "v": values})
    ).repartition(parts)
    return (percent_rank_transform(ds, "v")
            .to_pandas().sort_values("doc_id").reset_index(drop=True))


def test_percent_rank_matches_pandas():
    rng = np.random.default_rng(6)
    vals = rng.integers(0, 20, size=300).astype(np.float64)  # heavy ties
    out = _run(vals)
    # pandas rank(method='min') == SQL rank(); percent_rank = (rank-1)/(n-1)
    ref = (pd.Series(vals).rank(method="min") - 1) / (len(vals) - 1)
    assert np.allclose(out["pct_rank"], ref)
    assert (out["cnt_less"] == (pd.Series(vals).rank(method="min") - 1)).all()


def test_percent_rank_nulls_and_bounds():
    out = _run(pd.array([3.0, None, 1.0, 2.0, 3.0], dtype="Float64"), parts=2)
    # non-null universe n=4: ranks over {1, 2, 3, 3}
    assert out["pct_rank"].iloc[2] == 0.0                  # min value
    assert out["pct_rank"].iloc[0] == out["pct_rank"].iloc[4] == 2 / 3
    assert np.isnan(out["pct_rank"].iloc[1])
    assert out["cnt_less"].iloc[1] == -1


def test_percent_rank_distinct_guard():
    ds = ray.data.from_pandas(
        pd.DataFrame({"v": np.arange(100, dtype=np.float64)}))
    with pytest.raises(ValueError, match="distinct"):
        percent_rank_transform(ds, "v", max_distinct=10)


def test_percent_rank_all_null_column():
    """Regression: an all-null column returns unranked rows, not an
    IndexError inside the mark pass."""
    out = _run(pd.array([None, None, None], dtype="Float64"), parts=2)
    assert out["cnt_less"].tolist() == [-1, -1, -1]
    assert out["pct_rank"].isna().all()


def test_percent_rank_nan_values_unranked():
    """Regression: NaN (not null) rows are unranked, not clamped to the
    top value's rank."""
    out = _run(np.array([1.0, np.nan, 2.0, 2.0]), parts=2)
    assert out["cnt_less"].tolist() == [0, -1, 1, 1]
    assert np.isnan(out["pct_rank"].iloc[1])
