from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.heavyhitters import heavy_hitters


def _docs_ds(texts, parallelism=4):
    return rd.from_arrow(pa.table({"text": pa.array(texts, pa.string())})).repartition(
        parallelism
    )


def test_word_topk_exact_counts_and_tiebreak():
    # b and c tie at 6 -> tie broken by value ASC; a wins at 9
    texts = ["a a a b b c", "a a a b b c c", "a a a b b c c c", None, "   "]
    df = heavy_hitters(_docs_ds(texts), col="text", k=3, mode="words")
    assert list(df["value"]) == ["a", "b", "c"]
    assert list(df["cnt"]) == [9, 6, 6]
    assert df.attrs["guaranteed"]


def test_matches_exact_groupby_on_random_corpus():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    probs = rng.dirichlet(np.ones(40) * 0.3)
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 30), p=probs))
        for _ in range(300)
    ]
    expected = (
        pd.Series(" ".join(texts).split())
        .value_counts()
        .rename_axis("value")
        .reset_index(name="cnt")
        .sort_values(["cnt", "value"], ascending=[False, True], kind="stable")
        .head(8)
        .reset_index(drop=True)
    )
    df = heavy_hitters(_docs_ds(texts, parallelism=6), col="text", k=8)
    pd.testing.assert_frame_equal(df, expected.astype({"cnt": "int64"}))
    assert df.attrs["guaranteed"]


def test_values_mode_with_nulls():
    vals = ["x"] * 5 + ["y"] * 3 + ["z"] * 2 + [None] * 4
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})).repartition(3)
    df = heavy_hitters(ds, col="v", k=2, mode="values")
    assert list(df["value"]) == ["x", "y"]
    assert list(df["cnt"]) == [5, 3]


def test_small_capacity_flags_unguaranteed():
    # near-uniform distribution + capacity 1: the k-th count cannot clear
    # N/(capacity+1), so the result must NOT claim the exactness guarantee
    texts = [" ".join(f"u{i}" for i in range(50))] * 2
    df = heavy_hitters(_docs_ds(texts, parallelism=2), col="text", k=5, capacity=1)
    assert not df.attrs["guaranteed"]


def test_empty_and_all_null_input():
    ds = rd.from_arrow(pa.table({"text": pa.array([None, None], pa.string())}))
    df = heavy_hitters(ds, col="text", k=3)
    assert len(df) == 0
    assert df.attrs["guaranteed"]
