"""KLL mergeable quantile sketch (functions/kll.py) — error bounds,
merge semantics, determinism, and the one-pass Ray path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from great_expectations_ray.functions.kll import KLLSketch, kll_quantiles

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _rank_error(vals: np.ndarray, qs, ests) -> float:
    sv = np.sort(vals)
    n = len(sv)
    worst = 0.0
    for q, e in zip(qs, ests):
        # a duplicated value covers a RANK INTERVAL [lo, hi]; the error is the
        # distance from the target rank to that interval
        lo = np.searchsorted(sv, e, side="left")
        hi = np.searchsorted(sv, e, side="right") - 1
        t = q * (n - 1)
        worst = max(worst, max(0.0, lo - t, t - hi) / n)
    return worst


def test_kll_error_bound_uniform():
    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 1000, 60_000)
    sk = KLLSketch(k=200, seed=1)
    sk.update_many(vals)
    assert sk.n == len(vals)
    ests = sk.quantiles(QS)
    assert _rank_error(vals, QS, ests) <= 0.02
    # stored size is tiny relative to the stream
    assert sum(len(a) for a in sk.levels) < 3_000


def test_kll_error_bound_skewed_and_duplicates():
    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.lognormal(0, 2, 30_000),
        np.full(20_000, 42.0),          # heavy duplicate mass
        rng.integers(0, 5, 10_000).astype(float),
    ])
    sk = KLLSketch(k=200, seed=3)
    sk.update_many(vals)
    assert _rank_error(vals, QS, sk.quantiles(QS)) <= 0.02


def test_kll_merge_matches_single_sketch_bound():
    rng = np.random.default_rng(5)
    vals = rng.normal(0, 10, 50_000)
    parts = np.array_split(vals, 13)
    merged = KLLSketch(k=200, seed=9)
    for i, p in enumerate(parts):
        sk = KLLSketch(k=200, seed=100 + i)
        sk.update_many(p)
        row = sk.to_row()                      # serialize across the merge
        merged.merge(KLLSketch.from_row(row))
    assert merged.n == len(vals)
    assert _rank_error(vals, QS, merged.quantiles(QS)) <= 0.02


def test_kll_determinism_and_exact_small():
    vals = np.arange(100, dtype=float)
    a = KLLSketch(k=200, seed=4)
    a.update_many(vals)
    b = KLLSketch(k=200, seed=4)
    b.update_many(vals)
    assert a.quantiles(QS) == b.quantiles(QS)
    # n < k: nothing ever compacts -> exact answers at the engine convention
    ests = a.quantiles([0.0, 0.5, 1.0], interpolation="lower")
    assert ests == [0.0, 49.0, 99.0]


def test_kll_interpolation_and_rank():
    vals = np.arange(1000, dtype=float)
    sk = KLLSketch(k=1024, seed=2)   # no compaction: exact
    sk.update_many(vals)
    # q*(n-1) = 998.5005 -> floor 998 / ceil 999
    assert sk.quantiles([0.9995], interpolation="lower") == [998.0]
    assert sk.quantiles([0.9995], interpolation="higher") == [999.0]
    assert sk.rank(499.0) == 500


def test_kll_empty_and_nan():
    sk = KLLSketch(k=64, seed=0)
    sk.update_many(np.array([]))
    assert sk.quantiles([0.5]) == [None]
    sk.update_many(np.array([np.nan, 1.0, np.nan, 3.0]))
    assert sk.n == 2
    assert sk.quantiles([0.0, 1.0]) == [1.0, 3.0]


def test_kll_quantiles_ray_one_pass():
    rng = np.random.default_rng(21)
    vals = rng.uniform(-50, 50, 40_000)
    with_nulls = list(vals[:20_000]) + [None] * 500 + list(vals[20_000:])
    ds = ray.data.from_arrow(pa.table({"v": pa.array(with_nulls, pa.float64())}))
    ds = ds.repartition(8)
    ests = kll_quantiles(ds, "v", QS, k=200, seed=17)
    assert _rank_error(vals, QS, ests) <= 0.02
    # deterministic for a fixed input + block layout
    assert ests == kll_quantiles(ds, "v", QS, k=200, seed=17)


def test_kll_quantiles_ray_empty():
    ds = ray.data.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    assert kll_quantiles(ds, "v", [0.5]) == [None]
    ds2 = ray.data.from_arrow(pa.table({"v": pa.array([None, None], pa.float64())}))
    assert kll_quantiles(ds2, "v", [0.25, 0.75]) == [None, None]


def test_kll_k_validation():
    with pytest.raises(ValueError):
        KLLSketch(k=4)


def test_grouped_kll_quantiles():
    import pandas as pd
    from great_expectations_ray.functions.kll import grouped_kll_quantiles

    rng = np.random.default_rng(31)
    langs = ["en", "de", "fr", None]
    n = 40_000
    lang = rng.choice(4, n)
    vals = rng.normal(loc=lang * 100.0, scale=10.0, size=n)
    vals[:50] = np.nan                       # null values inside groups
    tbl = pa.table({
        "lang": pa.array([langs[i] for i in lang], pa.string()),
        "v": pa.array(vals, pa.float64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = grouped_kll_quantiles(ds, ["lang"], "v", [0.25, 0.5, 0.75], k=200)
    df = out.to_pandas().sort_values("lang", na_position="last").reset_index(drop=True)
    assert set(df.columns) == {"lang", "p25", "p50", "p75"}
    assert len(df) == 4
    ref = pd.DataFrame({"lang": [langs[i] for i in lang], "v": vals})
    for _, row in df.iterrows():
        g = ref[ref["lang"].isna() if pd.isna(row["lang"]) else (ref["lang"] == row["lang"])]
        gv = np.sort(g["v"].dropna().to_numpy())
        for q, name in zip([0.25, 0.5, 0.75], ["p25", "p50", "p75"]):
            lo = np.searchsorted(gv, row[name], side="left")
            hi = np.searchsorted(gv, row[name], side="right") - 1
            t = q * (len(gv) - 1)
            assert max(0.0, lo - t, t - hi) / len(gv) <= 0.02, (row["lang"], q)


def test_grouped_kll_all_null_group():
    from great_expectations_ray.functions.kll import grouped_kll_quantiles

    tbl = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 5, pa.string()),
        "v": pa.array([1.0, 2, 3, 4, 5] + [None] * 5, pa.float64()),
    })
    ds = ray.data.from_arrow(tbl)
    df = grouped_kll_quantiles(ds, ["g"], "v", [0.5]).to_pandas().sort_values("g")
    assert df["p50"].tolist()[0] == 3.0
    assert df["p50"].isna().tolist() == [False, True]
