"""Theta (KMV) distinct sketch with set operations (functions/sketches.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from great_expectations_ray.functions.sketches import ThetaSketch, theta_sketch_of


def _int_ds(values, blocks=4):
    return ray.data.from_arrow(
        pa.table({"v": pa.array(values, pa.int64())})
    ).repartition(blocks)


def test_exact_below_k():
    sk = ThetaSketch(k=256)
    sk.update_column(pa.array(list(range(100)) * 3, pa.int64()))
    assert sk.estimate() == 100.0


def test_estimate_error_ints_and_strings():
    n = 200_000
    sk = ThetaSketch(k=4096)
    sk.update_column(pa.array(np.arange(n), pa.int64()))
    assert abs(sk.estimate() - n) / n <= 0.05
    sks = ThetaSketch(k=4096)
    sks.update_column(pa.array([f"url_{i}" for i in range(30_000)], pa.string()))
    assert abs(sks.estimate() - 30_000) / 30_000 <= 0.05


def test_partitioning_invariant_bit_exact():
    vals = np.random.default_rng(3).integers(0, 10**12, 150_000)
    one = ThetaSketch(k=1024)
    one.update_hashes(vals.astype(np.uint64))
    merged = ThetaSketch(k=1024)
    for part in np.array_split(vals, 7):
        p = ThetaSketch(k=1024)
        p.update_hashes(part.astype(np.uint64))
        merged.merge(ThetaSketch.from_row(p.to_row()))   # serialize across
    assert merged.theta == one.theta
    assert np.array_equal(merged.hashes, one.hashes)
    assert merged.estimate() == one.estimate()


def test_set_operations():
    # A = [0, 120k), B = [60k, 200k): |A∩B| = 60k, |A\B| = 60k, |A∪B| = 200k
    a = ThetaSketch(k=4096)
    a.update_column(pa.array(np.arange(0, 120_000), pa.int64()))
    b = ThetaSketch(k=4096)
    b.update_column(pa.array(np.arange(60_000, 200_000), pa.int64()))
    assert abs(a.intersect_estimate(b) - 60_000) / 60_000 <= 0.08
    assert abs(a.difference_estimate(b) - 60_000) / 60_000 <= 0.08
    assert abs(a.union_estimate(b) - 200_000) / 200_000 <= 0.05
    # union must not mutate its operands
    assert abs(a.estimate() - 120_000) / 120_000 <= 0.05


def test_day2_new_keys_via_difference():
    # yesterday's snapshot sketch persists as one row; today re-crawls 80%
    # and adds 10k new keys -> difference estimates the new-key count
    yesterday = ThetaSketch(k=4096)
    yesterday.update_column(pa.array(np.arange(100_000), pa.int64()))
    row = yesterday.to_row()
    today = ThetaSketch(k=4096)
    today.update_column(
        pa.array(np.concatenate([np.arange(80_000), np.arange(100_000, 110_000)]),
                 pa.int64()))
    new = today.difference_estimate(ThetaSketch.from_row(row))
    assert abs(new - 10_000) / 10_000 <= 0.25   # small-set estimate, wider bar


def test_theta_sketch_of_ray():
    n = 120_000
    vals = list(np.arange(n)) + [None] * 500 + list(np.arange(n // 2))  # dups+nulls
    sk = theta_sketch_of(_int_ds(vals, blocks=8), "v", k=4096)
    assert abs(sk.estimate() - n) / n <= 0.05
    # one-pass Ray build == local build, bit-for-bit
    local = ThetaSketch(k=4096)
    local.update_column(pa.array(vals, pa.int64()))
    assert sk.theta == local.theta and np.array_equal(sk.hashes, local.hashes)


def test_empty_and_validation():
    sk = theta_sketch_of(_int_ds([None, None], blocks=1), "v")
    assert sk.estimate() == 0.0
    with pytest.raises(ValueError):
        ThetaSketch(k=2)


def test_engine_approximate_theta_knob():
    from great_expectations_ray import ExpectationSuite, validate

    ds = _int_ds(list(np.arange(50_000)), blocks=6)
    suite = ExpectationSuite("t").add(
        "expect_column_unique_value_count_to_be_between", column="v",
        min_value=47_000, max_value=53_000, approximate="theta",
    )
    res = validate(ds, suite)
    assert res.success
    obs = res.results[0].result["observed_value"]
    assert abs(obs - 50_000) / 50_000 <= 0.05


def test_grouped_theta_distinct_exact_under_k(ray_session):
    """Groups with < k distinct values get EXACT counts; null key grouped."""
    import pandas as pd
    import ray.data as rd

    from great_expectations_ray.functions.sketches import (
        grouped_theta_distinct,
    )

    rng = np.random.default_rng(5)
    grp = rng.choice(["a", "b", "c"], size=3000).astype(object)
    grp[::97] = None
    df = pd.DataFrame({
        "grp": grp,
        "v": [f"{g}-{i % (100 if g == 'a' else 500)}"
              for i, g in enumerate(grp)],
    })
    out = (grouped_theta_distinct(rd.from_pandas(df).repartition(5),
                                  ["grp"], "v", k=4096)
           .to_pandas())
    exp = (df.groupby("grp", dropna=False)["v"].nunique())
    assert len(out) == 4
    for _, row in out.iterrows():
        key = row["grp"]
        want = exp[exp.index.isna()].iloc[0] if pd.isna(key) else exp[key]
        assert row["distinct_est"] == float(want), key


def test_grouped_theta_distinct_partitioning_invariant_and_approx(ray_session):
    """Past k distinct, estimates stay within ~5% and are IDENTICAL across
    block layouts (the sketch is partitioning-invariant bit-for-bit)."""
    import pandas as pd
    import ray.data as rd

    from great_expectations_ray.functions.sketches import (
        grouped_theta_distinct,
    )

    rng = np.random.default_rng(9)
    n = 60_000
    df = pd.DataFrame({
        "grp": rng.choice(["x", "y"], size=n),
        "v": rng.integers(0, 20_000, size=n),
    })

    def run(parts):
        return (grouped_theta_distinct(
                    rd.from_pandas(df.sample(frac=1, random_state=parts))
                    .repartition(parts), ["grp"], "v", k=1024)
                .to_pandas().sort_values("grp").reset_index(drop=True))

    a, b = run(2), run(9)
    assert a.equals(b)
    exp = df.groupby("grp")["v"].nunique()
    for _, row in a.iterrows():
        assert abs(row["distinct_est"] - exp[row["grp"]]) / exp[row["grp"]] \
            <= 0.05
