"""Distributed exact quantiles (rank-selection) + HLL approximate distinct."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from great_expectations_ray.functions.quantiles import exact_quantiles_distributed
from great_expectations_ray.functions.sketches import HyperLogLog, approx_distinct


@pytest.fixture(scope="module")
def highcard_ds():
    import ray.data as rd

    rng = np.random.default_rng(11)
    vals = rng.normal(100.0, 25.0, 50_000)  # ~all distinct floats
    return rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(8), vals


def test_exact_quantiles_distributed(highcard_ds):
    ds, vals = highcard_ds
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    got = exact_quantiles_distributed(ds, "x", qs, interpolation="lower")
    sv = np.sort(vals)
    exp = [sv[int(np.floor(q * (len(sv) - 1)))] for q in qs]
    assert got == pytest.approx(exp, abs=0)  # EXACT data values


def test_exact_quantiles_edges():
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": pa.array([5.0, 1.0, 3.0], pa.float64())}))
    got = exact_quantiles_distributed(ds, "x", [0.0, 0.5, 1.0], interpolation="lower")
    assert got == [1.0, 3.0, 5.0]
    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    assert exact_quantiles_distributed(empty, "x", [0.5]) == [None]


def test_hll_accuracy_ints():
    h = HyperLogLog()
    h.update_column(pa.array(np.arange(100_000, dtype=np.int64)))
    est = h.estimate()
    assert abs(est - 100_000) / 100_000 < 0.05


def test_hll_merge_equivalence():
    a, b, c = HyperLogLog(), HyperLogLog(), HyperLogLog()
    x = np.arange(0, 60_000, dtype=np.int64)
    y = np.arange(40_000, 100_000, dtype=np.int64)  # overlap 40k-60k
    a.update_column(pa.array(x))
    b.update_column(pa.array(y))
    c.update_column(pa.array(np.arange(100_000, dtype=np.int64)))
    merged = a.merge(b)
    assert abs(merged.estimate() - c.estimate()) < 1e-9  # register-identical


def test_hll_strings_and_small_range():
    h = HyperLogLog()
    h.update_column(pa.array([f"v{i}" for i in range(500)], pa.string()))
    assert abs(h.estimate() - 500) / 500 < 0.05  # linear-counting regime


def test_approx_distinct_dataset(highcard_ds):
    ds, vals = highcard_ds
    est = approx_distinct(ds, "x")
    true = len(np.unique(vals))
    assert abs(est - true) / true < 0.05


def test_engine_approximate_unique_count(fixture_ds):
    from great_expectations_ray import ExpectationSuite, validate

    suite = ExpectationSuite("a").add(
        "expect_column_unique_value_count_to_be_between",
        column="dup_key", min_value=1, approximate=True,
    )
    r = validate(fixture_ds, suite).results[0]
    assert abs(r.result["observed_value"] - 40) <= 3  # 40 true distinct


def test_engine_overflow_routes_to_distributed():
    import ray.data as rd

    from great_expectations_ray import ExpectationSuite, validate

    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 1e6, 120_000)  # > VC cap of 100k distinct
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})).repartition(4)
    suite = (
        ExpectationSuite("q")
        .add("expect_column_quantile_values_to_be_between", column="x",
             quantile_ranges={"quantiles": [0.25, 0.75],
                              "value_ranges": [[None, None]] * 2},
             interpolation="lower")
        .add("expect_column_median_to_be_between", column="x", min_value=0)
    )
    res = validate(ds, suite)
    sv = np.sort(vals)
    exp = [sv[int(np.floor(q * (len(sv) - 1)))] for q in (0.25, 0.75)]
    got = res.results[0].result["observed_value"]["values"]
    assert got == pytest.approx(exp, abs=0)
    exp_med = (sv[(len(sv) - 1) // 2] + sv[len(sv) // 2]) / 2
    assert res.results[1].result["observed_value"] == pytest.approx(exp_med, rel=1e-12)


def test_sampled_quantiles_rank_error(highcard_ds):
    from great_expectations_ray.functions.quantiles import sampled_quantiles

    ds, vals = highcard_ds
    qs = [0.1, 0.5, 0.9]
    approx = sampled_quantiles(ds, "x", qs, relative_error=0.01)
    sv = np.sort(vals)
    for q, a in zip(qs, approx):
        rank = np.searchsorted(sv, a) / (len(sv) - 1)
        assert abs(rank - q) <= 0.03, (q, rank)


def test_engine_allow_relative_error(highcard_ds):
    from great_expectations_ray import ExpectationSuite, validate

    ds, vals = highcard_ds
    suite = ExpectationSuite("aq").add(
        "expect_column_quantile_values_to_be_between", column="x",
        quantile_ranges={"quantiles": [0.5], "value_ranges": [[None, None]]},
        allow_relative_error=0.02, interpolation="lower",
    )
    r = validate(ds, suite).results[0]
    assert r.result["details"]["approximate"] is True
    got = r.result["observed_value"]["values"][0]
    sv = np.sort(vals)
    rank = np.searchsorted(sv, got) / (len(sv) - 1)
    assert abs(rank - 0.5) <= 0.05


def test_engine_allow_relative_error_kll(highcard_ds):
    from great_expectations_ray import ExpectationSuite, validate

    ds, vals = highcard_ds
    suite = ExpectationSuite("kq").add(
        "expect_column_quantile_values_to_be_between", column="x",
        quantile_ranges={"quantiles": [0.1, 0.5, 0.9],
                         "value_ranges": [[None, None]] * 3},
        allow_relative_error="kll", interpolation="lower",
    )
    r = validate(ds, suite).results[0]
    assert r.result["details"]["approximate"] is True
    sv = np.sort(vals)
    for q, got in zip([0.1, 0.5, 0.9], r.result["observed_value"]["values"]):
        rank = np.searchsorted(sv, got) / (len(sv) - 1)
        assert abs(rank - q) <= 0.03, (q, rank)


def test_rank_select_histogram_hard_cases():
    """Histogram-refined rank selection stays EXACT on adversarial
    distributions: duplicate-heavy, constant runs, extreme dynamic range,
    negatives, and mixed-sign tiny/huge magnitudes."""
    import ray.data as rd

    from great_expectations_ray.functions.quantiles import rank_select_values

    rng = np.random.default_rng(7)
    cases = [
        rng.choice([1.0, 1.0 + 1e-12, 2.0, 1e9], size=20_000),  # dup-heavy
        np.full(5_000, 42.5),                                   # constant
        np.concatenate([rng.normal(-1e15, 1e12, 3_000),
                        rng.uniform(-1e-9, 1e-9, 3_000),
                        rng.normal(1e15, 1e12, 3_000)]),        # wide range
        np.arange(-500.0, 500.0),                               # integral grid
    ]
    for vals in cases:
        sv = np.sort(vals)
        targets = np.array([0, len(sv) // 4, len(sv) // 2,
                            len(sv) - 2, len(sv) - 1], dtype=np.int64)
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})
                           ).repartition(5)
        got = rank_select_values(ds, "x", targets)
        assert got == [float(sv[t]) for t in targets], vals[:4]


def test_rank_select_integral_and_bounds():
    import ray.data as rd

    from great_expectations_ray.functions.quantiles import rank_select_values

    vals = np.repeat(np.arange(1000, dtype=np.float64), 20)
    sv = np.sort(vals)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(4)
    targets = np.array([0, 9999, 19999], dtype=np.int64)
    got = rank_select_values(ds, "x", targets, integral=True,
                             bounds=(0.0, 999.0))
    assert got == [float(sv[t]) for t in targets]


def test_rank_select_matches_duckdb_lineitem():
    """Gate-adjacent: exact engine quantiles == DuckDB quantile_disc on the
    real sf0.001 lineitem price column (2-decimal money values)."""
    import duckdb
    import ray.data as rd

    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    ds = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_extendedprice"])
    got = exact_quantiles_distributed(ds, "l_extendedprice", qs,
                                      interpolation="lower")
    exp = duckdb.connect().execute(
        "SELECT quantile_disc(l_extendedprice, $1) "
        "FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')",
        [qs]).fetchone()[0]
    assert got == [float(v) for v in exp]


def test_rank_select_float_geometry_pathologies():
    """Key-space refinement handles what float grids cannot: NaN payloads
    (excluded from ranks), full-double-range sentinels (lo+(hi-lo)*f
    overflows to inf), subnormal-scale values (a linear grid stalls for ~90
    rounds above them), and massive ties."""
    import ray.data as rd

    from great_expectations_ray.functions.quantiles import rank_select_values

    # NaN excluded: ranks over the 9 real values only
    ds = rd.from_arrow(pa.table({"x": pa.array(
        [float(i) for i in range(1, 10)] + [float("nan")], pa.float64())}))
    assert exact_quantiles_distributed(ds, "x", [0.5, 0.9]) == [5.0, 8.0]

    # +-1.6e308 sentinels: every rank exact
    vals = [-1.6e308, -1.0, 0.0, 1.0, 1.6e308]
    ds2 = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})
                        ).repartition(2)
    assert rank_select_values(ds2, "x", np.array(range(5))) == vals

    # subnormal cluster under a normal outlier
    dv = np.array([5e-324, 1e-323, 1.5e-323, 2e-323] * 2000 + [1.0])
    sv = np.sort(dv)
    ds3 = rd.from_arrow(pa.table({"x": pa.array(dv)})).repartition(3)
    got = rank_select_values(ds3, "x", np.array([0, 4000, 8000]))
    assert got == [float(sv[0]), float(sv[4000]), float(sv[8000])]

    # massive tie: interval never drops under the collect cap; snap exact
    tv = np.array([3.5] * 100000 + [1.0, 9.0])
    ds4 = rd.from_arrow(pa.table({"x": pa.array(tv)})).repartition(4)
    assert rank_select_values(ds4, "x", np.array([0, 50000, 100001])) \
        == [1.0, 3.5, 9.0]


def test_rank_select_signed_zero():
    """Data containing -0.0 (canonicalized to +0.0 at the sort) and
    key-space interval bounds landing on -0.0 both resolve exactly."""
    import ray.data as rd

    from great_expectations_ray.functions.quantiles import rank_select_values

    vals = [-1.0, -0.0, 0.0, -0.0, 1.0, 2.0]
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())})
                       ).repartition(2)
    got = rank_select_values(ds, "x", np.array(range(6)))
    assert got == [-1.0, 0.0, 0.0, 0.0, 1.0, 2.0]
    # bounds pinned at 0.0 (the failing init: key(0.0)-1 == key(-0.0))
    reps = rd.from_arrow(pa.table({"x": pa.array(
        np.repeat(np.arange(1000, dtype=np.float64), 2))}))
    got = rank_select_values(reps, "x", np.array([0, 1999]), integral=True,
                             bounds=(0.0, 999.0))
    assert got == [0.0, 999.0]
