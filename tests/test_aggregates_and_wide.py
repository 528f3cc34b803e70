"""Aggregate / distinct / uniqueness / quantile expectations vs pandas oracle."""

from __future__ import annotations

import numpy as np
import pytest

from great_expectations_ray import ExpectationSuite, validate


def _run_one(ds, etype, **kwargs):
    suite = ExpectationSuite("t").add(etype, **kwargs)
    res = validate(ds, suite)
    return res.results[0]


def test_mean_sum_min_max_std(fixture_ds, fixture_table):
    s = fixture_table.column("n_float").to_pandas()
    r = _run_one(fixture_ds, "expect_column_mean_to_be_between",
                 column="n_float", min_value=0, max_value=100)
    assert r.success
    assert r.result["observed_value"] == pytest.approx(s.mean(), rel=1e-12)

    r = _run_one(fixture_ds, "expect_column_stdev_to_be_between",
                 column="n_float", min_value=0.1)
    assert r.result["observed_value"] == pytest.approx(s.std(ddof=1), rel=1e-12)

    r = _run_one(fixture_ds, "expect_column_sum_to_be_between",
                 column="n_float", min_value=s.sum() - 1, max_value=s.sum() + 1)
    assert r.success

    r = _run_one(fixture_ds, "expect_column_min_to_be_between",
                 column="n_float", min_value=s.min(), max_value=s.min())
    assert r.success
    r = _run_one(fixture_ds, "expect_column_max_to_be_between",
                 column="n_float", max_value=s.max(), strict_max=False)
    assert r.success


def test_strict_bounds_and_none_metric(fixture_ds):
    # strict_min means > : equal bound must fail
    r = _run_one(fixture_ds, "expect_column_mean_to_be_between",
                 column="s_allnull", min_value=0)
    assert not r.success  # None metric -> failure (expectation.py:1596)


def test_nonnull_denominator_ints(fixture_ds, fixture_table):
    s = fixture_table.column("n_int").to_pandas()
    r = _run_one(fixture_ds, "expect_column_mean_to_be_between",
                 column="n_int", min_value=-1e9)
    assert r.result["observed_value"] == pytest.approx(s.mean(), rel=1e-12)


def test_z_score_two_phase(fixture_ds, fixture_table):
    s = fixture_table.column("n_float").to_pandas()
    z = ((s - s.mean()) / s.std(ddof=1)).abs()
    expected_unexpected = int((z >= 1.5).sum())
    r = _run_one(fixture_ds, "expect_column_value_z_scores_to_be_less_than",
                 column="n_float", threshold=1.5, double_sided=True)
    assert r.result["unexpected_count"] == expected_unexpected


def test_distinct_sets(fixture_ds):
    r = _run_one(fixture_ds, "expect_column_distinct_values_to_be_in_set",
                 column="s_mixed", value_set=["match", "NOPE"])
    assert r.success
    assert r.result["observed_value"] == ["NOPE", "match"]
    r = _run_one(fixture_ds, "expect_column_distinct_values_to_contain_set",
                 column="s_mixed", value_set=["match", "missing-one"])
    assert not r.success
    r = _run_one(fixture_ds, "expect_column_distinct_values_to_equal_set",
                 column="s_mixed", value_set=["match", "NOPE"])
    assert r.success


def test_unique_value_count_and_proportion(fixture_ds, fixture_table):
    s = fixture_table.column("dup_key").to_pandas()
    r = _run_one(fixture_ds, "expect_column_unique_value_count_to_be_between",
                 column="dup_key", min_value=1)
    assert r.result["observed_value"] == s.nunique()
    r = _run_one(fixture_ds, "expect_column_proportion_of_unique_values_to_be_between",
                 column="dup_key", min_value=0)
    assert r.result["observed_value"] == pytest.approx(s.nunique() / s.notna().sum())


def test_most_common_value(fixture_ds, fixture_table):
    s = fixture_table.column("s_mixed").to_pandas()
    mode = s.mode().tolist()
    r = _run_one(fixture_ds, "expect_column_most_common_value_to_be_in_set",
                 column="s_mixed", value_set=mode)
    assert r.success
    assert r.result["observed_value"] == mode


def test_column_values_unique(fixture_ds, fixture_table):
    s = fixture_table.column("dup_key").to_pandas()
    expected = int(s.duplicated(keep=False).sum())
    r = _run_one(fixture_ds, "expect_column_values_to_be_unique", column="dup_key")
    assert r.result["unexpected_count"] == expected
    assert not r.success


def test_compound_columns_unique(fixture_ds, fixture_table):
    df = fixture_table.to_pandas()
    expected = int(df.duplicated(subset=["mc_1", "mc_2", "mc_3"], keep=False).sum())
    r = _run_one(fixture_ds, "expect_compound_columns_to_be_unique",
                 column_list=["mc_1", "mc_2", "mc_3"])
    assert r.result["unexpected_count"] == expected


def test_median_and_quantiles(fixture_ds, fixture_table):
    s = fixture_table.column("n_float").to_pandas()
    r = _run_one(fixture_ds, "expect_column_median_to_be_between",
                 column="n_float", min_value=-1e9)
    assert r.result["observed_value"] == pytest.approx(s.median(), rel=1e-12)

    qs = [0.05, 0.25, 0.5, 0.75, 0.95]
    expected = [s.quantile(q, interpolation="nearest") for q in qs]
    r = _run_one(fixture_ds, "expect_column_quantile_values_to_be_between",
                 column="n_float",
                 quantile_ranges={"quantiles": qs,
                                  "value_ranges": [[None, None]] * len(qs)})
    assert r.result["observed_value"]["values"] == pytest.approx(expected, rel=1e-12)


def test_table_rules(fixture_ds):
    suite = (
        ExpectationSuite("tbl")
        .add("expect_table_row_count_to_be_between", min_value=100, max_value=100)
        .add("expect_table_row_count_to_equal", value=100)
        .add("expect_table_column_count_to_equal", value=12)
        .add("expect_column_to_exist", column="n_int")
        .add("expect_column_values_to_be_of_type", column="n_int", type_="int64")
        .add("expect_column_values_to_be_in_type_list", column="s_clean",
             type_list=["str", "int64"])
        .add("expect_table_columns_to_match_set",
             column_set=["s_clean", "s_mixed"], exact_match=False)
    )
    res = validate(fixture_ds, suite)
    assert res.success, [r.to_json_dict() for r in res.results if not r.success]


def test_suite_statistics(fixture_ds):
    suite = (
        ExpectationSuite("stats")
        .add("expect_column_values_to_match_regex", column="s_mixed", regex="match")
        .add("expect_column_values_to_not_be_null", column="s_clean")
        .add("expect_table_row_count_to_equal", value=100)
    )
    res = validate(fixture_ds, suite)
    st = res.statistics
    assert st["evaluated_expectations"] == 3
    assert st["successful_expectations"] == 2
    assert st["success_percent"] == pytest.approx(200 / 3)
    assert not st["success"]


def test_suite_parameters(fixture_ds):
    from great_expectations_ray.core.suite import ExpectationSuite as ES

    suite = ES.from_json_dict({
        "name": "p",
        "expectations": [{
            "expectation_type": "expect_column_values_to_match_regex",
            "kwargs": {"column": "s_mixed", "regex": {"$PARAMETER": "rx"},
                       "mostly": {"$PARAMETER": "m"}},
        }],
        "suite_parameters": {"rx": "match", "m": 0.5},
    })
    res = validate(fixture_ds, suite)
    assert res.results[0].success


def test_catch_exceptions_bad_column(fixture_ds):
    r = _run_one(fixture_ds, "expect_column_values_to_match_regex",
                 column="no_such_column", regex="x")
    assert not r.success
    assert r.exception_info["raised_exception"]
