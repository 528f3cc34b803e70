"""Conformance tests for the contrib-expectation ports
(functions/contrib.py) — positive/negative cases mirror the contrib
modules' own example blocks."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from great_expectations_ray import ExpectationSuite, validate


def _run(col_values, expectation, **kwargs):
    ds = rd.from_arrow(pa.table({"c": col_values}))
    suite = ExpectationSuite("contrib").add(expectation, column="c", **kwargs)
    return validate(ds, suite).results[0]


def test_hexadecimal(ray_session):
    r = _run(["deadBEEF", "0f", "123", "0x12", "xyz", None],
             "expect_column_values_to_be_hexadecimal")
    assert not r.success
    assert r.result["unexpected_count"] == 2  # 0x12 (prefix) and xyz
    assert sorted(r.result["partial_unexpected_list"]) == ["0x12", "xyz"]

    ok = _run(["abc123", "FF"], "expect_column_values_to_be_hexadecimal")
    assert ok.success


def test_valid_arn(ray_session):
    r = _run([
        "arn:aws:iam::123456789012:user/alice",
        "arn:aws:s3:::my-bucket/key",
        "arn:partition:service:region:acct:res",
        "not-an-arn",
        "arn:missing-parts",
    ], "expect_column_values_to_be_valid_arn")
    assert not r.success
    assert r.result["unexpected_count"] == 2


def test_valid_scientific_notation(ray_session):
    r = _run(["1.5e10", "-2E-3", "0.5", "3", ".5", "1e", "e5", "abc"],
             "expect_column_values_to_be_valid_scientific_notation")
    assert not r.success
    assert sorted(r.result["partial_unexpected_list"]) == ["1e", "abc", "e5"]


def test_not_future_date_strings(ray_session):
    r = _run(["2000-01-01", "1999-12-31 23:59:59", "2999-01-01", "garbage"],
             "expect_column_values_to_not_be_future_date")
    assert not r.success
    # future date AND unparseable are both unexpected (contrib parse->False)
    assert r.result["unexpected_count"] == 2
    ok = _run(["2001-06-15", "1970-01-01"],
              "expect_column_values_to_not_be_future_date")
    assert ok.success


def test_not_future_date_timestamp_column(ray_session):
    import datetime as dt

    past = dt.datetime(2020, 5, 1)
    future = dt.datetime(2999, 1, 1)
    today = dt.datetime.now().replace(hour=0, minute=0, second=0, microsecond=0)
    r = _run([past, future, today], "expect_column_values_to_not_be_future_date")
    assert not r.success and r.result["unexpected_count"] == 1


def test_decimal_places_equal(ray_session):
    # 2.5 has 1 place; 3.0 is integral -> passes by fiat; 2.55 fails
    r = _run([2.5, 3.0, 2.55, None],
             "expect_column_values_number_of_decimal_places_to_equal",
             decimal_places=1)
    assert not r.success and r.result["unexpected_count"] == 1

    ints = _run([1, 2, 3],
                "expect_column_values_number_of_decimal_places_to_equal",
                decimal_places=2)
    assert ints.success  # integers count as having the expected places


def test_not_contain_special_characters(ray_session):
    r = _run(["clean text", "with-dash", "with space ok", "semi;colon"],
             "expect_column_values_to_not_contain_special_characters",
             allowed_characters=["-"])
    assert not r.success
    assert r.result["partial_unexpected_list"] == ["semi;colon"]

    all_allowed = _run(["a;b", "c,d"],
                       "expect_column_values_to_not_contain_special_characters",
                       allowed_characters=list(";,"))
    assert all_allowed.success


def test_not_contain_character(ray_session):
    r = _run(["a@b.com", "plain", "x@y"],
             "expect_column_values_to_not_contain_character", character="@")
    assert not r.success and r.result["unexpected_count"] == 2


def test_foreign_keys_in_column_b(ray_session):
    dim = [{"fk": 1}, {"fk": 2}, {"fk": 3}]
    ds = rd.from_arrow(pa.table({"c": [1, 2, 3, 9, None]}))
    suite = ExpectationSuite("fk").add(
        "expect_foreign_keys_in_column_a_to_exist_in_column_b",
        column="c", df=dim, column_B="fk")
    r = validate(ds, suite).results[0]
    assert not r.success and r.result["unexpected_count"] == 1
    assert r.result["partial_unexpected_list"] == [9]
    # columnar dict form also accepted
    ok = validate(
        rd.from_arrow(pa.table({"c": [1, 2]})),
        ExpectationSuite("fk2").add(
            "expect_foreign_keys_in_column_a_to_exist_in_column_b",
            column="c", df={"fk": [1, 2, 3]}, column_B="fk"),
    ).results[0]
    assert ok.success


def test_multicolumn_not_all_null(ray_session):
    ds = rd.from_arrow(pa.table({
        "a": [1, None, None, 4],
        "b": [None, 2.0, None, 5.0],
    })).repartition(2)
    r = validate(ds, ExpectationSuite("nn").add(
        "expect_multicolumn_values_to_not_be_all_null",
        column_list=["a", "b"])).results[0]
    assert not r.success and r.result["unexpected_count"] == 1

    ok = validate(ds, ExpectationSuite("nn2").add(
        "expect_multicolumn_values_to_not_be_all_null",
        column_list=["a", "b"], mostly=0.75)).results[0]
    assert ok.success


def test_skew_kurtosis_exact_across_block_splits(ray_session):
    """Skew/kurtosis ride the Pébay M3/M4 combine: the value must equal the
    single-machine scipy-default formulas regardless of partitioning."""
    import numpy as np

    rng = np.random.RandomState(7)
    x = np.concatenate([rng.exponential(2.0, 500), rng.normal(10, 1, 300)])
    # scipy defaults: bias=True, fisher=True — computed here from raw moments
    d = x - x.mean()
    g1 = (d**3).mean() / (d**2).mean() ** 1.5
    g2 = (d**4).mean() / (d**2).mean() ** 2 - 3.0

    ds = rd.from_arrow(pa.table({"c": x})).repartition(7)
    suite = (
        ExpectationSuite("moments")
        .add("expect_column_skew_to_be_between", column="c",
             min_value=g1 - 1e-9, max_value=g1 + 1e-9)
        .add("expect_column_kurtosis_to_be_between", column="c",
             min_value=g2 - 1e-9, max_value=g2 + 1e-9)
    )
    res = validate(ds, suite)
    assert res.results[0].success and res.results[1].success
    assert abs(res.results[0].result["observed_value"] - g1) < 1e-9
    assert abs(res.results[1].result["observed_value"] - g2) < 1e-9


def test_skew_abs_and_constant_column(ray_session):
    import numpy as np

    x = np.concatenate([np.zeros(90), np.ones(10)])  # left-skewed negative? no: right
    ds = rd.from_arrow(pa.table({"c": -x}))
    # skew of -x is negative; abs=True flips the sign for the bound check
    r = validate(ds, ExpectationSuite("s").add(
        "expect_column_skew_to_be_between", column="c",
        min_value=1.0, abs=True)).results[0]
    assert r.success

    const = validate(
        rd.from_arrow(pa.table({"c": [5.0] * 20})),
        ExpectationSuite("k").add("expect_column_kurtosis_to_be_between",
                                  column="c", min_value=-10),
    ).results[0]
    assert not const.success  # scipy yields nan on a constant column
    assert const.result["observed_value"] is None


def test_discrete_entropy(ray_session):
    import math

    # counts 50/25/25 -> H2 = 1.5 bits
    vals = ["a"] * 50 + ["b"] * 25 + ["c"] * 25
    ds = rd.from_arrow(pa.table({"c": vals})).repartition(4)
    r = validate(ds, ExpectationSuite("e").add(
        "expect_column_discrete_entropy_to_be_between", column="c",
        base=2, min_value=1.5 - 1e-12, max_value=1.5 + 1e-12)).results[0]
    assert r.success and abs(r.result["observed_value"] - 1.5) < 1e-12

    # natural-log default base (scipy default)
    rn = validate(ds, ExpectationSuite("e2").add(
        "expect_column_discrete_entropy_to_be_between", column="c",
        min_value=1.5 * math.log(2) - 1e-12,
        max_value=1.5 * math.log(2) + 1e-12)).results[0]
    assert rn.success


def test_discrete_entropy_distributed_overflow(ray_session):
    """High-cardinality column overflows the in-memory VC partials; entropy
    must route to the bucketed distributed path and stay exact."""
    import math

    import numpy as np

    n = 5000
    ds = rd.range(n).map_batches(
        lambda b: {"c": b["id"] % 2500}, batch_format="numpy"
    ).repartition(4)
    # 2500 distinct values, 2 each -> H = ln(2500)
    r = validate(ds, ExpectationSuite("eo").add(
        "expect_column_discrete_entropy_to_be_between", column="c",
        min_value=math.log(2500) - 1e-9,
        max_value=math.log(2500) + 1e-9)).results[0]
    assert r.success, r.to_json_dict()
    if r.result.get("details", {}).get("distributed"):
        assert abs(r.result["observed_value"] - math.log(2500)) < 1e-9


def test_mostly_applies_to_contrib_kernels(ray_session):
    # contrib ports ride the standard map-rule machinery: mostly, nulls,
    # partial_unexpected_list all behave like core expectations
    r = _run(["ff", "00", "zz", None, "ab"],
             "expect_column_values_to_be_hexadecimal", mostly=0.7)
    assert r.success  # 3/4 non-null pass >= 0.7
    assert r.result["unexpected_count"] == 1
