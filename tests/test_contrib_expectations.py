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


# --------------------------------------------------------------------------- #
# batch 3 (round 3)
# --------------------------------------------------------------------------- #


def test_valid_crc32(ray_session):
    r = _run(["deadbeef", "DEADBEEF", "0a1b2c3d", "deadbee", "deadbeef9", "zzzzzzzz", None],
             "expect_column_values_to_be_valid_crc32")
    assert not r.success
    assert r.result["unexpected_count"] == 3


def test_powers_of_base(ray_session):
    r = _run([1, 2, 4, 8, 1024, 6, 0, -4, None],
             "expect_column_values_to_match_powers_of_base", base_integer=2)
    assert r.result["unexpected_count"] == 3  # 6, 0, -4
    ok = _run([1, 3, 9, 27, 81], "expect_column_values_to_match_powers_of_base",
              base_integer=3)
    assert ok.success
    # base 0/1 special case: num == base
    r = _run([0, 1], "expect_column_values_to_match_powers_of_base", base_integer=0)
    assert r.result["unexpected_count"] == 1


def test_after_split_in_set(ray_session):
    r = _run(["a, b", "a,c", "a , a", "d", None],
             "expect_column_values_after_split_to_be_in_set",
             delimiter=",", value_set=["a", "b"])
    assert not r.success
    assert r.result["unexpected_count"] == 2  # a,c and d


def test_after_split_unique(ray_session):
    r = _run(["a,b,c", "a,a", "x", "b,c,b", None],
             "expect_column_values_after_split_to_be_unique", delimiter=",")
    assert r.result["unexpected_count"] == 2


def _run_multi(tbl_dict, expectation, **kwargs):
    ds = rd.from_arrow(pa.table(tbl_dict))
    suite = ExpectationSuite("contrib3").add(expectation, **kwargs)
    return validate(ds, suite).results[0]


def test_multicolumn_sum_between(ray_session):
    r = _run_multi({"a": [1, 2, 10], "b": [3, 4, 10]},
                   "expect_multicolumn_sum_values_to_be_between",
                   column_list=["a", "b"], min_value=4, max_value=6)
    assert r.result["unexpected_count"] == 1


def test_multicolumn_sum_and_product_equal_single(ray_session):
    r = _run_multi({"a": [1, 2, 1], "b": [3, 4, None], "t": [4, 7, 1]},
                   "expect_multicolumn_sum_values_to_be_equal_to_single_column",
                   column_list=["a", "b", "t"], additional_value=0)
    # row2: 2+4 != 7; row3: null sum (skipna=False) -> unexpected
    assert r.result["unexpected_count"] == 2
    r = _run_multi({"a": [2, 2], "b": [3, 3], "t": [6, 5]},
                   "expect_multicolumn_product_values_to_be_equal_to_single_column",
                   column_list=["a", "b", "t"])
    assert r.result["unexpected_count"] == 1


def test_multicolumn_values_equal(ray_session):
    r = _run_multi({"a": [1, 2, None], "b": [1, 3, None], "c": [1, 2, None]},
                   "expect_multicolumn_values_to_be_equal",
                   column_list=["a", "b", "c"])
    # null == null (nunique dropna=False): row3 passes, row2 fails
    assert r.result["unexpected_count"] == 1


def test_pair_difference_of_custom_percentage(ray_session):
    r = _run_multi({"column_A": [100.0, 100.0], "column_B": [105.0, 120.0]},
                   "expect_column_pair_values_to_have_difference_of_custom_percentage",
                   column_A="column_A", column_B="column_B", percentage=0.1)
    assert r.result["unexpected_count"] == 1


def test_alphabetical_ordered(ray_session):
    ds = rd.from_arrow(pa.table({
        "g": [1, 1, 1, 2, 2], "i": [1, 2, 3, 1, 2],
        "c": ["apple", "Banana", "cherry", "zebra", "ant"],
    }))
    suite = ExpectationSuite("alpha").add(
        "expect_column_values_to_be_alphabetical", column="c",
        partition_by="g", order_by="i")
    r = validate(ds, suite).results[0]
    # group 1 in order (case-insensitive); group 2 has zebra->ant violation
    assert not r.success
    assert r.result["unexpected_count"] == 1
    suite = ExpectationSuite("alpha_rev").add(
        "expect_column_values_to_be_alphabetical", column="c",
        partition_by="g", order_by="i", reverse=True)
    r = validate(ds, suite).results[0]
    assert r.result["unexpected_count"] == 2  # group1 has 2 ascending steps


def test_change_between_ordered(ray_session):
    ds = rd.from_arrow(pa.table({
        "g": [1, 1, 1, 1], "i": [1, 2, 3, 4],
        "c": [10.0, 13.0, 14.0, 30.0],
    }))
    suite = ExpectationSuite("chg").add(
        "expect_column_values_to_change_between", column="c",
        partition_by="g", order_by="i", from_value=1, to_value=5)
    r = validate(ds, suite).results[0]
    # diffs: fill(1 ok), 3 ok, 1 ok, 16 bad
    assert r.result["unexpected_count"] == 1
    # non-numeric -> failed EVR with TypeError (contrib raises)
    ds2 = rd.from_arrow(pa.table({"g": [1], "i": [1], "c": ["x"]}))
    r2 = validate(ds2, ExpectationSuite("chg2").add(
        "expect_column_values_to_change_between", column="c",
        partition_by="g", order_by="i", from_value=1, to_value=5)).results[0]
    assert not r2.success
    assert "TypeError" in (r2.exception_info or {}).get("exception_message", "")


def test_string_integers_increasing_ordered(ray_session):
    ds = rd.from_arrow(pa.table({
        "g": [1, 1, 1, 2, 2], "i": [1, 2, 3, 1, 2],
        "c": ["1", "2", "2", "5", "3"],
    }))
    suite = ExpectationSuite("sii").add(
        "expect_column_values_to_be_string_integers_increasing", column="c",
        partition_by="g", order_by="i")
    r = validate(ds, suite).results[0]
    assert r.result["unexpected_count"] == 1  # 5 -> 3
    suite = ExpectationSuite("sii_strict").add(
        "expect_column_values_to_be_string_integers_increasing", column="c",
        partition_by="g", order_by="i", strictly=True)
    r = validate(ds, suite).results[0]
    assert r.result["unexpected_count"] == 2  # plus the 2 -> 2 tie


def test_percentile_value_above(ray_session):
    r = _run([1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
             "expect_column_percentile_value_to_be_above",
             percentile=40, value=4.0)
    # pandas quantile(0.4) of 1..10 = 4.6
    assert r.success
    assert abs(r.result["observed_value"] - 4.6) < 1e-12
    r = _run([1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
             "expect_column_percentile_value_to_be_above",
             percentile=10, value=4.0)
    assert not r.success


def test_distinct_values_continuous_ints(ray_session):
    ok = _run([3, 4, 5, 6, 4, 5], "expect_column_distinct_values_to_be_continuous")
    assert ok.success
    bad = _run([3, 4, 6, 7], "expect_column_distinct_values_to_be_continuous")
    assert not bad.success
    assert "5" in bad.result["observed_value"]


def test_distinct_values_continuous_dates(ray_session):
    from datetime import datetime
    ok = _run([datetime(2024, 1, 1), datetime(2024, 1, 2), datetime(2024, 1, 3)],
              "expect_column_distinct_values_to_be_continuous")
    assert ok.success
    bad = _run(["2024-01-01 05:00:00", "2024-01-03 06:00:00"],
               "expect_column_distinct_values_to_be_continuous",
               datetime_format="%Y-%m-%d %H:%M:%S")
    assert not bad.success


def test_no_days_missing(ray_session):
    from datetime import datetime
    vals = [datetime(2024, 1, 1), datetime(2024, 1, 2), datetime(2024, 1, 5)]
    r = _run(vals, "expect_column_to_have_no_days_missing", threshold=1)
    assert not r.success  # missing Jan 3, 4 (2 > 1)
    assert r.result["Number of missing days"] == 2
    r = _run(vals, "expect_column_to_have_no_days_missing", threshold=2)
    assert r.success


def test_no_months_missing(ray_session):
    from datetime import datetime
    vals = [datetime(2024, 1, 15), datetime(2024, 2, 1), datetime(2024, 4, 20)]
    r = _run(vals, "expect_column_to_have_no_months_missing", threshold=0)
    assert not r.success  # March missing
    assert r.result["Number of missing months"] == 1
    r = _run(vals, "expect_column_to_have_no_months_missing", threshold=1)
    assert r.success


def test_benfords_law(ray_session):
    import numpy as np
    rng = np.random.default_rng(7)
    # log-uniform data follows Benford closely
    benford = (10 ** rng.uniform(0, 5, size=4000)).tolist()
    r = _run(benford, "expect_column_distribution_to_match_benfords_law")
    assert r.success, r.result
    uniform = rng.uniform(40000, 50000, size=4000).tolist()  # all start with 4
    r = _run(uniform, "expect_column_distribution_to_match_benfords_law")
    assert not r.success


def test_wasserstein_distance(ray_session):
    # identical distributions -> 0
    r = _run([1.0, 2.0, 3.0], "expect_column_wasserstein_distance_to_be_less_than",
             raw_values=[1.0, 2.0, 3.0], max_value=1e-12)
    assert r.success
    assert abs(r.result["observed_value"]) < 1e-15
    # shift by 1 -> W1 = 1
    r = _run([1.0, 2.0, 3.0], "expect_column_wasserstein_distance_to_be_less_than",
             raw_values=[2.0, 3.0, 4.0], max_value=0.5)
    assert not r.success
    assert abs(r.result["observed_value"] - 1.0) < 1e-12
    # partition object with weights
    r = _run([1.0, 1.0, 2.0, 2.0], "expect_column_wasserstein_distance_to_be_less_than",
             partition={"values": [1.0, 2.0], "weights": [0.5, 0.5]},
             max_value=1e-12)
    assert r.success


def test_not_be_outliers_iqr_and_std(ray_session):
    import numpy as np
    vals = list(np.arange(1.0, 21.0)) + [1000.0]
    r = _run(vals, "expect_column_values_to_not_be_outliers",
             method="iqr", multiplier=1.5)
    assert not r.success
    assert r.result["unexpected_count"] == 1
    assert r.result["partial_unexpected_list"] == [1000.0]
    r = _run(vals, "expect_column_values_to_not_be_outliers",
             method="std", multiplier=3)
    assert r.result["unexpected_count"] == 1
    # all inliers
    ok = _run(list(np.arange(1.0, 21.0)),
              "expect_column_values_to_not_be_outliers", method="iqr",
              multiplier=1.5)
    assert ok.success


def test_not_be_outliers_matches_pandas_iqr(ray_session):
    # cross-check center/spread against the contrib's formula on a small
    # sample: iqr = linear-interp q75 - q25, median = Series.median()
    import numpy as np
    import pandas as pd
    rng = np.random.default_rng(3)
    vals = rng.normal(50, 10, size=200).round(2).tolist()
    s = pd.Series(vals)
    iqr = s.quantile(0.75) - s.quantile(0.25)
    med = s.median()
    expected_bad = int((~((s - med).abs() < 1.5 * iqr)).sum())
    r = _run(vals, "expect_column_values_to_not_be_outliers",
             method="iqr", multiplier=1.5)
    assert r.result["unexpected_count"] == expected_bad


def test_table_checksum_equal_other_table(ray_session):
    t1 = pa.table({"a": [1, 2, 3], "b": ["x", "y", None]})
    # same rows, different order, different block split -> equal checksum
    t2 = pa.table({"a": [3, 1, 2], "b": [None, "x", "y"]})
    ds1, ds2 = rd.from_arrow(t1), rd.from_arrow(t2).repartition(3)
    suite = ExpectationSuite("ck").add(
        "expect_table_checksum_to_equal_other_table", other_table_name="o")
    r = validate(ds1, suite, other_tables={"o": ds2}).results[0]
    assert r.success, r.to_json_dict()
    # a changed value flips it
    t3 = pa.table({"a": [1, 2, 4], "b": ["x", "y", None]})
    r = validate(ds1, suite, other_tables={"o": rd.from_arrow(t3)}).results[0]
    assert not r.success
    # ignore_columns drops the differing column
    suite2 = ExpectationSuite("ck2").add(
        "expect_table_checksum_to_equal_other_table", other_table_name="o",
        ignore_columns=["a"])
    r = validate(ds1, suite2, other_tables={"o": rd.from_arrow(t3)}).results[0]
    assert r.success


# --------------------------------------------------------------------------- #
# expect_queried_* family (shared stream->DuckDB pass)
# --------------------------------------------------------------------------- #


def test_queried_value_frequency_threshold(ray_session):
    ds = rd.from_arrow(pa.table({"c": ["a", "a", "a", "b"]})).repartition(2)
    suite = ExpectationSuite("qf").add(
        "expect_queried_column_value_frequency_to_meet_threshold",
        column="c", value="a", threshold=0.7)
    r = validate(ds, suite).results[0]
    assert r.success
    assert abs(r.result["observed_value"] - 0.75) < 1e-12
    # list form
    suite = ExpectationSuite("qf2").add(
        "expect_queried_column_value_frequency_to_meet_threshold",
        column="c", value=["a", "b"], threshold=[0.7, 0.5])
    r = validate(ds, suite).results[0]
    assert not r.success
    assert r.result["observed_value"] == [0.75, 0.25]


def test_queried_table_row_count_and_custom_query(ray_session):
    ds = rd.from_arrow(pa.table({"c": [1, 2, 3, 4]})).repartition(2)
    r = validate(ds, ExpectationSuite("qrc").add(
        "expect_queried_table_row_count_to_be", value=4)).results[0]
    assert r.success and r.result["observed_value"] == 4
    r = validate(ds, ExpectationSuite("qcq").add(
        "expect_queried_custom_query_to_return_num_rows",
        template_dict={"user_query": "SELECT * FROM {batch} WHERE c > 2"},
        value=2)).results[0]
    assert r.success and r.result["observed_value"] == 2


def test_queried_column_list_unique_and_dup_combinations(ray_session):
    ds = rd.from_arrow(pa.table({
        "a": [1, 1, 2, 2], "b": ["x", "x", "y", "z"],
    })).repartition(2)  # (1,x) duplicated across blocks
    r = validate(ds, ExpectationSuite("qu").add(
        "expect_queried_column_list_to_be_unique",
        template_dict={"column_list": ["a", "b"]})).results[0]
    assert not r.success
    assert r.result["observed_value"] == 1
    r = validate(ds, ExpectationSuite("qd").add(
        "expect_query_to_have_no_duplicate_value_combinations",
        columns=["a", "b"])).results[0]
    assert not r.success
    assert r.result["observed_value"] == [[1, "x", 2]]


def test_queried_n_distinct_with_condition(ray_session):
    ds = rd.from_arrow(pa.table({"c": [1, 2, 3, 3], "f": [1, 1, 1, 0]}))
    r = validate(ds, ExpectationSuite("qn").add(
        "expect_queried_column_to_have_n_distinct_values_with_condition",
        template_dict={"column_to_check": "c", "condition": "f = 1",
                       "num_of_distinct_values": 3})).results[0]
    assert r.success
    r = validate(ds, ExpectationSuite("qn2").add(
        "expect_queried_column_to_have_n_distinct_values_with_condition",
        template_dict={"column_to_check": "c", "condition": "f = 1",
                       "num_of_distinct_values": 2})).results[0]
    assert not r.success
    assert "found 3" in r.result["info"]


def test_queried_count_with_filter_threshold(ray_session):
    ds = rd.from_arrow(pa.table({"c": ["x", "x", "y"]}))
    r = validate(ds, ExpectationSuite("qcf").add(
        "expect_query_count_with_filter_to_meet_threshold",
        template_dict={"col": "c", "filter": "'x'"}, threshold=2)).results[0]
    assert r.success and r.result["observed_value"] == 2


def test_queried_scd_no_gaps(ray_session):
    ds = rd.from_arrow(pa.table({
        "pk": [1, 1, 2, 2],
        "open_d": ["2024-01-01", "2024-02-01", "2024-01-01", "2024-03-01"],
        "close_d": ["2024-02-01", "2024-06-01", "2024-02-15", "2024-06-01"],
    }))
    td = {"primary_key": "pk", "open_date_column": "open_d",
          "close_date_column": "close_d"}
    r = validate(ds, ExpectationSuite("scd").add(
        "expect_queried_slowly_changing_table_to_have_no_gaps",
        template_dict=td, threshold=0)).results[0]
    assert not r.success  # pk=2 has a gap (close 02-15 != next open 03-01)
    assert abs(r.result["observed_value"] - 0.25) < 1e-12
    r = validate(ds, ExpectationSuite("scd2").add(
        "expect_queried_slowly_changing_table_to_have_no_gaps",
        template_dict=td, threshold=0.25)).results[0]
    assert r.success


def test_queried_pair_both_filled_or_null(ray_session):
    ds = rd.from_arrow(pa.table({
        "a": [1, None, 3, None], "b": [1, None, None, 4],
    }))
    r = validate(ds, ExpectationSuite("qp").add(
        "expect_queried_column_pair_values_to_be_both_filled_or_null",
        template_dict={"column_a": "a", "column_b": "b"})).results[0]
    assert not r.success
    assert r.result["observed_value"] == 2


# --------------------------------------------------------------------------- #
# batch 4 (round 3): stats tests, aliases, remaining queried
# --------------------------------------------------------------------------- #


def test_sum_to_be(ray_session):
    r = _run([1, 2, 3, 4, 5], "expect_column_sum_to_be", sum_total=15)
    assert r.success and r.result["observed_value"] == 15
    r = _run([1, 2, 3, 4, 5], "expect_column_sum_to_be", sum_total=14)
    assert not r.success


def test_normally_distributed(ray_session):
    import numpy as np
    rng = np.random.default_rng(0)
    normal = rng.normal(50, 5, size=3000).tolist()
    r = _run(normal, "expect_column_values_to_be_normally_distributed",
             min_value=0.05)
    assert r.success, r.to_json_dict()
    expo = rng.exponential(5, size=3000).tolist()
    r = _run(expo, "expect_column_values_to_be_normally_distributed",
             min_value=0.05)
    assert not r.success
    assert r.result["observed_value"] < 1e-6


def test_normaltest_matches_published_values(ray_session):
    # cross-check the pure-python D'Agostino against a hand-computed case:
    # the z-transforms must reproduce the scipy-published example magnitude
    import numpy as np
    from great_expectations_ray.functions.stats_math import dagostino_normaltest_p
    rng = np.random.default_rng(42)
    x = rng.normal(size=1000)
    c = x - x.mean()
    g1 = (c**3).mean() / (c**2).mean()**1.5
    g2 = (c**4).mean() / (c**2).mean()**2 - 3
    p = dagostino_normaltest_p(len(x), g1, g2)
    assert 0.01 < p <= 1.0  # normal draw: must not reject at 1%


def test_chisquare_simple(ray_session):
    ds = rd.from_arrow(pa.table({
        "obs": [10.0, 20.0, 30.0, 40.0],
        "exp": [10.0, 20.0, 30.0, 40.0],
    })).repartition(2)
    suite = ExpectationSuite("chs").add(
        "expect_column_chisquare_simple_test_p_value_to_be_greater_than",
        column="obs", expected_column="exp", p_value_threshold=0.9)
    r = validate(ds, suite).results[0]
    assert r.success  # identical -> chi2 = 0 -> p = 1
    assert abs(r.result["observed_value"] - 1.0) < 1e-12
    ds2 = rd.from_arrow(pa.table({
        "obs": [100.0, 2.0, 300.0, 4.0], "exp": [1.0, 200.0, 3.0, 400.0],
    }))
    r = validate(ds2, ExpectationSuite("chs2").add(
        "expect_column_chisquare_simple_test_p_value_to_be_greater_than",
        column="obs", expected_column="exp", p_value_threshold=0.1)).results[0]
    assert not r.success


def test_ks_2samp_exact_d(ray_session):
    import numpy as np
    from great_expectations_ray.functions.ks import distributed_ks_2samp

    def ks2_direct(a, b):
        a, b = np.sort(a), np.sort(b)
        allv = np.sort(np.concatenate([a, b]))
        return float(np.abs(np.searchsorted(a, allv, side="right") / len(a)
                            - np.searchsorted(b, allv, side="right") / len(b)).max())

    rng = np.random.default_rng(1)
    a = rng.normal(size=501)
    b = np.concatenate([rng.normal(0.3, 1, size=400),
                        a[:100]])  # shared values force cross-sample ties
    n = max(len(a), len(b))
    tbl = pa.table({"a": np.concatenate([a, np.full(n - len(a), np.nan)]),
                    "b": np.concatenate([b, np.full(n - len(b), np.nan)])})
    # nan -> null so the per-column filters drop padding
    import pyarrow.compute as pc_
    tbl = pa.table({c: pc_.if_else(pc_.is_nan(tbl[c]), None, tbl[c])
                    for c in tbl.column_names})
    for parts in (1, 7):
        ds = rd.from_arrow(tbl).repartition(parts)
        r = distributed_ks_2samp(ds, "a", "b")
        assert abs(r["d_statistic"] - ks2_direct(a, b)) < 1e-12, parts
        assert r["n_a"] == len(a) and r["n_b"] == len(b)


def test_ks_2samp_expectation(ray_session):
    import numpy as np
    rng = np.random.default_rng(2)
    same = pa.table({"x": rng.normal(size=800), "y": rng.normal(size=800)})
    r = validate(rd.from_arrow(same), ExpectationSuite("ks2").add(
        "expect_column_kolmogoro_smirnov_test_p_value_to_be_greater_than",
        column_a="x", column_b="y", p_value_threshold=0.05)).results[0]
    assert r.success, r.to_json_dict()
    diff = pa.table({"x": rng.normal(size=800), "y": rng.normal(2, 1, size=800)})
    r = validate(rd.from_arrow(diff), ExpectationSuite("ks2b").add(
        "expect_column_kolmogoro_smirnov_test_p_value_to_be_greater_than",
        column_a="x", column_b="y", p_value_threshold=0.05)).results[0]
    assert not r.success


def test_valid_json_and_in_set_aliases(ray_session):
    r = _run(['{"a": 1}', "[1,2]", "not json", None],
             "expect_column_values_to_be_valid_json")
    assert r.result["unexpected_count"] == 1
    r = _run(["a", "b", "z"], "expect_column_values_to_be_in_set_spark_optimized",
             value_set=["a", "b"])
    assert r.result["unexpected_count"] == 1


def test_value_at_index(ray_session):
    r = _run(["abc", "axc", "ab", "", None], "expect_value_at_index",
             index=1, value="b")
    # "abc" ok; "axc" x != b; "ab" has 'b' at 1 -> ok; "" out of range
    assert r.result["unexpected_count"] == 2
    r = _run(["abc", "xyc", "c"], "expect_value_at_index", index=-1, value="c")
    assert r.success


def test_queried_unique_with_condition(ray_session):
    ds = rd.from_arrow(pa.table({"c": [1, 1, 2, 2], "f": [1, 0, 1, 1]}))
    r = validate(ds, ExpectationSuite("quc").add(
        "expect_queried_column_to_be_unique_with_condition",
        template_dict={"column_to_check": "c", "condition": "f = 1"})).results[0]
    assert not r.success  # c=2 duplicated under f=1
    r = validate(ds, ExpectationSuite("quc2").add(
        "expect_queried_column_to_be_unique_with_condition",
        template_dict={"column_to_check": "c", "condition": "f = 0"})).results[0]
    assert r.success


def test_queried_pair_values_have_diff(ray_session):
    ds = rd.from_arrow(pa.table({"a": [5, 7, 9], "b": [2, 4, 7]}))
    r = validate(ds, ExpectationSuite("qpd").add(
        "expect_queried_column_pair_values_to_have_diff",
        column_A="a", column_B="b", diff=3, mostly=0.6)).results[0]
    assert r.success  # 2/3 rows have |diff| == 3
    r = validate(ds, ExpectationSuite("qpd2").add(
        "expect_queried_column_pair_values_to_have_diff",
        column_A="a", column_B="b", diff=3, mostly=0.9)).results[0]
    assert not r.success


def test_queried_exist_in_second_table(ray_session):
    first = rd.from_arrow(pa.table({"id": [1, 2, 3], "f": [1, 1, 1]}))
    second = rd.from_arrow(pa.table({"ref_id": [1, 2]}))
    td = {"first_table_column": "id", "second_table_column": "ref_id",
          "second_table_full_name": "refs", "condition": "f = 1"}
    suite = ExpectationSuite("q2t").add(
        "expect_queried_column_values_to_exist_in_second_table_column",
        template_dict=td)
    r = validate(first, suite, other_tables={"refs": second}).results[0]
    assert not r.success  # id=3 missing
    assert r.result["observed_value"] == 1
    second_full = rd.from_arrow(pa.table({"ref_id": [1, 2, 3]}))
    r = validate(first, suite, other_tables={"refs": second_full}).results[0]
    assert r.success


# --------------------------------------------------------------------------- #
# batch 5: day-vs-weekday-mean, datetime diffs, follow_rule, present-in-other
# --------------------------------------------------------------------------- #


def test_day_count_weekday_mean(ray_session):
    # run date 2024-03-01 (Fri); equivalent Fridays: 02-23, 02-16, 02-09, 02-02
    days = (["2024-03-01"] * 3 + ["2024-02-23"] * 3 + ["2024-02-16"] * 3
            + ["2024-02-09"] * 3 + ["2024-02-02"] * 3 + ["2024-01-15"] * 50)
    ds = rd.from_arrow(pa.table({"d": days}))
    suite = ExpectationSuite("dc").add(
        "expect_day_count_to_be_close_to_equivalent_week_day_mean",
        column="d", run_date="2024-03-01", threshold=0.25)
    r = validate(ds, suite).results[0]
    assert r.success, r.to_json_dict()  # 3 vs avg 3 -> diff (0+1)/(3+1)=0.25
    bad = rd.from_arrow(pa.table({"d": ["2024-03-01"] * 10 + ["2024-02-23"] * 3}))
    r = validate(bad, ExpectationSuite("dc2").add(
        "expect_day_count_to_be_close_to_equivalent_week_day_mean",
        column="d", run_date="2024-03-01", threshold=0.25)).results[0]
    assert not r.success


def test_day_sum_weekday_mean(ray_session):
    ds = rd.from_arrow(pa.table({
        "d": ["2024-03-01", "2024-02-23", "2024-02-16", "2024-02-09", "2024-02-02"],
        "amt": [10.0, 10.0, 10.0, 10.0, 10.0],
    }))
    r = validate(ds, ExpectationSuite("dsm").add(
        "expect_day_sum_to_be_close_to_equivalent_week_day_mean",
        column="amt", date_column="d", run_date="2024-03-01",
        threshold=0.25)).results[0]
    assert r.success, r.to_json_dict()  # 10 vs avg 10 -> (0+1)/(10+1) ~ 0.09


def test_multicolumn_datetime_difference_in_months(ray_session):
    ds = rd.from_arrow(pa.table({
        "s": ["2024-01-15", "2024-01-15", "2024-01-15", None],
        "e": ["2024-04-10", "2024-06-01", "2024-04-10", "2024-04-10"],
        "g": [3, 3, 2, 3],
    }))
    suite = ExpectationSuite("dtm").add(
        "expect_multicolumn_datetime_difference_in_months",
        start_datetime="s", end_datetime="e", gap="g", threshold=0)
    r = validate(ds, suite).results[0]
    # row1 gap==3 ok; row2 diff=5 bad; row3 gap=2 vs 3 bad; row4 null bad
    assert r.result["unexpected_count"] == 3
    suite = ExpectationSuite("dtm2").add(
        "expect_multicolumn_datetime_difference_in_months",
        start_datetime="s", end_datetime="e", gap="g", threshold=1)
    r = validate(ds, suite).results[0]
    assert r.result["unexpected_count"] == 2  # threshold 1 rescues row3


def test_multicolumn_datetime_difference_lt_two_months(ray_session):
    ds = rd.from_arrow(pa.table({
        "s": ["2024-01-15", "2024-01-15", "2024-01-15", None],
        "e": ["2024-02-20", "2024-03-15", "2024-03-20", "2024-09-01"],
    }))
    r = validate(ds, ExpectationSuite("dt2").add(
        "expect_multicolumn_datetime_difference_to_be_less_than_two_months",
        start_datetime="s", end_datetime="e")).results[0]
    # row1 1 month ok; row2 exactly 2 months same day ok; row3 2mo +5d bad;
    # row4 null -> True (contrib)
    assert r.result["unexpected_count"] == 1


def test_follow_rule(ray_session):
    rule = {"ranges": {"a": [0, 2], "b": [2, 4]}, "expr": "int(a) < int(b)"}
    r = _run(["1299", "9912", "0105", None],
             "expect_column_values_to_follow_rule", rule=rule)
    assert r.result["unexpected_count"] == 1  # 9912: 99 < 12 false


def test_present_in_other_table(ray_session):
    first = rd.from_arrow(pa.table({"fk": [1, 2, 5]}))
    other = rd.from_arrow(pa.table({"pk": [1, 2, 3]}))
    suite = ExpectationSuite("pio").add(
        "expect_column_values_to_be_present_in_other_table",
        template_dict={"foreign_key_column": "fk", "foreign_table": "dim",
                       "foreign_table_key_column": "pk"})
    r = validate(first, suite, other_tables={"dim": other}).results[0]
    assert not r.success
    assert r.result["unexpected_index_list"] == [5]
    ok = validate(rd.from_arrow(pa.table({"fk": [1, 2]})), suite,
                  other_tables={"dim": other}).results[0]
    assert ok.success


# --------------------------------------------------------------------------- #
# review regression tests (round-3 session-2 findings)
# --------------------------------------------------------------------------- #


def test_two_phase_phase1_error_is_not_overwritten(ray_session):
    # a two-phase rule whose phase-1 agg fails (string column) must surface
    # the failure, not a vacuous empty-map success
    r = _run(["x", "y"], "expect_column_values_to_not_be_outliers",
             method="iqr", multiplier=1.5)
    assert not r.success
    assert (r.exception_info or {}).get("raised_exception")


def test_table_checksum_ignore_columns_comma_string(ray_session):
    # contrib contract: ignore_columns is a comma-separated string
    t1 = pa.table({"id": [1, 2], "v": ["a", "b"]})
    t3 = pa.table({"id": [9, 8], "v": ["a", "b"]})
    suite = ExpectationSuite("cks").add(
        "expect_table_checksum_to_equal_other_table", other_table_name="o",
        ignore_columns="id")
    r = validate(rd.from_arrow(t1), suite,
                 other_tables={"o": rd.from_arrow(t3)}).results[0]
    assert r.success, r.to_json_dict()


def test_day_count_weeks_back(ray_session):
    # weeks_back=2: only 7/14 days back count; 21/28-day dates absent is fine
    days = ["2024-03-01"] * 3 + ["2024-02-23"] * 3 + ["2024-02-16"] * 3
    ds = rd.from_arrow(pa.table({"d": days}))
    r = validate(ds, ExpectationSuite("wb").add(
        "expect_day_count_to_be_close_to_equivalent_week_day_mean",
        column="d", run_date="2024-03-01", threshold=0.25,
        weeks_back=2)).results[0]
    assert r.success, r.to_json_dict()


def test_not_null_and_not_empty(ray_session):
    # non-empty, no nulls -> pass (contrib example "not_null_values")
    ok = _run(["test", "foo", "for", "bar", "boo"],
              "expect_column_values_to_not_be_null_and_column_to_not_be_empty")
    assert ok.success

    # has a null -> fail, null value is the unexpected one
    r = _run(["test", "foo", None],
             "expect_column_values_to_not_be_null_and_column_to_not_be_empty")
    assert not r.success
    assert r.result["unexpected_count"] == 1

    # EMPTY column -> fail (the delta vs expect_column_values_to_not_be_null,
    # which is vacuous-true on empty tables)
    empty = rd.from_arrow(pa.table({"c": pa.array([], type=pa.string())}))
    suite = ExpectationSuite("ct").add(
        "expect_column_values_to_not_be_null_and_column_to_not_be_empty",
        column="c")
    r_empty = validate(empty, suite).results[0]
    assert not r_empty.success
    # ... while the plain not_be_null stays vacuous-true on the same input
    base = validate(empty, ExpectationSuite("ct2").add(
        "expect_column_values_to_not_be_null", column="c")).results[0]
    assert base.success
