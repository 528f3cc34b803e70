"""Conformance corpus — mirrors the reference's JSON test-definition format
(``tests/test_definitions/*``, SURVEY §5): inline toy data + kwargs +
expected outputs, executed through the public validate() path.

Each case: (expectation_type, data dict, kwargs, expected fields).
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from great_expectations_ray import ExpectationSuite, validate

# --------------------------------------------------------------------------- #
# corpus
# --------------------------------------------------------------------------- #

CASES = [
    # --- LIKE patterns (native here; SQL-only in reference pandas path) ----
    dict(t="expect_column_values_to_match_like_pattern",
         data={"c": ["cat", "car", "dog", None]},
         kwargs={"column": "c", "like_pattern": "ca%"},
         out={"success": False, "unexpected_count": 1, "missing_count": 1}),
    dict(t="expect_column_values_to_not_match_like_pattern",
         data={"c": ["cat", "car", "dog"]},
         kwargs={"column": "c", "like_pattern": "ca_"},
         out={"success": False, "unexpected_count": 2}),
    dict(t="expect_column_values_to_match_like_pattern_list",
         data={"c": ["cat", "dog", "rat"]},
         kwargs={"column": "c", "like_pattern_list": ["ca%", "do%"], "match_on": "any"},
         out={"unexpected_count": 1}),
    dict(t="expect_column_values_to_not_match_like_pattern_list",
         data={"c": ["cat", "dog", "rat"]},
         kwargs={"column": "c", "like_pattern_list": ["ca%", "do%"]},
         out={"unexpected_count": 2}),
    # --- regex list any/all ------------------------------------------------
    dict(t="expect_column_values_to_match_regex_list",
         data={"c": ["ab", "ax", "bx", "zz"]},
         kwargs={"column": "c", "regex_list": ["a", "b"], "match_on": "any"},
         out={"unexpected_count": 1}),
    dict(t="expect_column_values_to_match_regex_list",
         data={"c": ["ab", "ax", "bx", "zz"]},
         kwargs={"column": "c", "regex_list": ["a", "b"], "match_on": "all"},
         out={"unexpected_count": 3}),
    dict(t="expect_column_values_to_not_match_regex_list",
         data={"c": ["ab", "ax", "zz"]},
         kwargs={"column": "c", "regex_list": ["a", "b"]},
         out={"unexpected_count": 2}),
    # --- strftime / dateutil ----------------------------------------------
    dict(t="expect_column_values_to_match_strftime_format",
         data={"c": ["2024-01-02", "2024-13-40", "not a date", None]},
         kwargs={"column": "c", "strftime_format": "%Y-%m-%d"},
         out={"unexpected_count": 2, "missing_count": 1}),
    dict(t="expect_column_values_to_be_dateutil_parseable",
         data={"c": ["2024-01-02", "Jan 5 2020", "xyzzy"]},
         kwargs={"column": "c"},
         out={"unexpected_count": 1}),
    # --- pair in set / pair equal with ignore policies ---------------------
    dict(t="expect_column_pair_values_to_be_in_set",
         data={"a": [1, 1, 2, None], "b": [1, 2, 2, None]},
         kwargs={"column_A": "a", "column_B": "b",
                 "value_pairs_set": [[1, 1], [2, 2]]},
         out={"unexpected_count": 1}),  # (1,2); (None,None) ignored (both missing)
    dict(t="expect_column_pair_values_to_be_equal",
         data={"a": [1, None, 2], "b": [1, 5, None]},
         kwargs={"column_A": "a", "column_B": "b", "ignore_row_if": "either_value_is_missing"},
         out={"success": True, "unexpected_count": 0}),
    # --- value length equal / between strict -------------------------------
    dict(t="expect_column_value_lengths_to_equal",
         data={"c": ["aa", "bbb", "cc"]},
         kwargs={"column": "c", "value": 2},
         out={"unexpected_count": 1}),
    dict(t="expect_column_value_lengths_to_be_between",
         data={"c": ["a", "aa", "aaa"]},
         kwargs={"column": "c", "min_value": 1, "max_value": 3,
                 "strict_min": True, "strict_max": True},
         out={"unexpected_count": 2}),
    # --- z-score single-sided ----------------------------------------------
    dict(t="expect_column_value_z_scores_to_be_less_than",
         data={"c": [1.0, 1.0, 1.0, 1.0, 100.0]},
         kwargs={"column": "c", "threshold": 1.0, "double_sided": False},
         out={"unexpected_count": 1}),
    # --- set membership with mostly ---------------------------------------
    dict(t="expect_column_values_to_be_in_set",
         data={"c": ["x", "x", "x", "y"]},
         kwargs={"column": "c", "value_set": ["x"], "mostly": 0.75},
         out={"success": True, "unexpected_count": 1}),
    # --- multicolumn sum / unique-within-record with nulls ------------------
    dict(t="expect_multicolumn_sum_to_equal",
         data={"a": [1, 2], "b": [2, 2], "c2": [3, 3]},
         kwargs={"column_list": ["a", "b", "c2"], "sum_total": 6},
         out={"success": False, "unexpected_count": 1}),
    # --- null rules on mixed columns ---------------------------------------
    dict(t="expect_column_values_to_be_null",
         data={"c": [None, None, "x"]},
         kwargs={"column": "c", "mostly": 0.5},
         out={"success": True, "unexpected_count": 1}),
    # --- between with datetime-string bounds -------------------------------
    dict(t="expect_column_values_to_be_between",
         data={"c": pa.array([1577836800000000, 1609459200000000, 1640995200000000],
                             pa.timestamp("us"))},
         kwargs={"column": "c", "min_value": "2020-06-01", "max_value": "2022-06-01"},
         out={"unexpected_count": 1}),  # 2020-01-01 below the string bound
]


def _ds_from(data: dict):
    import ray.data as rd

    cols = {}
    for k, v in data.items():
        cols[k] = v if isinstance(v, pa.Array) else pa.array(v)
    return rd.from_arrow(pa.table(cols)).repartition(2)


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"{c['t']}-{list(c['kwargs'].values())[1:2]}")
def test_conformance_case(case):
    ds = _ds_from(case["data"])
    suite = ExpectationSuite("conf").add(case["t"], **case["kwargs"])
    r = validate(ds, suite).results[0]
    assert not r.exception_info["raised_exception"], r.exception_info
    for field, expected in case["out"].items():
        if field == "success":
            assert r.success == expected, r.to_json_dict()
        else:
            assert r.result.get(field) == expected, (field, r.to_json_dict())


def test_match_json_schema():
    ds = _ds_from({"c": ['{"a": 1}', '{"a": "no"}', "broken", None]})
    suite = ExpectationSuite("js").add(
        "expect_column_values_to_match_json_schema",
        column="c",
        json_schema={"type": "object", "properties": {"a": {"type": "integer"}},
                     "required": ["a"]},
    )
    r = validate(ds, suite).results[0]
    assert r.result["unexpected_count"] == 2
    assert r.result["missing_count"] == 1
