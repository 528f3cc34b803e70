"""Prescriptive natural-language rendering of expectation configs.

The reference renders every expectation to a human sentence for Data Docs
("values must be between 1 and 50, at least 95 % of the time") via
``render/renderer/content_block/expectation_string.py`` and per-expectation
``_prescriptive_renderer`` methods; this is the same behavior as one
template table + a generic fallback."""

from __future__ import annotations

from typing import Any


import math as _math


def _fmt(v: Any) -> str:
    if isinstance(v, float) and _math.isfinite(v) and v == int(v):
        return str(int(v))
    if isinstance(v, (list, tuple, set)):
        return "[" + ", ".join(_fmt(x) for x in sorted(v, key=str)) + "]"
    return str(v)


def _between(kwargs: dict, what: str) -> str:
    lo, hi = kwargs.get("min_value"), kwargs.get("max_value")
    if lo is not None and hi is not None:
        if lo == hi:
            return f"{what} must equal {_fmt(lo)}"
        return f"{what} must be between {_fmt(lo)} and {_fmt(hi)}"
    if lo is not None:
        return f"{what} must be at least {_fmt(lo)}"
    if hi is not None:
        return f"{what} must be at most {_fmt(hi)}"
    return f"{what} may have any value"


def _col(kwargs: dict) -> str:
    return kwargs.get("column", "?")


_TEMPLATES = {
    "expect_column_values_to_be_null": lambda k: f"values of {_col(k)} must be null",
    "expect_column_values_to_not_be_null": lambda k: f"values of {_col(k)} must not be null",
    "expect_column_values_to_be_in_set": lambda k: f"values of {_col(k)} must belong to {_fmt(k.get('value_set', []))}",
    "expect_column_values_to_not_be_in_set": lambda k: f"values of {_col(k)} must not belong to {_fmt(k.get('value_set', []))}",
    "expect_column_values_to_be_between": lambda k: _between(k, f"values of {_col(k)}"),
    "expect_column_values_to_match_regex": lambda k: f"values of {_col(k)} must match the regular expression {k.get('regex')!r}",
    "expect_column_values_to_not_match_regex": lambda k: f"values of {_col(k)} must not match the regular expression {k.get('regex')!r}",
    "expect_column_value_lengths_to_be_between": lambda k: _between(k, f"lengths of {_col(k)} values"),
    "expect_column_value_lengths_to_equal": lambda k: f"lengths of {_col(k)} values must equal {_fmt(k.get('value'))}",
    "expect_column_values_to_match_strftime_format": lambda k: f"values of {_col(k)} must match the strftime format {k.get('strftime_format')!r}",
    "expect_column_values_to_be_json_parseable": lambda k: f"values of {_col(k)} must be parseable as JSON",
    "expect_column_values_to_match_json_schema": lambda k: f"values of {_col(k)} must conform to the given JSON schema",
    "expect_column_values_to_be_unique": lambda k: f"values of {_col(k)} must be unique",
    "expect_compound_columns_to_be_unique": lambda k: f"the column combination {_fmt(k.get('column_list', []))} must be unique",
    "expect_column_values_to_be_increasing": lambda k: f"values of {_col(k)} must be increasing",
    "expect_column_values_to_be_decreasing": lambda k: f"values of {_col(k)} must be decreasing",
    "expect_column_values_to_be_of_type": lambda k: f"values of {_col(k)} must be of type {k.get('type_')!r}",
    "expect_column_values_to_be_in_type_list": lambda k: f"values of {_col(k)} must be of one of the types {_fmt(k.get('type_list', []))}",
    "expect_column_value_z_scores_to_be_less_than": lambda k: f"z-scores of {_col(k)} must be less than {_fmt(k.get('threshold'))}",
    "expect_column_mean_to_be_between": lambda k: _between(k, f"the mean of {_col(k)}"),
    "expect_column_median_to_be_between": lambda k: _between(k, f"the median of {_col(k)}"),
    "expect_column_stdev_to_be_between": lambda k: _between(k, f"the standard deviation of {_col(k)}"),
    "expect_column_sum_to_be_between": lambda k: _between(k, f"the sum of {_col(k)}"),
    "expect_column_min_to_be_between": lambda k: _between(k, f"the minimum of {_col(k)}"),
    "expect_column_max_to_be_between": lambda k: _between(k, f"the maximum of {_col(k)}"),
    "expect_column_unique_value_count_to_be_between": lambda k: _between(k, f"the number of distinct values of {_col(k)}"),
    "expect_column_proportion_of_unique_values_to_be_between": lambda k: _between(k, f"the proportion of distinct values of {_col(k)}"),
    "expect_column_distinct_values_to_be_in_set": lambda k: f"distinct values of {_col(k)} must belong to {_fmt(k.get('value_set', []))}",
    "expect_column_distinct_values_to_contain_set": lambda k: f"distinct values of {_col(k)} must contain {_fmt(k.get('value_set', []))}",
    "expect_column_distinct_values_to_equal_set": lambda k: f"distinct values of {_col(k)} must equal {_fmt(k.get('value_set', []))}",
    "expect_column_most_common_value_to_be_in_set": lambda k: f"the most common value of {_col(k)} must belong to {_fmt(k.get('value_set', []))}",
    "expect_column_quantile_values_to_be_between": lambda k: f"quantiles of {_col(k)} must lie within the given ranges",
    "expect_column_kl_divergence_to_be_less_than": lambda k: f"the KL divergence of {_col(k)} from the given partition must be less than {_fmt(k.get('threshold'))}",
    "expect_column_chisquare_test_p_value_to_be_greater_than": lambda k: f"the chi-square test p-value of {_col(k)} must be greater than {_fmt(k.get('p', 0.05))}",
    "expect_column_parameterized_distribution_ks_test_p_value_to_be_greater_than": lambda k: f"the KS-test p-value of {_col(k)} against {k.get('distribution')} must be greater than {_fmt(k.get('p', 0.05))}",
    "expect_column_bootstrapped_ks_test_p_value_to_be_greater_than": lambda k: f"the bootstrapped KS-test p-value of {_col(k)} must be greater than {_fmt(k.get('p', 0.05))}",
    "expect_column_pair_cramers_phi_value_to_be_less_than": lambda k: f"Cramér's φ of {k.get('column_A')} vs {k.get('column_B')} must be less than {_fmt(k.get('threshold', 0.1))}",
    "expect_column_pair_values_to_be_equal": lambda k: f"values of {k.get('column_A')} must equal values of {k.get('column_B')}",
    "expect_column_pair_values_a_to_be_greater_than_b": lambda k: f"values of {k.get('column_A')} must be greater than values of {k.get('column_B')}",
    "expect_column_pair_values_to_be_in_set": lambda k: f"value pairs of ({k.get('column_A')}, {k.get('column_B')}) must belong to the given set",
    "expect_multicolumn_sum_to_equal": lambda k: f"the sum across {_fmt(k.get('column_list', []))} must equal {_fmt(k.get('sum_total'))}",
    "expect_select_column_values_to_be_unique_within_record": lambda k: f"values across {_fmt(k.get('column_list', []))} must be unique within each record",
    "expect_table_row_count_to_be_between": lambda k: _between(k, "the row count"),
    "expect_table_row_count_to_equal": lambda k: f"the row count must equal {_fmt(k.get('value'))}",
    "expect_table_row_count_to_equal_other_table": lambda k: f"the row count must equal that of table {k.get('other_table_name', 'other')!r}",
    "expect_table_column_count_to_be_between": lambda k: _between(k, "the column count"),
    "expect_table_column_count_to_equal": lambda k: f"the column count must equal {_fmt(k.get('value'))}",
    "expect_table_columns_to_match_ordered_list": lambda k: f"columns must exactly match the ordered list {_fmt(k.get('column_list', []))}",
    "expect_table_columns_to_match_set": lambda k: f"columns must match the set {_fmt(k.get('column_set', []))}",
    "expect_column_to_exist": lambda k: f"column {_col(k)} must exist",
}


def describe(expectation_type: str, kwargs: dict) -> str:
    """One prescriptive sentence for an expectation configuration."""
    fn = _TEMPLATES.get(expectation_type)
    if fn is not None:
        text = fn(kwargs)
    else:
        # generic fallback, reference's behavior for unrenderable types
        clean = {k: v for k, v in kwargs.items() if not k.startswith("_")}
        text = f"{expectation_type}: {clean}"
    mostly = kwargs.get("mostly")
    if mostly is not None and mostly < 1:
        text += f", at least {round(float(mostly) * 100, 1):g}% of the time"
    cond = kwargs.get("row_condition")
    if cond:
        text += f", if {cond}"
    return text + "."
