"""Prescriptive rendering (pipelines/prescriptive.py) and its Data Docs
integration."""

from __future__ import annotations

from great_expectations_ray.pipelines.prescriptive import describe


def test_between_variants():
    assert describe("expect_column_values_to_be_between",
                    {"column": "qty", "min_value": 1, "max_value": 50}) \
        == "values of qty must be between 1 and 50."
    assert describe("expect_column_values_to_be_between",
                    {"column": "qty", "min_value": 1}) \
        == "values of qty must be at least 1."
    assert describe("expect_table_row_count_to_be_between",
                    {"min_value": 10, "max_value": 10}) \
        == "the row count must equal 10."


def test_mostly_and_row_condition_clauses():
    assert describe(
        "expect_column_values_to_not_be_null",
        {"column": "x", "mostly": 0.95},
    ) == "values of x must not be null, at least 95% of the time."
    s = describe(
        "expect_column_values_to_match_regex",
        {"column": "s", "regex": "^a", "row_condition": 'col("t") > 5'},
    )
    assert s.endswith('if col("t") > 5.')


def test_unknown_type_falls_back():
    s = describe("expect_custom_thing", {"column": "c", "_internal": 1})
    assert "expect_custom_thing" in s
    assert "_internal" not in s


def test_every_registered_expectation_renders():
    from great_expectations_ray.functions.registry import (
        supported_expectation_types,
    )

    for t in supported_expectation_types():
        s = describe(t, {"column": "c", "column_list": ["a", "b"],
                         "column_A": "a", "column_B": "b"})
        assert isinstance(s, str) and s.endswith(".")


def test_docs_pages_contain_prescriptive_text():
    from great_expectations_ray.pipelines.data_docs import render_suite_page

    html = render_suite_page({
        "name": "s",
        "expectations": [{
            "expectation_type": "expect_column_values_to_be_between",
            "kwargs": {"column": "qty", "min_value": 1, "max_value": 50},
        }],
    })
    assert "values of qty must be between 1 and 50." in html
