"""Stores + registry introspection + hypothesis differential testing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from great_expectations_ray import ExpectationSuite, validate
from great_expectations_ray.functions.registry import (
    list_expectations,
    supported_expectation_types,
)
from great_expectations_ray.state.stores import ExpectationsStore, ValidationResultsStore


def test_stores_roundtrip(tmp_path):
    es = ExpectationsStore(str(tmp_path))
    suite = ExpectationSuite("s1").add(
        "expect_column_values_to_be_between", column="x", min_value=0
    )
    es.save(suite)
    loaded = es.load("s1")
    assert loaded.to_json_dict() == suite.to_json_dict()
    assert es.list_suites() == ["s1"]
    es.delete("s1")
    assert es.list_suites() == []


def test_results_store_roundtrip(tmp_path, fixture_ds):
    suite = ExpectationSuite("rs").add("expect_table_row_count_to_equal", value=100)
    res = validate(fixture_ds, suite)
    vs = ValidationResultsStore(str(tmp_path))
    vs.save(res, run_name="r1", run_time=1000.0, batch_id="b0")
    loaded = vs.load("rs", "r1", 1000.0, "b0")
    assert loaded["success"] is True
    assert vs.list_keys() == [("rs", "r1-1000", "b0")]


def test_registry_listing():
    fams = list_expectations()
    all_types = supported_expectation_types()
    assert len(all_types) >= 55
    assert "expect_column_values_to_match_regex" in fams["map (fused vectorized pass)"]
    assert "expect_column_mean_to_be_between" in fams["aggregate (associative partials)"]
    # no type appears in two executable families (stubs excluded)
    seen = []
    for fam, types in fams.items():
        if "stub" in fam:
            continue
        seen.extend(types)
    dupes = {t for t in seen if seen.count(t) > 1}
    # of_type/in_type_list intentionally appear as table rules only
    assert not dupes, dupes


# --------------------------------------------------------------------------- #
# hypothesis differential tests: engine vs pandas oracle on random inputs
# --------------------------------------------------------------------------- #

ints_with_nulls = st.lists(
    st.one_of(st.integers(-50, 50), st.none()), min_size=0, max_size=80
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=ints_with_nulls, lo=st.integers(-40, 0), hi=st.integers(0, 40),
       mostly=st.floats(0.1, 1.0))
def test_between_matches_pandas_oracle(data, lo, hi, mostly):
    import ray.data as rd

    tbl = pa.table({"x": pa.array(data, pa.int64())})
    ds = rd.from_arrow(tbl).repartition(3) if len(data) else rd.from_arrow(tbl)
    r = validate(ds, ExpectationSuite("h").add(
        "expect_column_values_to_be_between", column="x",
        min_value=lo, max_value=hi, mostly=mostly,
    )).results[0]

    s = pd.Series(data, dtype="Int64")
    nonnull = int(s.notna().sum())
    meets = s.ge(lo) & s.le(hi)
    unexpected = int((s.notna() & ~meets.fillna(False)).sum())
    assert r.result["unexpected_count"] == unexpected
    assert r.result["element_count"] == len(data)
    if len(data) == 0 or nonnull == 0:
        assert r.success  # vacuous
    else:
        assert r.success == ((nonnull - unexpected) / nonnull >= mostly)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.lists(st.sampled_from(["a", "b", "ab", "zz", None]),
                     min_size=1, max_size=60),
       rx=st.sampled_from(["a", "b", "^a", "b$", "a|z"]))
def test_regex_matches_pandas_oracle(data, rx):
    import re

    import ray.data as rd

    tbl = pa.table({"x": pa.array(data, pa.string())})
    ds = rd.from_arrow(tbl).repartition(2)
    r = validate(ds, ExpectationSuite("h").add(
        "expect_column_values_to_match_regex", column="x", regex=rx,
    )).results[0]

    pat = re.compile(rx)
    unexpected = sum(1 for v in data if v is not None and not pat.search(v))
    assert r.result["unexpected_count"] == unexpected


def test_validate_many_concurrent():
    import ray.data as rd

    from great_expectations_ray.pipelines.multi_table import validate_many

    base = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    splits = base.split(10, equal=True)  # guaranteed non-empty shards
    tables = {f"t{i}": s for i, s in enumerate(splits)}
    suite = (
        ExpectationSuite("mt")
        .add("expect_column_values_to_be_between", column="l_quantity",
             min_value=1, max_value=50)
        .add("expect_column_values_to_not_be_null", column="l_orderkey")
        .add("expect_column_mean_to_be_between", column="l_discount",
             min_value=0, max_value=0.2)
    )
    results = validate_many(tables, suite, max_workers=5)
    assert len(results) == 10
    assert all(r.success for r in results.values())
    total = sum(r.meta["row_count"] for r in results.values())
    assert total == 6000


def test_empty_dataset_agg_rules_fail_gracefully():
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    suite = (
        ExpectationSuite("e")
        .add("expect_column_mean_to_be_between", column="x", min_value=0)
        .add("expect_column_unique_value_count_to_be_between", column="x", min_value=1)
        .add("expect_column_values_to_be_unique", column="x")
    )
    res = validate(empty, suite)
    # aggregates on empty tables: None metric -> clean failure, no exception
    assert not res.results[0].success
    assert not res.results[0].exception_info["raised_exception"]
    assert res.results[0].result["observed_value"] is None
    assert not res.results[1].success  # 0 distinct < 1
    assert res.results[2].success      # vacuous: no rows to duplicate


# ---- suite-parameter expression mini-language ----------------------------- #

def test_suite_parameter_expressions():
    from great_expectations_ray.core.suite_parameters import (
        SuiteParameterError,
        parse_suite_parameter,
    )

    p = {"x": 4, "min": 2.5, "threshold": 10}
    assert parse_suite_parameter("x", p) == 4
    assert parse_suite_parameter("x * 3", p) == 12
    assert parse_suite_parameter("x + min", p) == 6.5
    assert parse_suite_parameter("(x + 2) / 3", p) == 2.0
    assert parse_suite_parameter("2 ^ x", p) == 16.0
    assert parse_suite_parameter("2 ^ 3 ^ 2", p) == 512.0        # right-assoc
    assert parse_suite_parameter("-x + 1", p) == -3
    assert parse_suite_parameter("trunc(x / 3)", p) == 1
    assert parse_suite_parameter("round(min)", p) == 2
    assert parse_suite_parameter("abs(0 - x)", p) == 4
    assert parse_suite_parameter("sgn(0 - x)", p) == -1
    assert abs(parse_suite_parameter("PI", p) - 3.14159265) < 1e-6
    # plain lookup preserves non-numeric values
    assert parse_suite_parameter("name", {"name": "hello"}) == "hello"
    for bad in ("x *", "nosuch + 1", "x + (2", ""):
        import pytest as _pytest

        with _pytest.raises(SuiteParameterError):
            parse_suite_parameter(bad, p)


def test_suite_parameter_expression_in_validate():
    """Conformance: {"$PARAMETER": "x * 3"} resolves before compilation
    (reference core/suite_parameters.py:66+ grammar)."""
    import ray.data as rd

    from great_expectations_ray import ExpectationSuite, validate

    ds = rd.from_items([{"v": i} for i in range(10)])  # 0..9
    suite = ExpectationSuite(
        "params",
        suite_parameters={"x": 3},
    ).add(
        "expect_column_values_to_be_between",
        column="v", min_value=0, max_value={"$PARAMETER": "x * 3"},
    )
    res = validate(ds, suite)
    assert res.success  # max 9 <= 3*3
    suite.suite_parameters["x"] = 2
    assert not validate(ds, suite).success  # 9 > 6


# ---- expectation diagnostics harness -------------------------------------- #

def test_run_diagnostics_builtin_passes():
    from great_expectations_ray.core.diagnostics import run_diagnostics

    examples = [{
        "data": {"x": [1, 2, 3, 10, None]},
        "tests": [
            {"title": "in_range", "in": {"column": "x", "min_value": 0, "max_value": 20},
             "out": {"success": True, "unexpected_list": []}},
            {"title": "out_of_range", "in": {"column": "x", "min_value": 0, "max_value": 5},
             "out": {"success": False, "unexpected_list": [10]}},
        ],
    }]
    diag = run_diagnostics("expect_column_values_to_be_between", examples)
    assert diag.success, diag.generate_checklist()
    text = diag.generate_checklist()
    assert "✔" in text and "expect_column_values_to_be_between" in text


def test_run_diagnostics_catches_wrong_logic():
    from great_expectations_ray.core.diagnostics import run_diagnostics
    from great_expectations_ray.functions.column_map import (
        CONDITION_KERNELS,
        register_condition,
    )

    @register_condition("expect_diag_always_true")
    def _always_true(tbl, kwargs):
        """Custom diagnostic probe: everything passes (deliberately wrong)."""
        import numpy as np

        from great_expectations_ray.functions.column_map import KernelResult

        col = tbl.column(kwargs["column"])
        n = len(col)
        return KernelResult(
            values=col.combine_chunks(),
            considered=np.ones(n, dtype=bool),
            meets=np.ones(n, dtype=bool),
            null_count=0,
        )

    try:
        examples = [{
            "data": {"x": [1, 2]},
            "tests": [
                {"title": "pos", "in": {"column": "x"}, "out": {"success": True}},
                {"title": "neg_should_fail", "in": {"column": "x"},
                 "out": {"success": False}},  # impl can't fail -> logic check trips
            ],
        }]
        diag = run_diagnostics("expect_diag_always_true", examples)
        assert not diag.success
        failing = [c.check for c in diag.checks if not c.passed]
        assert "All example cases pass on the Ray engine" in failing
    finally:
        CONDITION_KERNELS.pop("expect_diag_always_true", None)


def test_run_diagnostics_unregistered():
    from great_expectations_ray.core.diagnostics import run_diagnostics

    diag = run_diagnostics("expect_totally_unknown")
    assert not diag.success
    assert len(diag.checks) == 1


def test_tuple_store_backend_uri_roundtrip(tmp_path):
    """Stores accept Arrow-filesystem URIs (tuple_store_backend.py family);
    file:// exercises the same code path S3/GCS would take."""
    from great_expectations_ray import ExpectationSuite
    from great_expectations_ray.state.stores import (
        ExpectationsStore,
        ValidationResultsStore,
    )

    uri = f"file://{tmp_path}"
    es = ExpectationsStore(uri)
    s = ExpectationSuite("uri_suite").add(
        "expect_column_values_to_not_be_null", column="x")
    es.save(s)
    assert es.list_suites() == ["uri_suite"]
    loaded = es.load("uri_suite")
    assert loaded.expectations[0].expectation_type == "expect_column_values_to_not_be_null"
    es.delete("uri_suite")
    assert es.list_suites() == []

    vs = ValidationResultsStore(uri)
    vs.save({"suite_name": "s1", "success": True, "rollup": []},
            run_name="r", run_time=5.0, batch_id="b")
    assert vs.list_keys() == [("s1", "r-5", "b")]
    assert vs.load("s1", "r", 5.0, "b")["success"] is True
