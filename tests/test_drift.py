"""Profile drift detection (pipelines/drift.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from great_expectations_ray.pipelines.drift import detect_drift, drift_report
from great_expectations_ray.pipelines.profiler import profile


def _ds(vals, cats, nulls=0):
    import ray.data as rd

    v = list(vals) + [None] * nulls
    c = list(cats) + [None] * nulls
    return rd.from_arrow(pa.table({
        "num": pa.array(v, pa.float64()),
        "cat": pa.array(c, pa.string()),
    })).repartition(2)


def test_no_drift_on_identical_data(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.normal(10, 2, 1000)
    cats = ["abc"[i] for i in rng.integers(0, 3, 1000)]
    rep = detect_drift(_ds(vals, cats), _ds(vals, cats))
    assert not rep["drifted"], rep


def test_mean_shift_and_range_flagged(ray_session):
    rng = np.random.default_rng(4)
    base = rng.normal(10, 2, 1000)
    cur = base + 30  # huge shift + expanded range
    cats = ["a"] * 1000
    rep = detect_drift(_ds(base, cats), _ds(cur, cats))
    col = {c["column"]: c for c in rep["columns"]}["num"]
    assert "mean_shift" in col["flags"]
    assert "range" in col["flags"]
    assert rep["drifted"]


def test_null_rate_and_value_set_flagged(ray_session):
    rng = np.random.default_rng(5)
    vals = rng.normal(0, 1, 500)
    base = _ds(vals, ["a"] * 500)
    cur = _ds(vals, ["z"] * 500, nulls=100)  # new category + 17% nulls
    rep = detect_drift(base, cur)
    col = {c["column"]: c for c in rep["columns"]}
    assert "value_set" in col["cat"]["flags"]
    assert "null_rate" in col["num"]["flags"]


def test_schema_changes_reported(ray_session):
    import ray.data as rd

    a = profile(rd.from_arrow(pa.table({"x": [1, 2], "y": [1, 2]})))
    b = profile(rd.from_arrow(pa.table({"x": [1, 2], "z": [1, 2]})))
    rep = drift_report(a, b)
    assert rep["schema_changes"] == {"added": ["z"], "removed": ["y"]}
    assert rep["drifted"]
