"""Fluent/interactive API — the reference's EP3 notebook path
(``batch.validate(expectation_or_suite)``, ``validator.expect_*``,
``validator.head()`` — SURVEY §3) over Ray Data.

    from great_expectations_ray.api import Batch
    b = Batch.from_parquet("data.parquet")
    b.head()
    b.expect("expect_column_values_to_not_be_null", column="id")   # one EVR
    b.validate(suite)                                              # suite result
"""

from __future__ import annotations

from typing import Any

from great_expectations_ray.core.suite import ExpectationConfiguration, ExpectationSuite
from great_expectations_ray.engine import validate as _validate


class Batch:
    """One logical table (SURVEY §1 Batch) wrapping a lazy Dataset."""

    def __init__(self, ds):
        self.ds = ds

    # ---- construction ----------------------------------------------------- #
    @classmethod
    def from_parquet(cls, path, **kwargs) -> "Batch":
        from great_expectations_ray.sources.readers import read_batch

        return cls(read_batch(path, **kwargs))

    @classmethod
    def from_memory(cls, data) -> "Batch":
        from great_expectations_ray.sources.readers import from_memory

        return cls(from_memory(data))

    # ---- table metrics (validator/metrics_calculator.py analogs) ---------- #
    def head(self, n: int = 5):
        """``table.head`` metric — small driver-side pandas frame."""
        import pandas as pd

        return pd.DataFrame(self.ds.take(n))

    @property
    def columns(self) -> list[str]:
        return list(self.ds.schema().names)

    def row_count(self) -> int:
        return self.ds.count()

    # ---- validation ------------------------------------------------------- #
    def expect(self, expectation_type: str, **kwargs):
        """Single-expectation interactive check -> one EVR (the
        ``validator.expect_*`` auto-method analog)."""
        suite = ExpectationSuite("interactive").add(expectation_type, **kwargs)
        res = _validate(self.ds, suite)
        return res.results[0]

    def validate(
        self,
        suite: ExpectationSuite | ExpectationConfiguration,
        **validate_kwargs: Any,
    ):
        if isinstance(suite, ExpectationConfiguration):
            s = ExpectationSuite("interactive", [suite])
        else:
            s = suite
        return _validate(self.ds, s, **validate_kwargs)
