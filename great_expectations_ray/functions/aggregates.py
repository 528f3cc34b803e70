"""Aggregate metric partials — associative per-block accumulators.

The Ray analog of the reference's ``AGGREGATE_FN`` bundling
(``execution_engine.py:372-469``; Spark single ``df.agg(*aggs)`` trip at
``sparkdf_execution_engine.py:843-915``): ALL aggregate metrics of a suite are
updated from the SAME fused ``map_batches`` pass, one small partial per block,
merged associatively on the driver.

Variance uses Chan/Welford parallel moment combination so stdev(ddof=1)
matches pandas ``Series.std()`` (``column_standard_deviation.py:38``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class NumericAggState:
    """count / sum / min / max / mean / M2 for one numeric column."""

    n: int = 0  # nonnull count
    total: int = 0  # all rows incl. null
    sum: float = 0.0
    min: Any = None
    max: Any = None
    mean: float = 0.0
    m2: float = 0.0

    def update(self, col: pa.ChunkedArray) -> None:
        self.total += len(col)
        vals = np.asarray(pc.drop_null(pc.cast(col, pa.float64())).combine_chunks())
        if len(vals) == 0:
            return
        b_n = len(vals)
        b_mean = float(vals.mean())
        b_m2 = float(((vals - b_mean) ** 2).sum())
        b_min, b_max = float(vals.min()), float(vals.max())
        self.sum += float(vals.sum())
        self.min = b_min if self.min is None else min(self.min, b_min)
        self.max = b_max if self.max is None else max(self.max, b_max)
        # Chan et al. pairwise combine
        if self.n == 0:
            self.n, self.mean, self.m2 = b_n, b_mean, b_m2
        else:
            delta = b_mean - self.mean
            tot = self.n + b_n
            self.mean += delta * b_n / tot
            self.m2 += b_m2 + delta * delta * self.n * b_n / tot
            self.n = tot

    def merge(self, o: "NumericAggState") -> "NumericAggState":
        self.total += o.total
        self.sum += o.sum
        if o.min is not None:
            self.min = o.min if self.min is None else min(self.min, o.min)
        if o.max is not None:
            self.max = o.max if self.max is None else max(self.max, o.max)
        if o.n:
            if self.n == 0:
                self.n, self.mean, self.m2 = o.n, o.mean, o.m2
            else:
                delta = o.mean - self.mean
                tot = self.n + o.n
                self.mean += delta * o.n / tot
                self.m2 += o.m2 + delta * delta * self.n * o.n / tot
                self.n = tot
        return self

    # ---- finalized metrics ------------------------------------------------ #
    def metric(self, name: str) -> Optional[float]:
        if name == "column.mean":
            return self.mean if self.n else None
        if name == "column.sum":
            return self.sum if self.n else None
        if name == "column.min":
            return self.min
        if name == "column.max":
            return self.max
        if name == "column.standard_deviation":
            # sample stdev, ddof=1 (pandas default)
            return math.sqrt(self.m2 / (self.n - 1)) if self.n > 1 else None
        if name == "column_values.nonnull.count":
            return self.n
        if name == "table.row_count":
            return self.total
        raise KeyError(name)


def validate_metric_value_between(
    metric_value: Any,
    min_value: Any = None,
    max_value: Any = None,
    strict_min: bool = False,
    strict_max: bool = False,
) -> bool:
    """Mirror of ``_validate_metric_value_between`` (``expectation.py:1587-1657``):
    ``None`` bound = unbounded; ``None``/NaN metric => failure; ``strict_*``
    toggles ``>``/``>=``; datetime-string bounds parsed with dateutil."""
    if metric_value is None:
        return False
    if isinstance(metric_value, float) and math.isnan(metric_value):
        return False

    def parse(b):
        if isinstance(b, str) and not isinstance(metric_value, str):
            from dateutil import parser as _p

            try:
                return _p.parse(b)
            except (ValueError, OverflowError):
                return b
        return b

    lo, hi = parse(min_value), parse(max_value)
    if lo is not None:
        if strict_min:
            if not metric_value > lo:
                return False
        elif not metric_value >= lo:
            return False
    if hi is not None:
        if strict_max:
            if not metric_value < hi:
                return False
        elif not metric_value <= hi:
            return False
    return True


#: aggregate expectation -> (metric name, needs-distinct flag)
AGG_EXPECTATIONS: dict[str, str] = {
    "expect_column_mean_to_be_between": "column.mean",
    "expect_column_sum_to_be_between": "column.sum",
    "expect_column_min_to_be_between": "column.min",
    "expect_column_max_to_be_between": "column.max",
    "expect_column_stdev_to_be_between": "column.standard_deviation",
}


@dataclass
class ValueCountsState:
    """Exact per-column value counts; backs distinct-set / most-common /
    unique-count expectations at suite scale.

    NOTE: held as a dict partial per block. This is appropriate for
    LOW-CARDINALITY columns (flags, categories, langs) — the reference's
    distinct-set expectations target exactly those. High-cardinality
    distinct counting should use the wide path (groupby) instead; the
    engine chooses based on a cap.
    """

    counts: dict = field(default_factory=dict)
    nonnull: int = 0
    overflow: bool = False
    CAP: int = 100_000

    def update(self, col: pa.ChunkedArray) -> None:
        vc = pc.value_counts(col.combine_chunks())
        vals, cnts = vc.field("values"), vc.field("counts")
        mask = pc.is_valid(vals)
        vals, cnts = vals.filter(mask), cnts.filter(mask)
        self.nonnull += int(pc.sum(pc.cast(cnts, pa.int64())).as_py() or 0)
        if self.overflow:
            return  # counts are unused once overflowed — engine reroutes to
            # the distributed groupby path; don't pay the dict work
        if len(vals) > self.CAP:
            self.overflow = True
            self.counts.clear()  # drop partial keys: no partial-pickle cost
            return
        # one C-level conversion, then dict updates (no per-item as_py)
        for v, c in zip(vals.to_pylist(), cnts.to_pylist()):
            if v in self.counts:
                self.counts[v] += c
            elif len(self.counts) < self.CAP:
                self.counts[v] = c
            else:
                self.overflow = True
        if self.overflow:
            self.counts.clear()

    def merge(self, o: "ValueCountsState") -> "ValueCountsState":
        self.nonnull += o.nonnull
        self.overflow |= o.overflow
        if self.overflow:
            self.counts.clear()
            return
        for v, c in o.counts.items():
            if v in self.counts:
                self.counts[v] += c
            elif len(self.counts) < self.CAP:
                self.counts[v] = c
            else:
                self.overflow = True
        if self.overflow:
            self.counts.clear()
        return self
