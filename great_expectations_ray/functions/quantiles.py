"""Distributed exact quantiles for high-cardinality numeric columns.

The engine's default quantile path merges exact value counts (fine when
distinct values <= 100k).  Above that, collecting values is not an option at
corpus scale; instead we use **iterative rank selection**: binary-search the
value domain, counting ``<= mid`` with one streaming column-only pass per
iteration (~64 iterations, no shuffle, no driver materialization), then snap
to the actual data value.  Exact for any cardinality.

Invariant per target rank t (0-based): F(lo) < t+1 <= F(hi) where
F(v) = #values <= v.  The t-th order statistic is the unique data value in
(lo, hi] once the interval is below the data's float resolution; the final
pass takes the smallest data value strictly greater than lo.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _count_le_pass(ds, column: str, thresholds: np.ndarray) -> tuple[np.ndarray, int]:
    """One streaming pass: (#values <= t for each threshold, total nonnull)."""
    th = np.asarray(thresholds, dtype=np.float64)

    def partial(tbl: pa.Table) -> pa.Table:
        vals = np.asarray(
            pc.drop_null(pc.cast(tbl.column(column), pa.float64())).combine_chunks()
        )
        if len(vals):
            sv = np.sort(vals)
            counts = np.searchsorted(sv, th, side="right")
        else:
            counts = np.zeros(len(th), dtype=np.int64)
        return pa.table({
            "c": pa.array(counts.astype(np.int64)),
            "i": pa.array(np.arange(len(th), dtype=np.int64)),
            "n": pa.array(np.full(len(th), len(vals), dtype=np.int64)),
        })

    totals = np.zeros(len(th), dtype=np.int64)
    n = 0
    for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        totals[r["i"]] += r["c"]
        if r["i"] == 0:
            n += r["n"]
    return totals, n


def sampled_quantiles(
    ds,
    column: str,
    quantiles: list[float],
    *,
    relative_error: float = 0.01,
    interpolation: str = "lower",
    confidence_delta: float = 0.02,
) -> list:
    """Approximate quantiles with a bounded RANK error (the reference's
    ``allow_relative_error`` knob, SQL-only there): a deterministic
    evenly-spaced row sample of size ~ln(2/δ)/(2ε²) (DKW inequality) is
    collected in one pass and quantiled on the driver.  Two passes total
    (count + sample) vs ~66 for the exact rank-selection path."""
    import math

    n = ds.count()
    if n == 0:
        return [None] * len(quantiles)
    target = min(n, int(math.ceil(math.log(2.0 / confidence_delta) / (2 * relative_error**2))))
    rate = target / n

    def sample(tbl: pa.Table) -> pa.Table:
        vals = np.asarray(
            pc.drop_null(pc.cast(tbl.column(column), pa.float64())).combine_chunks()
        )
        k = int(math.ceil(len(vals) * rate))
        if k <= 0 or len(vals) == 0:
            return pa.table({"v": pa.array([], pa.float64())})
        idx = np.linspace(0, len(vals) - 1, num=k).astype(np.int64)
        return pa.table({"v": pa.array(vals[idx])})

    rows = ds.map_batches(sample, batch_format="pyarrow", zero_copy_batch=True).take_all()
    sv = np.sort(np.array([r["v"] for r in rows], dtype=np.float64))
    if len(sv) == 0:
        return [None] * len(quantiles)
    out = []
    for q in quantiles:
        x = q * (len(sv) - 1)
        if interpolation == "lower":
            i = int(np.floor(x))
        elif interpolation == "higher":
            i = int(np.ceil(x))
        else:
            i = int(np.round(x))
        out.append(float(sv[i]))
    return out


def rank_select_values(
    ds,
    column: str,
    targets: np.ndarray,
    *,
    max_iter: int = 64,
    bounds: tuple[float, float] | None = None,
    integral: bool = False,
) -> list:
    """Exact 0-based ascending order statistics at the given ranks, via the
    binary-searched rank selection described in the module docstring.
    ``bounds`` short-circuits the min/max pass when the caller already knows
    the value range.  ``integral=True`` (all values integer-valued) stops
    each search as soon as its interval is shorter than 1 — the half-open
    interval then contains exactly one integer, which the snap pass
    recovers — cutting ~60 count passes to ``log2(range)``."""
    if bounds is None:
        from ray.data.aggregate import Max, Min

        agg = ds.aggregate(Min(column), Max(column))
        vmin, vmax = agg[f"min({column})"], agg[f"max({column})"]
        if vmin is None:
            return [None] * len(targets)
        vmin, vmax = float(vmin), float(vmax)
    else:
        vmin, vmax = bounds
    targets = np.asarray(targets, dtype=np.int64)

    los = np.full(len(targets), np.nextafter(vmin, -np.inf))
    his = np.full(len(targets), vmax)
    for _ in range(max_iter):
        mids = (los + his) / 2
        counts, _ = _count_le_pass(ds, column, mids)
        go_down = counts >= targets + 1
        his = np.where(go_down, mids, his)
        los = np.where(go_down, los, mids)
        if np.all(np.nextafter(los, his) >= his):
            break
        if integral and np.all(his - los < 1.0):
            break

    # smallest data value strictly greater than lo == the target value
    def snap(tbl: pa.Table) -> pa.Table:
        vals = np.asarray(
            pc.drop_null(pc.cast(tbl.column(column), pa.float64())).combine_chunks()
        )
        out = np.full(len(los), np.inf)
        if len(vals):
            sv = np.sort(vals)
            idx = np.searchsorted(sv, los, side="right")
            ok = idx < len(sv)
            out[ok] = sv[idx[ok]]
        return pa.table({
            "v": pa.array(out), "i": pa.array(np.arange(len(los), dtype=np.int64))
        })

    best = np.full(len(los), np.inf)
    for r in ds.map_batches(snap, batch_format="pyarrow", zero_copy_batch=True).take_all():
        best[r["i"]] = min(best[r["i"]], r["v"])
    return [float(v) for v in best]


def exact_quantiles_distributed(
    ds,
    column: str,
    quantiles: list[float],
    *,
    interpolation: str = "lower",
    max_iter: int = 64,
) -> list:
    """Exact quantile values via binary-searched rank selection (rank index
    over q*(n-1), same definition as the engine's value-count path)."""
    _, n = _count_le_pass(ds, column, np.array([np.inf]))
    if n == 0:
        return [None] * len(quantiles)

    targets = []
    for q in quantiles:
        x = q * (n - 1)
        if interpolation == "lower":
            targets.append(int(np.floor(x)))
        elif interpolation == "higher":
            targets.append(int(np.ceil(x)))
        else:
            targets.append(int(np.round(x)))
    return rank_select_values(ds, column, np.asarray(targets, dtype=np.int64),
                              max_iter=max_iter)


def grouped_quantiles_disc(ds, *, group_cols, value_col, qs):
    """Per-group EXACT discrete quantiles (SQL ``quantile_disc``: the
    element at 1-based rank ceil(q*n) within the sorted group).

    Rank arithmetic is exact integer math via ``Fraction(str(q))`` — never
    ``ceil(q*n)`` in floats, where 0.95*20 == 19.000000000000004 would
    off-by-one the rank (DuckDB itself resolves ranks exactly; verified
    n=7..100).

    Scale shape: one bucketed ``groupby(group_cols)`` exchange
    (functions/bucketed.py — per-group overhead-free at high cardinality),
    then a single mergesort + vectorized rank gather per bucket.  For a
    quantile over the WHOLE table use the engine's VC/rank-selection paths
    instead; this is the per-group (per-language, per-repo) variant.

    Output columns: group_cols + ``p<percent>`` per requested q.
    """
    from fractions import Fraction

    import pandas as pd

    from great_expectations_ray.functions.bucketed import grouped_apply_bucketed

    group_cols = list(group_cols)
    fracs = [Fraction(str(q)) for q in qs]
    names = [f"p{str(q).replace('0.', '').ljust(2, '0')}" for q in qs]

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        # SQL aggregate semantics: NULL values are ignored by quantile_disc
        # but the GROUP itself survives (all-null group -> NULL quantiles)
        nn = g[g[value_col].notna()].sort_values(
            [*group_cols, value_col], kind="mergesort")
        sizes = nn.groupby(group_cols, sort=False, dropna=False).size()
        n = sizes.to_numpy()
        starts = np.concatenate(([0], np.cumsum(n)[:-1]))
        vals = nn[value_col].to_numpy()
        out = sizes.reset_index()[group_cols].copy()
        for frac, name in zip(fracs, names):
            # 1-based rank ceil(q*n) == -(-q.num*n // q.den), exact
            rank = -(-frac.numerator * n // frac.denominator)
            idx = starts + np.clip(rank - 1, 0, n - 1)
            out[name] = vals[idx]
        all_groups = g[group_cols].drop_duplicates()
        return all_groups.merge(out, on=group_cols, how="left")

    return grouped_apply_bucketed(
        ds.select_columns([*group_cols, value_col]), group_cols, bucket
    )
