"""Population Stability Index — THE standard production drift metric
(credit-risk lineage; the binned relative-entropy check every model
monitor runs between a baseline and a current population).

Distributed shape:

1. Bin edges = exact deciles of the BASELINE column via iterative rank
   selection (``functions/quantiles.py`` — streaming count passes, exact
   at any cardinality, no collection).
2. One streaming pass per side: ``np.searchsorted(edges, x, 'left')``
   (= #edges < x, the same predicate the SQL oracle writes as
   ``(x > e1) + (x > e2) + …``) → per-batch ``np.bincount`` partials →
   a bins-sized driver fold.
3. Per-bin PSI term from Laplace-smoothed integer counts:
   ``(c/n' - d/m') * ln((c·m')/(d·n'))`` with ``c = cnt+1``,
   ``n' = n+bins`` — all inputs exact integers, every double op in a
   fixed order, so the oracle reproduces each term bit-for-bit.

The TOTAL PSI is the sum of the terms (returned in ``attrs['psi']``);
the gate compares the per-bin terms, which are order-free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _bin_counts(ds, column: str, edges: np.ndarray, bins: int) -> np.ndarray:
    def partial(tbl: pa.Table) -> pa.Table:
        x = np.asarray(
            pc.drop_null(pc.cast(tbl.column(column), pa.float64()))
            .combine_chunks())
        b = np.searchsorted(edges, x, side="left")
        return pa.table({
            "bin": pa.array(np.arange(bins, dtype=np.int64)),
            "cnt": pa.array(np.bincount(b, minlength=bins).astype(np.int64)),
        })

    total = np.zeros(bins, dtype=np.int64)
    for r in ds.select_columns([column]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True).take_all():
        total[r["bin"]] += r["cnt"]
    return total


def psi_bins(baseline_ds, current_ds, column: str, *,
             bins: int = 10) -> pd.DataFrame:
    """(bin, base_cnt, cur_cnt, term) with ``attrs['psi']`` = sum of terms
    and ``attrs['edges']`` = the baseline decile edges.

    Both sides are projected to the one column and materialized up front —
    the edge search re-reads the data ~`log2(range)` (integer values) or
    ~60 (general floats) times, and each pass must not re-run the upstream
    pipeline."""
    from great_expectations_ray.functions.quantiles import rank_select_values

    base_proj = baseline_ds.select_columns([column]).materialize()
    cur_proj = current_ds.select_columns([column]).materialize()

    # one pass: count, min/max, and integrality of the baseline column
    def probe(tbl: pa.Table) -> pa.Table:
        x = np.asarray(
            pc.drop_null(pc.cast(tbl.column(column), pa.float64()))
            .combine_chunks())
        return pa.table({
            "n": pa.array([len(x)]),
            "mn": pa.array([float(x.min()) if len(x) else np.inf]),
            "mx": pa.array([float(x.max()) if len(x) else -np.inf]),
            "ints": pa.array([bool(len(x) == 0
                                   or np.all(x == np.rint(x)))]),
        })

    n = 0
    vmin, vmax = np.inf, -np.inf
    integral = True
    for r in base_proj.map_batches(probe, batch_format="pyarrow",
                                   zero_copy_batch=True).take_all():
        n += r["n"]
        vmin, vmax = min(vmin, r["mn"]), max(vmax, r["mx"])
        integral = integral and r["ints"]

    if n < bins:
        raise ValueError(
            f"psi_bins: baseline column {column!r} has only {n} non-null "
            f"values — need at least bins={bins} to place decile edges")
    qs = [i / bins for i in range(1, bins)]
    targets = np.array([int(np.floor(q * (n - 1))) for q in qs],
                       dtype=np.int64)
    edges = np.asarray(
        rank_select_values(base_proj, column, targets,
                           bounds=(vmin, vmax), integral=integral),
        dtype=np.float64)

    base = _bin_counts(base_proj, column, edges, bins)
    cur = _bin_counts(cur_proj, column, edges, bins)

    c = (base + 1).astype(np.float64)
    d = (cur + 1).astype(np.float64)
    n_ = float(base.sum() + bins)
    m_ = float(cur.sum() + bins)
    # fixed-order double expression — mirrored verbatim in the SQL oracle.
    # ln() itself differs from DuckDB's by 1 ulp on some inputs (different
    # libm paths), so the term is rounded to 12 dp on BOTH sides; terms are
    # O(1e-3), so 8+ significant digits survive and a last-ulp input can't
    # move a 1e-12 boundary on the fixed test inputs (verified at all SFs).
    term = np.round((c / n_ - d / m_) * np.log((c * m_) / (d * n_)), 12)

    out = pd.DataFrame({
        "bin": np.arange(bins, dtype=np.int64),
        "base_cnt": base,
        "cur_cnt": cur,
        "term": term,
    })
    out.attrs["psi"] = float(term.sum())
    out.attrs["edges"] = edges
    return out
