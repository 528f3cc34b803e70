"""Exact top-fraction selection by score — "keep the best X% of the corpus
by classifier score", the final step of model-based quality filtering
(FineWeb-Edu-style: distill rules into a scorer, then keep the top slice).

Selecting the top N of 10^12 rows must not global-sort the corpus and must
not ship N candidates to the driver (N here is a FRACTION of the corpus,
not an ANN-style small k).  Instead:

1. Project ``(id, score)`` once and materialize the two tiny columns (the
   threshold search re-reads them, never the corpus).
2. Binary-search the score threshold ``t`` = the ``(n-N)``-th ascending
   order statistic via iterative rank selection
   (``functions.quantiles.rank_select_values`` — streaming count passes,
   no shuffle, exact at any cardinality).
3. Resolve boundary TIES deterministically: the ``N - #(score > t)`` tied
   rows with the smallest ids win — one more rank selection, over ids
   within the tie class.
4. One mark pass appends ``selected``.

Semantics are exactly ``ROW_NUMBER() OVER (ORDER BY score DESC, id ASC)
<= N`` — which is how the catalog oracles it in pure SQL.

A driver fast path (``n <= max_driver_rows``) computes the SAME
``(t, id_cut)`` pair with one numpy lexsort; both paths share the mark
pass, so verdicts are identical by construction (pinned in tests).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def frac_ceil(frac: float, n) -> "int | np.ndarray":
    """ceil(frac * n) under the DECIMAL reading of ``frac`` (what a SQL
    literal like 0.07 means): exact integer arithmetic via the shortest
    decimal representation, so double(0.07)*100 = 7.0000000000000009 can
    never round a quota up to 8.  Vectorizes over integer arrays."""
    f = Fraction(str(frac))
    num, den = f.numerator, f.denominator
    if isinstance(n, np.ndarray):
        return (num * n.astype(np.int64) + den - 1) // den
    return int((num * int(n) + den - 1) // den)


def _threshold_params_driver(ids: np.ndarray, scores: np.ndarray, N: int):
    """(t, id_cut) via one lexsort — the small-corpus path."""
    order = np.lexsort((ids, -scores))  # score DESC, id ASC
    t = float(scores[order[N - 1]])
    n_gt = int(np.sum(scores > t))
    need = N - n_gt
    if need <= 0:
        return t, None
    tie_ids = np.sort(ids[scores == t])
    return t, int(tie_ids[need - 1])


def select_top_fraction(
    ds,
    *,
    score_col: str,
    id_col: str,
    frac: float | None = None,
    top_n: int | None = None,
    max_driver_rows: int = 4_000_000,
    max_iter: int = 64,
):
    """Appends ``selected``: True for exactly ``N = ceil(frac * n)`` (or
    ``top_n``) rows — the highest scores, boundary ties broken by lowest id.
    ``id_col`` must be numeric and exactly representable as float64 (the
    distributed tie search binary-searches the id domain); ``score_col``
    must be non-null."""
    if (frac is None) == (top_n is None):
        raise ValueError("pass exactly one of frac / top_n")

    def proj_batch(tbl: pa.Table) -> pa.Table:
        return pa.table({
            "id": pc.cast(tbl.column(id_col), pa.int64()),
            "score": pc.cast(tbl.column(score_col), pa.float64()),
        })

    proj = ds.select_columns([id_col, score_col]).map_batches(
        proj_batch, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n = proj.count()
    N = int(top_n) if top_n is not None else frac_ceil(frac, n)

    if n == 0 or N <= 0 or N >= n:
        flag = bool(N >= n and n > 0)

        def mark_const(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "selected", pa.array(np.full(tbl.num_rows, flag)))

        return ds.map_batches(mark_const, batch_format="pyarrow",
                              zero_copy_batch=True)

    if n <= max_driver_rows:
        rows = proj.to_pandas()
        t, id_cut = _threshold_params_driver(
            rows["id"].to_numpy(np.int64),
            rows["score"].to_numpy(np.float64), N)
    else:
        from great_expectations_ray.functions.quantiles import (
            _count_le_pass,
            rank_select_values,
        )

        # t = (n-N)-th ascending order statistic of the score column
        t = rank_select_values(proj, "score", np.array([n - N]),
                               max_iter=max_iter)[0]
        n_le, _ = _count_le_pass(proj, "score", np.array([t]))
        need = N - (n - int(n_le[0]))  # N - #(score > t)
        if need <= 0:
            id_cut = None
        else:
            def tie_only(tbl: pa.Table) -> pa.Table:
                return tbl.filter(pc.equal(tbl.column("score"), t))

            ties = proj.map_batches(tie_only, batch_format="pyarrow",
                                    zero_copy_batch=True)
            id_cut = int(rank_select_values(ties, "id",
                                            np.array([need - 1]),
                                            max_iter=max_iter)[0])

    def mark(tbl: pa.Table) -> pa.Table:
        s = np.asarray(pc.fill_null(
            pc.cast(tbl.column(score_col), pa.float64()), -np.inf))
        sel = s > t
        if id_cut is not None:
            i = np.asarray(pc.cast(tbl.column(id_col), pa.int64()))
            sel |= (s == t) & (i <= id_cut)
        return tbl.append_column("selected", pa.array(sel))

    return ds.map_batches(mark, batch_format="pyarrow", zero_copy_batch=True)
