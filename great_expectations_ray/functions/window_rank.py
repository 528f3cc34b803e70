"""Partitioned window functions — row_number / rank / dense_rank / lag /
lead over (PARTITION BY key ORDER BY order_col).

Ray Data has no window functions; this fills the gap with the engine's
standard wide-op shape: ONE bucketed ``groupby(hash(key))`` exchange (equal
keys co-locate; high key cardinality costs no per-group overhead — see
functions/bucketed.py), then one vectorized pandas pass per bucket:
mergesort by (key, order), ``groupby().cumcount()`` for row numbers,
``rank()`` for ties, ``shift()`` within groups for lag/lead.

Ties: ``row_number`` breaks them by the order column's sort stability (pass
a unique order column for determinism — same requirement SQL has);
``rank``/``dense_rank`` handle ties exactly like SQL.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from great_expectations_ray.functions.bucketed import grouped_apply_bucketed

_SUPPORTED = ("row_number", "rank", "dense_rank", "lag", "lead")


def windowed_rank(
    ds,
    *,
    partition_by: str,
    order_by: str,
    value_col: str | None = None,
    outputs: Iterable[str] = ("row_number",),
    keep_cols: Iterable[str] = (),
):
    """Dataset of keep_cols + partition/order cols + requested window
    columns (``lag``/``lead`` require ``value_col``)."""
    outputs = list(outputs)
    for o in outputs:
        if o not in _SUPPORTED:
            raise ValueError(f"unsupported window function {o!r}")
    if ("lag" in outputs or "lead" in outputs) and value_col is None:
        raise ValueError("lag/lead need value_col")
    needed = sorted({partition_by, order_by, *keep_cols}
                    | ({value_col} if value_col else set()))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([partition_by, order_by], kind="mergesort")
        grp = g.groupby(partition_by, sort=False, dropna=False)
        out = g[needed].copy()
        if "row_number" in outputs:
            out["row_number"] = grp.cumcount() + 1
        if "rank" in outputs:
            out["rank"] = grp[order_by].rank(method="min").astype("int64")
        if "dense_rank" in outputs:
            out["dense_rank"] = grp[order_by].rank(method="dense").astype("int64")
        if "lag" in outputs:
            out["lag"] = grp[value_col].shift(1)
        if "lead" in outputs:
            out["lead"] = grp[value_col].shift(-1)
        return out

    return grouped_apply_bucketed(ds.select_columns(needed), [partition_by], bucket)
