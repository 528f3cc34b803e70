"""Order-sensitive operators (reference #21/#22: increasing/decreasing).

GX's pandas impl assumes the batch's physical row order
(``column_values_increasing.py:20-43``: ``series.diff()``, first row
vacuously true).  Ray Data blocks are unordered, so we require explicit
``partition_by``/``order_by`` keys — the same move GX makes for SQL backends
with ``unexpected_index_column_names`` (documented deviation, SURVEY §7).

Implementation: ONE hash-bucket shuffle on ``partition_by``, then a
vectorized whole-bucket pass: sort by [key, order_by], diff once across the
bucket, mask out key boundaries, and count violations per key with a single
groupby — per-key Python callbacks don't survive millions of partitions
(functions/bucketed.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_monotonic(
    ds,
    column: str,
    partition_by: str,
    order_by: list[str] | str,
    *,
    strictly: bool = False,
    decreasing: bool = False,
):
    """Per-partition monotonicity verdicts: one row per partition key with
    ``n_rows``, ``n_violations`` and ``monotonic`` (bool).  First row of each
    group is vacuously conforming, as in the reference."""
    from great_expectations_ray.functions.bucketed import grouped_apply_bucketed

    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)

    def check_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([partition_by] + order_cols, kind="mergesort")
        keys = g[partition_by].to_numpy()
        vals = g[column].to_numpy().astype(np.float64)
        viol = np.zeros(len(g), dtype=bool)
        if len(g) > 1:
            d = np.diff(vals)
            if decreasing:
                bad = (d >= 0) if strictly else (d > 0)
            else:
                bad = (d <= 0) if strictly else (d < 0)
            # a diff across a key boundary is not a violation (first row of
            # each group is vacuously conforming); null keys form ONE group
            # (SQL window PARTITION BY semantics), so null==null here
            same = keys[1:] == keys[:-1]
            nulls = pd.isna(keys)
            same |= nulls[1:] & nulls[:-1]
            bad &= same
            viol[1:] = bad
        out = pd.DataFrame({partition_by: keys, "__viol": viol})
        agg = out.groupby(partition_by, sort=True, dropna=False).agg(
            n_rows=("__viol", "size"), n_violations=("__viol", "sum")
        ).reset_index()
        agg["n_violations"] = agg["n_violations"].astype(int)
        agg["monotonic"] = agg["n_violations"] == 0
        return agg

    # prune before the shuffle: only the verdict columns move
    needed = sorted({column, partition_by, *order_cols})
    return grouped_apply_bucketed(
        ds.select_columns(needed), [partition_by], check_bucket
    )
