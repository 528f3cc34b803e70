"""Order-sensitive operators (reference #21/#22: increasing/decreasing).

GX's pandas impl assumes the batch's physical row order
(``column_values_increasing.py:20-43``: ``series.diff()``, first row
vacuously true).  Ray Data blocks are unordered, so we require explicit
``partition_by``/``order_by`` keys — the same move GX makes for SQL backends
with ``unexpected_index_column_names`` (documented deviation, SURVEY §7).

Implementation: one ``groupby(partition_by)`` shuffle, then a vectorized
diff per group (sorted by ``order_by``) inside ``map_groups``.
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
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)

    def check(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(order_cols, kind="mergesort")
        vals = g[column].to_numpy()
        if len(vals) <= 1:
            viol = 0
        else:
            d = np.diff(vals.astype(np.float64))
            if decreasing:
                viol = int((d >= 0).sum()) if strictly else int((d > 0).sum())
            else:
                viol = int((d <= 0).sum()) if strictly else int((d < 0).sum())
        return pd.DataFrame(
            {
                partition_by: [g[partition_by].iloc[0]],
                "n_rows": [len(g)],
                "n_violations": [viol],
                "monotonic": [viol == 0],
            }
        )

    return ds.groupby(partition_by).map_groups(check, batch_format="pandas")
