"""Table-level set operations — DISTINCT INTERSECT / EXCEPT over key
columns.

The reference has none (SURVEY §2.6: "set ops: none at table level"); a
data-pipeline user needs them constantly (which ids are in A but not yet in
B, which keys both sides share).  Scale shape: both sides are tagged with a
side bit and unioned; ONE bucketed ``groupby(hash(key))`` exchange
co-locates equal keys; each bucket reduces with a vectorized pandas
groupby over side flags.  Map-side per-batch dedup bounds what enters the
exchange to the batch's distinct keys.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from great_expectations_ray.functions.bucketed import grouped_apply_bucketed


def _tagged_union(a_ds, b_ds, cols: list[str]):
    def tag(side: int):
        def f(tbl: pa.Table) -> pa.Table:
            # map-side dedup: only distinct keys per batch enter the shuffle
            t = tbl.select(cols).group_by(cols).aggregate([])
            return t.append_column(
                "__side", pa.array(np.full(len(t), side, dtype=np.int8))
            )
        return f

    return (
        a_ds.select_columns(cols).map_batches(tag(0), batch_format="pyarrow",
                                              zero_copy_batch=True)
        .union(b_ds.select_columns(cols).map_batches(tag(1), batch_format="pyarrow",
                                                     zero_copy_batch=True))
    )


def _setop(a_ds, b_ds, cols: list[str], keep: str):
    cols = list(cols)

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sides = g.groupby(cols, sort=False, dropna=False)["__side"].agg(["min", "max"])
        if keep == "intersect":
            mask = (sides["min"] == 0) & (sides["max"] == 1)
        else:  # except: in A, never in B
            mask = sides["max"] == 0
        return sides[mask].reset_index()[cols]

    return grouped_apply_bucketed(_tagged_union(a_ds, b_ds, cols), cols, reduce_bucket)


def intersect_distinct(a_ds, b_ds, cols: list[str]):
    """Distinct key tuples present in BOTH datasets (SQL INTERSECT)."""
    return _setop(a_ds, b_ds, cols, "intersect")


def except_distinct(a_ds, b_ds, cols: list[str]):
    """Distinct key tuples present in A but not in B (SQL EXCEPT)."""
    return _setop(a_ds, b_ds, cols, "except")
