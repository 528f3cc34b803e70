"""Bucketed group-by — the scalable substitute for high-cardinality
``groupby(key).map_groups``/``aggregate``.

Ray's groupby pays per-GROUP overhead on the reduce side, which is
pathological when the key is high-cardinality (measured on this box: value
counts over 10M distinct keys took ~300 s via ``groupby(value).sum`` vs ~6 s
via 64 hash buckets on the SAME shuffle volume).  The fix is structural, not
a tuning knob: bucket rows by ``hash(key) % n_buckets``, run ONE
``groupby(bucket)`` exchange (identical data movement), and make the
per-bucket callable handle ALL keys in its bucket with vectorized
pandas/Arrow ops (``drop_duplicates``, ``groupby().max()``,
``Table.group_by``) — C-speed regardless of key cardinality.

Rows with equal keys always share a bucket, so any per-key computation is
exact.  Skew: a single hot KEY still lands in one bucket, but the per-bucket
work is vectorized, so a hot key costs O(its rows), not O(groups).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def hash_bucket_of(arr: pa.Array | pa.ChunkedArray, n_buckets: int) -> np.ndarray:
    """Deterministic vectorized bucket id per value (any dtype) — polars
    xxhash off the Arrow buffer, no per-row Python."""
    import polars as pl

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    h = pl.from_arrow(arr).hash(seed=0).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def grouped_apply_bucketed(
    ds,
    key_cols: list[str],
    bucket_fn,
    *,
    n_buckets: int = 256,
    batch_format: str = "pandas",
):
    """``groupby(key).map_groups(fn)`` re-expressed as bucket + vectorized
    per-bucket apply.  ``bucket_fn`` receives one BUCKET (all rows whose key
    hashes there, including a ``__bucket`` column) and must handle multiple
    keys itself — e.g. ``df.sort_values(key).drop_duplicates(key)`` or
    ``df.groupby(key).agg(...)``.  Exactly one all-to-all exchange."""

    def add_bucket(tbl: pa.Table) -> pa.Table:
        if len(key_cols) == 1:
            key = tbl.column(key_cols[0]).combine_chunks()
        else:
            parts = [
                pc.cast(tbl.column(c).combine_chunks(), pa.string()) for c in key_cols
            ]
            key = pc.binary_join_element_wise(
                *parts, "\x1f", null_handling="replace", null_replacement="\x00"
            )
        return tbl.append_column(
            "__bucket", pa.array(hash_bucket_of(key, n_buckets))
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(bucket_fn, batch_format=batch_format)
    )
