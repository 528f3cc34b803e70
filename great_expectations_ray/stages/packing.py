"""Concat-and-chunk sequence packing — a distributed PREFIX SUM over an
ordered document stream.

GPT-style pretraining concatenates all document tokens and slices
fixed-length sequences; the loader needs, per document, its global token
offset and the id of the sequence its first token lands in.  Ray Data has
no prefix-sum primitive, so this implements one with the same
offset-linearity trick as ``functions/ks.py``:

1. sort by the (unique) order column — the only shuffle;
2. materialize, then pass 1 reads each block ONCE and emits
   ``(first_key, token_sum)`` — a per-block 2-tuple;
3. the driver orders the tuples by first_key and prefix-sums them into a
   per-block global offset table (#blocks entries — tiny);
4. pass 2 re-reads the SAME materialized blocks (``batch_size=None`` ⇒ one
   batch per block, stable because the dataset is materialized), looks up
   its block's offset by first_key, and emits per-doc
   ``token_offset = block_offset + local_exclusive_cumsum`` and
   ``seq_id = token_offset // seq_len``.

Per-doc work is one vectorized cumsum; driver work is O(#blocks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def global_token_offsets(ds, *, token_col: str, order_col: str, seq_len: int):
    """Dataset of (order_col, token_col, token_offset, seq_id), globally
    ordered by ``order_col`` (must be unique — it keys the offset table)."""
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    sorted_ds = ds.select_columns([order_col, token_col]).sort(order_col).materialize()

    def block_summary(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({
                "first_key": pa.array([], tbl.schema.field(order_col).type),
                "tok_sum": pa.array([], pa.int64()),
            })
        toks = np.asarray(tbl.column(token_col), dtype=np.int64)
        return pa.table({
            "first_key": pa.array([tbl.column(order_col)[0].as_py()]),
            "tok_sum": pa.array([int(toks.sum())]),
        })

    summaries = sorted_ds.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None
    ).take_all()
    # order_col is unique, so each block's first key identifies it for ANY
    # orderable key type (int, string, timestamp) — offsets keyed directly
    summaries.sort(key=lambda r: r["first_key"])
    offsets: dict = {}
    acc = 0
    for r in summaries:
        offsets[r["first_key"]] = acc
        acc += int(r["tok_sum"])

    def assign(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({
                order_col: pa.array([], tbl.schema.field(order_col).type),
                token_col: pa.array([], pa.int64()),
                "token_offset": pa.array([], pa.int64()),
                "seq_id": pa.array([], pa.int64()),
            })
        fk = tbl.column(order_col)[0].as_py()
        if fk not in offsets:
            raise RuntimeError(
                "packing: block boundaries shifted between passes "
                "(dataset must stay materialized)"
            )
        toks = np.asarray(tbl.column(token_col), dtype=np.int64)
        local = np.zeros(len(toks), dtype=np.int64)
        np.cumsum(toks[:-1], out=local[1:])
        off = offsets[fk] + local
        return pa.table({
            order_col: tbl.column(order_col),
            token_col: pa.array(toks),
            "token_offset": pa.array(off),
            "seq_id": pa.array(off // seq_len),
        })

    return sorted_ds.map_batches(assign, batch_format="pyarrow", batch_size=None)
