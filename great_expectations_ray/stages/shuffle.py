"""Deterministic training-order shuffle — the curation pipeline's final
step: give every document a reproducible pseudo-random global position and
a shard assignment, so N loader workers stream disjoint, size-balanced,
well-mixed slices.

``Dataset.random_shuffle`` is nondeterministic run-to-run; training-data
builds want the OPPOSITE: the same corpus + seed must yield the same order
(resumable writes, reproducible ablations, auditable mixing).  So the order
key is content-free and seeded — ``md5(seed || ':' || id)`` (the
``sample_exact_n`` precedent: portable to any SQL engine for the oracle) —
and the mechanics are:

1. one ``sort`` on the key (the only exchange — a shuffle inherently moves
   every row, but exactly once);
2. the packing-style two-pass distributed prefix sum (`stages/packing.py`):
   per-block ``(first_key, n_rows)`` summaries → O(#blocks) driver offset
   table → per-row ``pos = block_offset + arange``;
3. ``shard = pos % n_shards`` — strided assignment, shard sizes balanced
   to ±1 row with no second pass.

Citation for the shape: the reference has no shuffle operator (its
samplers — great_expectations ``data_splitter``/samplers — subset rows);
this is the LLM-pipeline sibling the north rule's corpus build needs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_KEY = "_shuffle_key"


def _key_batch(tbl: pa.Table, id_col: str, seed: int) -> pa.Table:
    ids = tbl.column(id_col)
    # hashlib.md5 is C code; ~1 us/row of driver-free worker time.  There is
    # no vectorized md5 kernel in pyarrow; the hex key is what makes the
    # order reproducible in ANY engine (DuckDB md5() for the oracle).
    keys = [hashlib.md5(f"{seed}:{v}".encode()).hexdigest()
            for v in ids.to_pylist()]
    return tbl.append_column(_KEY, pa.array(keys, pa.string()))


def training_shuffle(ds, *, id_col: str = "doc_id", n_shards: int = 8,
                     seed: int = 0):
    """Dataset of ``(id_col, shard, pos)``: ``pos`` is the document's global
    position in seeded-md5 order, ``shard = pos % n_shards``.  One sort
    exchange + two block-local passes; driver work is O(#blocks)."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    keyed = ds.select_columns([id_col]).map_batches(
        lambda t: _key_batch(t, id_col, seed),
        batch_format="pyarrow", zero_copy_batch=True)
    sorted_ds = keyed.sort(_KEY).materialize()

    def block_summary(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({"first_key": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"first_key": pa.array([tbl.column(_KEY)[0].as_py()]),
                         "n": pa.array([len(tbl)])})

    summaries = sorted_ds.map_batches(
        block_summary, batch_format="pyarrow", batch_size=None).take_all()
    summaries.sort(key=lambda r: r["first_key"])
    offsets: dict = {}
    acc = 0
    for r in summaries:
        offsets[r["first_key"]] = acc
        acc += int(r["n"])

    def assign(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return pa.table({
                id_col: pa.array([], tbl.schema.field(id_col).type),
                "shard": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
            })
        fk = tbl.column(_KEY)[0].as_py()
        if fk not in offsets:
            raise RuntimeError(
                "shuffle: block boundaries shifted between passes "
                "(dataset must stay materialized)")
        pos = offsets[fk] + np.arange(len(tbl), dtype=np.int64)
        return pa.table({
            id_col: tbl.column(id_col),
            "shard": pa.array(pos % n_shards),
            "pos": pa.array(pos),
        })

    return sorted_ds.map_batches(assign, batch_format="pyarrow",
                                 batch_size=None)
