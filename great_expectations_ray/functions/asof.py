"""Distributed as-of join — for each left row, the latest right row with the
same key and ``right.ts <= left.ts`` (backward direction; ``forward`` gives
the earliest right row with ``right.ts >= left.ts``).

One of the canonical operators Ray Data lacks (the reference has no joins at
all — SURVEY §2.6).  Scale shape: tag both sides, union, ONE bucketed
``groupby(hash(key))`` exchange (equal keys always co-locate), then a
vectorized ``pd.merge_asof`` per bucket — C-speed merge over the bucket's
sorted frames, never an all-pairs product.

Partitioning assumption (documented per the build brief): a bucket must
hold every row of each key it owns — guaranteed by hashing the key, NOT
range-partitioning time; a hot key's full history lands on one reducer, so
extremely hot keys bound reducer memory (cap or split upstream if a single
key's history exceeds a worker's heap).

Null handling matches SQL ASOF LEFT JOIN: null-timestamp right rows can
never match; null-timestamp left rows are kept with null payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from great_expectations_ray.functions.bucketed import grouped_apply_bucketed


def _arrow_types(ds, cols: list[str]) -> dict:
    base = ds.schema().base_schema
    if isinstance(base, pa.Schema):
        return {c: base.field(c).type for c in cols}
    probe = pa.Table.from_pandas(ds.limit(1).to_pandas(), preserve_index=False)
    return {c: probe.schema.field(c).type for c in cols}


def asof_join(
    left_ds,
    right_ds,
    *,
    by: str,
    on: str,
    left_cols: list[str],
    right_cols: list[str],
    direction: str = "backward",
    suffix: str = "_r",
):
    """Dataset of ``by, on, left_cols, right_cols{suffix}`` — one output row
    per left row (left outer semantics)."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    overlap = ({by, on} & set(left_cols)) | ({by, on} & set(right_cols))
    if overlap:
        raise ValueError(
            f"by/on columns {sorted(overlap)} must not appear in "
            "left_cols/right_cols (they are emitted automatically)"
        )
    out_right = [c + suffix for c in right_cols]
    # the tagged union needs ONE schema: type each side's null-padding
    # columns from the OTHER side's schema (metadata-only for Arrow-backed
    # datasets; pandas-backed ones fall back to a 1-row probe)
    left_types = _arrow_types(left_ds, left_cols)
    right_types = _arrow_types(right_ds, right_cols)

    def tag_left(tbl: pa.Table) -> pa.Table:
        cols = {by: tbl.column(by), on: tbl.column(on)}
        for c in left_cols:
            cols[c] = tbl.column(c)
        for c, rc in zip(right_cols, out_right):
            cols[rc] = pa.nulls(len(tbl), right_types[c])
        cols["__side"] = pa.array(np.zeros(len(tbl), dtype=np.int8))
        return pa.table(cols)

    def tag_right(tbl: pa.Table) -> pa.Table:
        cols = {by: tbl.column(by), on: tbl.column(on)}
        for c in left_cols:
            cols[c] = pa.nulls(len(tbl), left_types[c])
        for c, rc in zip(right_cols, out_right):
            cols[rc] = tbl.column(c)
        cols["__side"] = pa.array(np.ones(len(tbl), dtype=np.int8))
        return pa.table(cols)

    tagged = (
        left_ds.select_columns(sorted({by, on, *left_cols}))
        .map_batches(tag_left, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            right_ds.select_columns(sorted({by, on, *right_cols}))
            .map_batches(tag_right, batch_format="pyarrow", zero_copy_batch=True)
        )
    )

    keep = [by, on, *left_cols, *out_right]

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == 0][[by, on, *left_cols]]
        r = g[g["__side"] == 1][[by, on, *out_right]]
        # SQL 'ON l.by = r.by AND l.on >= r.on' semantics: a null key or
        # null timestamp can never MATCH (pandas merge_asof would happily
        # pair NaN by-keys), but left rows are still kept (left outer)
        r = r[r[on].notna() & r[by].notna()]
        unmatched = l[l[on].isna() | l[by].isna()]
        l = l[l[on].notna() & l[by].notna()]
        if len(l):
            merged = pd.merge_asof(
                l.sort_values(on, kind="mergesort"),
                r.sort_values(on, kind="mergesort"),
                on=on, by=by, direction=direction, allow_exact_matches=True,
            )
        else:
            # typed empty frame (g carries the union's dtypes) — an untyped
            # pd.DataFrame(columns=...) becomes a pa.null-typed block and
            # corrupts the dataset's unified schema
            merged = g[keep].head(0)
        if len(unmatched):
            unmatched = unmatched.reindex(columns=keep)  # null payload
            merged = pd.concat([merged, unmatched], ignore_index=True)
        return merged[keep]

    out = grouped_apply_bucketed(tagged, [by], merge_bucket)

    # the pandas bucket path floatifies nullable ints (Arrow int64+nulls →
    # pandas float64); restore the declared Arrow types on the way out
    targets = {**{c: left_types[c] for c in left_cols},
               **{rc: right_types[c] for c, rc in zip(right_cols, out_right)}}

    def restore(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {}
        for name in tbl.column_names:
            col = tbl.column(name)
            t = targets.get(name)
            if t is not None and col.type != t:
                col = pc.cast(col, t, safe=False)
            cols[name] = col
        return pa.table(cols)

    return out.map_batches(restore, batch_format="pyarrow", zero_copy_batch=True)
