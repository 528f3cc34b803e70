"""Boilerplate line removal — drop lines that appear in many documents
(cookie banners, nav menus, license footers).  The CCNet/RefinedWeb-style
corpus cleanup between paragraph dedup (stages/paragraph_dedup.py, which
keeps ONE copy) and C4's line rules (stages/c4_filters.py, which judge
each line locally): here a line's verdict depends on its corpus-wide
DOCUMENT frequency, and every occurrence is dropped.

Two passes:

1. document-frequency: per batch, split to lines, dedupe (doc, line)
   pairs locally, pre-aggregate per-line partial counts — so the ONE
   ``groupby(line)`` exchange moves at most |distinct lines| rows per
   batch — then filter df >= min_docs.
2. rewrite: the frequent-line set is broadcast once via ``ray.put``
   (fetched per actor in ``__init__``), each batch filters its flattened
   line array with one ``is_in`` and rebuilds content with
   ``ListArray.from_arrays`` + ``binary_join`` — no Python per row.

Scale note: |lines with df >= T| <= total_lines / T, so the broadcast is
bounded by corpus_size/T — with T in the thousands at 100 TB this is
MBs.  ``max_set_size`` guards the assumption and fails loudly; if a
corpus ever trips it, fall back to a bucketed hash join on line hash
(functions/joins.py) at the cost of a second exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _line_list(content: pa.Array | pa.ChunkedArray) -> pa.ListArray:
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    s = pc.cast(pc.fill_null(content, ""), pa.large_string())
    return pc.split_pattern(s, "\n")


class _LineDocFreq:
    """batch -> (line, df) local partials: each line counted once per doc."""

    def __init__(self, content_col: str):
        self.content_col = content_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        # SQL semantics: split(NULL) yields no lines — a NULL doc must not
        # count an empty line toward any document frequency
        col = tbl.column(self.content_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = col.filter(pc.is_valid(col))
        lines = _line_list(col)
        loff = np.asarray(lines.offsets, dtype=np.int64)
        rid = np.repeat(np.arange(len(loff) - 1, dtype=np.int64), np.diff(loff))
        pairs = pa.table({"rid": pa.array(rid), "line": lines.values})
        uniq = pairs.group_by(["rid", "line"]).aggregate([])
        g = uniq.group_by("line").aggregate([([], "count_all")])
        return pa.table({
            "line": g.column("line"),
            "df": pc.cast(g.column("count_all"), pa.int64()),
        })


def frequent_lines(ds, *, content_col: str = "content", min_docs: int):
    """Dataset[(line, df)] of lines appearing in >= min_docs documents."""
    partials = ds.map_batches(
        _LineDocFreq(content_col), batch_format="pyarrow", zero_copy_batch=True
    )
    counts = partials.groupby("line").sum("df").rename_columns(["line", "df"])

    def keep_frequent(tbl: pa.Table) -> pa.Table:
        return tbl.filter(pc.greater_equal(tbl.column("df"), min_docs))

    return counts.map_batches(
        keep_frequent, batch_format="pyarrow", zero_copy_batch=True
    )


class _BoilerplateRewriter:
    """Drops broadcast frequent lines; emits clean content + n_dropped."""

    def __init__(self, lines_ref, content_col: str):
        self.content_col = content_col
        lines = lines_ref if isinstance(lines_ref, pa.Array) else ray.get(lines_ref)
        self.drop_set = pc.cast(lines, pa.large_string())

    def __call__(self, tbl: pa.Table) -> pa.Table:
        orig = tbl.column(self.content_col)
        if isinstance(orig, pa.ChunkedArray):
            orig = orig.combine_chunks()
        lines = _line_list(orig)
        loff = np.asarray(lines.offsets, dtype=np.int64)
        flat = lines.values
        keep = pc.invert(pc.is_in(flat, value_set=self.drop_set))
        keep_np = keep.to_numpy(zero_copy_only=False)
        # cumulative kept count at every row boundary IS the new offsets
        new_off = np.concatenate(([0], np.cumsum(keep_np, dtype=np.int64)))[loff]
        rebuilt = pa.LargeListArray.from_arrays(
            pa.array(new_off, pa.int64()), flat.filter(keep)
        )
        clean = pc.binary_join(rebuilt, pa.scalar("\n", pa.large_string()))
        n_dropped = pa.array(np.diff(loff) - np.diff(new_off))
        # SQL null semantics: string ops on NULL content yield NULL — never
        # silently rewrite a null row to ''
        null_mask = pc.is_null(orig)
        clean = pc.if_else(null_mask, pa.scalar(None, pa.large_string()), clean)
        n_dropped = pc.if_else(null_mask, pa.scalar(None, pa.int64()),
                               pc.cast(n_dropped, pa.int64()))
        return (
            tbl.drop_columns([self.content_col])
            .append_column(self.content_col, clean)
            .append_column("n_dropped", n_dropped)
        )


def remove_boilerplate(
    ds,
    *,
    content_col: str = "content",
    min_docs: int,
    max_set_size: int = 5_000_000,
):
    """Dataset with frequent lines removed from ``content_col`` and a
    per-row ``n_dropped`` count.  Two passes over the input (df then
    rewrite) — pass the same Dataset twice, it re-streams."""
    freq = frequent_lines(ds, content_col=content_col, min_docs=min_docs)
    head = freq.take(max_set_size + 1)
    if len(head) > max_set_size:
        raise ValueError(
            f"frequent-line set exceeds max_set_size={max_set_size}; "
            "raise min_docs or switch to the bucketed-join path"
        )
    drop = pa.array([r["line"] for r in head], pa.large_string())
    ref = ray.put(drop)
    return ds.map_batches(
        _BoilerplateRewriter,
        fn_constructor_args=(ref, content_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 8),
    )
