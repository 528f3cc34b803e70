"""Heuristic text/code statistics — stateless vectorized map_batches stage.

Computes the columns the quality suite's heuristic expectations judge
(length / line-length / alphanumeric-ratio rules re-expressed as
``expect_column_values_to_be_between`` over these columns, per the north
star's "vectorized heuristic expectations").

All kernels are Arrow/numpy; max-line-length uses ``np.maximum.reduceat``
over the split-list offsets instead of a per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _per_list_max(list_array: pa.ListArray | pa.LargeListArray, values: np.ndarray) -> np.ndarray:
    offsets = np.asarray(list_array.offsets)
    n = len(list_array)
    out = np.zeros(n, dtype=np.int64)
    starts = offsets[:-1]
    ends = offsets[1:]
    nonempty = ends > starts
    if values.size and nonempty.any():
        seg_max = np.maximum.reduceat(values, starts[nonempty])
        # reduceat reduces to the NEXT start; with sorted unique starts over
        # the concatenated values this yields per-list maxima for nonempty lists
        out[nonempty] = seg_max
    return out


class TextStats:
    """Adds n_chars, n_lines, max_line_len, alnum_ratio, ws_ratio."""

    def __init__(self, column: str = "content"):
        self.column = column

    def __call__(self, tbl: pa.Table) -> pa.Table:
        content = tbl.column(self.column)
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        filled = pc.fill_null(content, "")
        n_chars = np.asarray(pc.utf8_length(filled), dtype=np.int64)
        n_newlines = np.asarray(pc.count_substring(filled, "\n"), dtype=np.int64)
        n_lines = n_newlines + 1

        lines = pc.split_pattern(filled, "\n")
        line_lens = np.asarray(pc.utf8_length(lines.values), dtype=np.int64)
        max_line = _per_list_max(lines, line_lens)

        alnum = np.asarray(
            pc.count_substring_regex(filled, "[A-Za-z0-9]"), dtype=np.float64
        )
        ws = np.asarray(pc.count_substring_regex(filled, r"\s"), dtype=np.float64)
        denom = np.maximum(n_chars.astype(np.float64), 1.0)

        tbl = tbl.append_column("n_chars", pa.array(n_chars))
        tbl = tbl.append_column("n_lines", pa.array(n_lines))
        tbl = tbl.append_column("max_line_len", pa.array(max_line))
        tbl = tbl.append_column("alnum_ratio", pa.array(alnum / denom, pa.float64()))
        tbl = tbl.append_column("ws_ratio", pa.array(ws / denom, pa.float64()))
        return tbl
