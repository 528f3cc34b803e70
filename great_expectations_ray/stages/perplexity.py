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

    table = np.full((V * V, V), np.log2(add_k) - np.log2(add_k * V), dtype=np.float32)
    for row, arr in counts.items():
        sm = arr + add_k
        table[row] = np.log2(sm / sm.sum()).astype(np.float32)
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

    def __call__(self, tbl: pa.Table) -> pa.Table:
        col = tbl.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out = np.empty(len(col), dtype=np.float64)
        for i, v in enumerate(col):
            # per-row numpy gather over up-to-64KiB payloads: the loop is over
            # ROWS (cheap), the work per row is vectorized
            out[i] = perplexity_of(self.table, v.as_py() if v.is_valid else "", self.cap_bytes)
        return tbl.append_column("perplexity", pa.array(out, pa.float64()))


def build_reference_model(ds, sample_rows: int = 500, column: str = "content") -> np.ndarray:
    """Train the LM from a deterministic prefix sample of the corpus (the
    KenLM analog of training on held-out clean text).  ``limit`` streams only
    the needed blocks."""
    sample = ds.select_columns([column]).limit(sample_rows).take_all()
    texts = [r[column] for r in sample if r[column]]
    return train_char_lm(texts)
