"""Language identification — stateful actor-pool stage.

A fastText-style linear classifier over character/keyword n-gram features,
with deterministic hand-set weights (the sandbox has no fastText binary; the
Ray-side shape — callable class, compile-once ``__init__``, vectorized
``__call__``, ``map_batches(cls, concurrency=N)`` — is the real contract per
the north rule).  Scores every batch with one RE2 count pass per feature and
a numpy argmax; no Python loop over rows.

Output columns: ``lang_pred`` (string), ``langid_score`` (float in [0,1],
confidence margin).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: per-language discriminative token patterns (RE2), weight = IDF-ish constant
LANG_FEATURES: dict[str, list[tuple[str, float]]] = {
    "python": [
        (r"\bdef [a-zA-Z_]\w*\(", 3.0),
        (r"\bimport [a-zA-Z_]", 2.0),
        (r'"""', 2.0),
        (r"\bself\b", 1.5),
        (r"\belif\b", 2.0),
        (r"\bclass [A-Z]\w*:", 1.0),
    ],
    "javascript": [
        (r"\bfunction\b", 2.0),
        (r"\bconst \w+ =", 2.5),
        (r"\brequire\(", 2.5),
        (r"\blet \w+", 2.0),
        (r"=>", 1.5),
        (r"module\.exports", 3.0),
    ],
    "java": [
        (r"\bpublic (class|static|int|void)\b", 3.0),
        (r"\bimport java\.", 3.5),
        (r"\bSystem\.out\.", 2.0),
        (r"\bpackage [a-z.]+;", 2.5),
        (r"\bprivate \w+ \w+;", 2.0),
    ],
    "go": [
        (r"\bfunc \w+\(", 3.0),
        (r"\bpackage \w+$", 1.0),
        (r":=", 2.5),
        (r"\bfmt\.", 2.5),
        (r"\bfor _, \w+ := range\b", 3.0),
    ],
    "rust": [
        (r"\bfn \w+\(", 3.0),
        (r"\blet mut\b", 3.0),
        (r"\buse std::", 3.0),
        (r"->\s*[a-zA-Z&]", 1.0),
        (r"#\[\w+", 2.0),
        (r"\bpub fn\b", 2.5),
    ],
    "markdown": [
        (r"(?m)^# ", 2.5),
        (r"(?m)^- ", 1.0),
        (r"```", 2.5),
        (r"(?m)^## ", 2.0),
    ],
    "text": [
        (r"(?m)^[a-z][a-z ]+$", 1.0),
        (r"\bthe\b", 0.5),
    ],
}

UNKNOWN_LANG = "unknown"


class LangIdScorer:
    """Actor-pool stage: ``ds.map_batches(LangIdScorer, concurrency=N,
    batch_format="pyarrow")``.  Feature spec compiled once per actor."""

    def __init__(self, column: str = "content", features: dict | None = None):
        self.column = column
        self.features = features or LANG_FEATURES
        self.langs = list(self.features)
        # fold each language's patterns into TWO alternation scans (weight>=2
        # group and the rest) — 2 scans/lang instead of one per feature keeps
        # the stage scan-bound at ~1/3 the memory traffic; counts of an
        # alternation equal the sum of its branch counts (branches are
        # non-overlapping keyword shapes)
        self.spec = []
        for li, lang in enumerate(self.langs):
            hi = [p for p, w in self.features[lang] if w >= 2.0]
            lo = [p for p, w in self.features[lang] if w < 2.0]
            if hi:
                self.spec.append((li, "(?:" + "|".join(hi) + ")", 2.5))
            if lo:
                self.spec.append((li, "(?:" + "|".join(lo) + ")", 1.2))

    #: only the first PREFIX_CHARS of each file are scanned — language signal
    #: saturates long before that, and it bounds per-row cost on mega-files
    PREFIX_CHARS = 2048

    def score(self, content: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
        if isinstance(content, pa.ChunkedArray):
            content = content.combine_chunks()
        content = pc.utf8_slice_codeunits(pc.fill_null(content, ""), 0, self.PREFIX_CHARS)
        n = len(content)
        scores = np.zeros((len(self.langs), n), dtype=np.float64)
        for li, pat, w in self.spec:
            cnt = pc.count_substring_regex(content, pat)
            # cap bounds mega-file dominance without flattening real signal
            # (a tight cap saturates repetitive files into cross-language ties)
            scores[li] += w * np.minimum(
                np.asarray(pc.fill_null(cnt, 0), dtype=np.float64), 25.0
            )
        # length normalization so megafiles don't win on raw counts
        lengths = np.asarray(pc.fill_null(pc.utf8_length(content), 0), dtype=np.float64)
        norm = np.log2(np.maximum(lengths, 2.0))
        scores /= norm
        best = scores.argmax(axis=0)
        top = scores.max(axis=0)
        # margin over runner-up as confidence
        scores[best, np.arange(n)] = -np.inf
        second = scores.max(axis=0)
        margin = np.where(top > 0, (top - np.maximum(second, 0)) / (top + 1e-9), 0.0)
        pred = np.where(top > 0.05, np.array(self.langs, dtype=object)[best], UNKNOWN_LANG)
        return pred, margin

    def __call__(self, tbl: pa.Table) -> pa.Table:
        pred, margin = self.score(tbl.column(self.column))
        tbl = tbl.append_column("lang_pred", pa.array(pred, pa.string()))
        tbl = tbl.append_column("langid_score", pa.array(margin, pa.float64()))
        return tbl
