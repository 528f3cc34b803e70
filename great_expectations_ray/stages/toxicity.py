"""Word-list toxicity scoring and masking — the "toxicity scrub" half of
the north rule's "compiled-regex PII/toxicity scrub" (BASELINE.json
north_star; the PII half lives in stages/scrub.py).

One merged, word-boundary, case-insensitive alternation per word list —
compiled once per process by Arrow's RE2, applied per batch with
``count_substring_regex`` (score) and ``replace_substring_regex`` (mask).
``tox_score`` is a single division of two exact ints (match count / word
count), so the DuckDB oracle reproduces it bit-for-bit.

``toxicity_scrub_rules()`` returns the masking rule in the
``DEFAULT_SCRUB_RULES`` (name, pattern, replacement) shape, so the mask
runs inside the flagship's fused RuleEvalScrub pass next to the PII rules
— no extra stage at 100 TB.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# placeholder list, mild by design — swap for a production list via the
# ``words=`` kwargs; ORDER is irrelevant (merged into one alternation)
DEFAULT_BADWORDS: tuple[str, ...] = (
    "damn", "hell", "crap", "idiot", "stupid", "moron", "jerk",
)

DEFAULT_TOX_THRESHOLD = 0.01
MASK = "****"


def badword_pattern(words: tuple[str, ...] = DEFAULT_BADWORDS) -> str:
    """(?i) word-boundary alternation over the list.  Words are
    regex-escaped — production lists contain entries like ``f*ck`` whose
    metacharacters would otherwise corrupt the alternation."""
    import re

    return r"(?i)\b(?:" + "|".join(re.escape(w) for w in words) + r")\b"


def toxicity_scrub_rules(
    words: tuple[str, ...] = DEFAULT_BADWORDS,
) -> list[tuple[str, str, str]]:
    """Masking rule in the scrub-pipeline (name, pattern, replacement) shape."""
    return [("toxicity", badword_pattern(words), MASK)]


class ToxicityScorer:
    """map_batches callable: appends tox_matches / word_cnt / tox_score /
    toxic columns (and ``masked`` content when ``mask=True``)."""

    def __init__(self, content_col: str = "content", *,
                 words: tuple[str, ...] = DEFAULT_BADWORDS,
                 threshold: float = DEFAULT_TOX_THRESHOLD,
                 mask: bool = False):
        self.content_col = content_col
        self.pattern = badword_pattern(words)
        self.threshold = threshold
        self.mask = mask

    def __call__(self, tbl: pa.Table) -> pa.Table:
        s = tbl.column(self.content_col)
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        s = pc.cast(pc.fill_null(s, ""), pa.large_string())
        matches = pc.cast(pc.count_substring_regex(s, self.pattern), pa.int64())
        words = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.int64())
        score = pc.if_else(
            pc.greater(words, 0),
            pc.divide(pc.cast(matches, pa.float64()), pc.cast(words, pa.float64())),
            pa.scalar(0.0),
        )
        tbl = (tbl.append_column("tox_matches", matches)
                  .append_column("word_cnt", words)
                  .append_column("tox_score", score)
                  .append_column("toxic", pc.greater(score, self.threshold)))
        if self.mask:
            tbl = tbl.append_column(
                "masked", pc.replace_substring_regex(s, self.pattern, MASK))
        return tbl


def score_toxicity(ds, *, content_col: str = "content",
                   words: tuple[str, ...] = DEFAULT_BADWORDS,
                   threshold: float = DEFAULT_TOX_THRESHOLD,
                   mask: bool = False):
    return ds.map_batches(
        ToxicityScorer(content_col, words=words, threshold=threshold, mask=mask),
        batch_format="pyarrow", zero_copy_batch=True,
    )
