"""Canonical schemas.

The north-rule input table (BASELINE.json ``input_hint``): one row per source
file of a code corpus, ``(repo, path, commit, lang, content)`` all strings.
``content`` uses ``large_string`` so multi-GB column chunks never overflow
32-bit offsets (reference treats arbitrary-size pandas object columns; see
SURVEY.md §1 "Types supported").
"""

from __future__ import annotations

import pyarrow as pa

CODE_CORPUS_SCHEMA = pa.schema(
    [
        pa.field("repo", pa.string()),
        pa.field("path", pa.string()),
        pa.field("commit", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("content", pa.large_string()),
    ]
)

#: Columns added by the quality-filter pipeline's lineage stage.
LINEAGE_COLUMNS = (
    "content_sha256",      # sha256 of the original content
    "scrubbed_sha256",     # sha256 after PII/secret scrubbing
    "rule_bitmap",         # uint64 bitmap, bit i set => rule i was VIOLATED for this row
    "keep",                # bool — all row-level filter rules passed
)
