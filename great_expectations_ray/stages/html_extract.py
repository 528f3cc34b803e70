"""HTML -> text extraction — the front of every web-curation pipeline
(CommonCrawl WET-style plain-text extraction): strip script/style blocks,
comments and tags, decode the common entities, collapse whitespace.

All transforms are single-pass vectorized Arrow kernels
(``pc.replace_substring_regex`` / ``pc.replace_substring`` — RE2, so every
pattern below is backtracking-free, anchored by non-greedy ``.*?`` with
inline ``(?is)`` flags), which makes the op exactly mirrorable in a DuckDB
oracle (DuckDB's ``regexp_replace`` is RE2 too — identical patterns,
identical semantics).

Entity decode order matters: the named entities decode BEFORE ``&amp;`` so
that escaped escapes survive literally (``&amp;lt;`` -> ``&lt;``, never
``<`` — the standard double-decode pitfall).

Scale shape: stateless streaming ``map_batches``; no shuffle, no Python
rows.  NULL content stays NULL (SQL string semantics).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: (regex, replacement) applied in order; all RE2-safe (no lookaround)
TAG_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
)

#: literal entity decodes, in order — ``&amp;`` LAST (see module docstring)
ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def extract_text_array(content: pa.Array | pa.ChunkedArray) -> pa.Array:
    """One batch of HTML strings -> extracted plain text (NULLs preserved)."""
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    s = pc.cast(content, pa.large_string())
    for pat, rep in TAG_PATTERNS:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    for ent, ch in ENTITIES:
        s = pc.replace_substring(s, pattern=ent, replacement=ch)
    s = pc.replace_substring_regex(s, pattern=r"\s+", replacement=" ")
    return pc.utf8_trim_whitespace(s)


def extract_html_text(ds, *, content_col: str = "html",
                      id_col: str = "doc_id", out_col: str = "text"):
    """Dataset[(id_col, out_col)] — streams, no shuffle."""

    def f(tbl: pa.Table) -> pa.Table:
        return pa.table({
            id_col: tbl.column(id_col),
            out_col: extract_text_array(tbl.column(content_col)),
        })

    return ds.select_columns([id_col, content_col]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def oracle_sql_expr(col: str) -> str:
    """The DuckDB expression computing the IDENTICAL extraction for ``col``
    — the SQL mirror of :func:`extract_text_array`, composed from the same
    pattern tables so the two engines cannot drift."""
    expr = col
    for pat, rep in TAG_PATTERNS:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{rep}', 'g')"
    for ent, ch in ENTITIES:
        ch_sql = ch.replace("'", "''")
        expr = f"replace({expr}, '{ent}', '{ch_sql}')"
    expr = f"regexp_replace({expr}, '\\s+', ' ', 'g')"
    return f"trim({expr})"
