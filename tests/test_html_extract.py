"""HTML -> text extraction (stages/html_extract.py): semantics, entity
decode order, NULLs, and exact DuckDB-oracle parity from the shared
pattern tables."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.html_extract import (
    extract_html_text,
    extract_text_array,
    oracle_sql_expr,
)


def _x(s):
    return extract_text_array(pa.array([s], pa.string()))[0].as_py()


def test_basic_extraction():
    html = ("<html><head><title>T</title><style>p{color:red}</style>"
            "<script>var x = '<b>not text</b>';</script></head>"
            "<body><h1>Hello</h1><p>world &amp; friends</p>"
            "<!-- a comment --></body></html>")
    assert _x(html) == "T Hello world & friends"


def test_script_style_case_insensitive_multiline():
    html = "a<SCRIPT type='x'>\nline1\nline2\n</ScRiPt>b<STYLE>\n.c{}\n</style>c"
    assert _x(html) == "a b c"


def test_entity_decode_order_no_double_decode():
    # &amp;lt; must decode to the LITERAL &lt;, never to <
    assert _x("x &amp;lt; y") == "x &lt; y"
    assert _x("a &lt; b &gt; c &quot;q&quot; &#39;s&#39; n&nbsp;b") == \
        'a < b > c "q" \'s\' n b'


def test_whitespace_collapse_and_trim():
    assert _x("  <p>a</p>\n\n<p>b</p>\t ") == "a b"


def test_null_and_plain_text():
    out = extract_text_array(pa.array([None, "no tags here"], pa.string()))
    assert out[0].as_py() is None
    assert out[1].as_py() == "no tags here"


def test_duckdb_oracle_parity(ray_session):
    rng = np.random.default_rng(31)
    frags = ["<p>", "</p>", "<script>junk();</script>", "&amp;", "&lt;tag",
             "word", "  ", "<!--c-->", "<div class='x'>", "</div>",
             "<style>.a{}</style>", "line\nbreak", "&nbsp;", "text"]
    docs = ["".join(rng.choice(frags, size=rng.integers(1, 25)))
            for _ in range(150)]
    tbl = pa.table({"doc_id": pa.array(range(150), pa.int64()),
                    "html": pa.array(docs, pa.string())})
    got = (extract_html_text(rd.from_arrow(tbl).repartition(4))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("pages", tbl)
    exp = con.execute(
        f"SELECT doc_id, {oracle_sql_expr('html')} AS text "
        "FROM pages ORDER BY doc_id").fetchdf()
    assert (got["text"] == exp["text"]).all()
