"""Fill-in-the-middle transform (stages/fim.py): modular cut spec, ASCII
vectorized path == per-row python path, SQL parity via DuckDB."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.fim import (
    MID_TOKEN,
    PRE_TOKEN,
    SUF_TOKEN,
    fim_cuts,
    fim_documents,
    fim_table,
)


def _expected_row(doc_id: int, text: str | None, rate_mod: int = 2):
    if text is None:
        return (False, 0, 0, None)
    L = len(text)
    i = (doc_id * 7919 + 13) % (L + 1)
    j = (doc_id * 104729 + 7) % (L + 1)
    lo, hi = min(i, j), max(i, j)
    if doc_id % rate_mod == 0 and L >= 2:
        return (True, lo, hi,
                PRE_TOKEN + text[:lo] + SUF_TOKEN + text[hi:]
                + MID_TOKEN + text[lo:hi])
    return (False, 0, 0, text)


def test_fim_cuts_spec():
    ids = np.array([0, 1, 2, 3, 17], dtype=np.int64)
    lens = np.array([10, 10, 0, 1, 25], dtype=np.int64)
    applied, lo, hi = fim_cuts(ids, lens, 2)
    assert applied.tolist() == [True, False, False, False, False]
    assert (lo <= hi).all()
    assert (hi <= lens).all()


def test_fim_table_matches_reference_rows():
    texts = ["hello world this is a doc", "short", "", None,
             "another plain ascii document body", "ab"]
    ids = list(range(len(texts)))
    out = fim_table(pa.array(texts, pa.string()), pa.array(ids, pa.int64()))
    for k in ids:
        exp = _expected_row(k, texts[k])
        assert bool(out.column("fim_applied")[k].as_py()) == exp[0], k
        assert out.column("cut_lo")[k].as_py() == exp[1], k
        assert out.column("cut_hi")[k].as_py() == exp[2], k
        assert out.column("fim_text")[k].as_py() == exp[3], k


def test_fim_non_ascii_fallback_matches_spec():
    # mixed batch: unicode rows take the per-row path, ascii rows the
    # vectorized path — both must match the reference implementation
    texts = ["plain ascii text here", "héllo wörld ünïcode", "日本語のテキスト",
             "more ascii", None, "café au lait"]
    ids = [0, 2, 4, 6, 8, 10]  # all even -> all eligible
    out = fim_table(pa.array(texts, pa.string()), pa.array(ids, pa.int64()))
    for k, (i, t) in enumerate(zip(ids, texts)):
        exp = _expected_row(i, t)
        assert out.column("fim_text")[k].as_py() == exp[3], (i, t)
        assert out.column("cut_lo")[k].as_py() == exp[1]


def test_fim_rate_mod():
    texts = ["some document body here"] * 6
    out = fim_table(pa.array(texts), pa.array(range(6), pa.int64()),
                    rate_mod=3)
    assert [a.as_py() for a in out.column("fim_applied")] == [
        True, False, False, True, False, False]


def test_fim_documents_sql_parity(ray_session):
    rng = np.random.default_rng(23)
    texts = ["".join(rng.choice(list("abcdef gh\n"), size=rng.integers(0, 60)))
             for _ in range(200)]
    ids = list(range(200))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string())})
    got = (fim_documents(rd.from_arrow(tbl).repartition(4))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute("""
        WITH f AS (
          SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L,
                 (doc_id * 7919 + 13) % (CAST(length(text) AS BIGINT) + 1) AS i,
                 (doc_id * 104729 + 7) % (CAST(length(text) AS BIGINT) + 1) AS j
          FROM documents),
        g AS (
          SELECT doc_id, text, L, LEAST(i, j) AS lo, GREATEST(i, j) AS hi,
                 (doc_id % 2 = 0 AND L >= 2) AS applied
          FROM f)
        SELECT doc_id, applied AS fim_applied,
          CASE WHEN applied THEN lo ELSE 0 END AS cut_lo,
          CASE WHEN applied THEN hi ELSE 0 END AS cut_hi,
          CASE WHEN applied THEN
            '<fim_prefix>' || substr(text, 1, CAST(lo AS INTEGER))
            || '<fim_suffix>' || substr(text, CAST(hi AS INTEGER) + 1)
            || '<fim_middle>'
            || substr(text, CAST(lo AS INTEGER) + 1, CAST(hi - lo AS INTEGER))
          ELSE text END AS fim_text
        FROM g ORDER BY doc_id
    """).fetchdf()
    assert (got["fim_applied"] == exp["fim_applied"]).all()
    assert (got["cut_lo"] == exp["cut_lo"]).all()
    assert (got["cut_hi"] == exp["cut_hi"]).all()
    assert (got["fim_text"] == exp["fim_text"]).all()
