"""TF-IDF keyword extraction (stages/tfidf.py)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
import ray.data as rd

from great_expectations_ray.stages.tfidf import document_frequencies, tfidf_topk

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3],
        "text": [
            "apple banana apple cherry",
            "banana cherry cherry",
            "apple date",
        ],
    }
)


def test_document_frequencies(ray_session):
    df = (
        document_frequencies(rd.from_pandas(DOCS))
        .to_pandas()
        .set_index("term")["df"]
        .to_dict()
    )
    assert df == {"apple": 2, "banana": 2, "cherry": 2, "date": 1}


def test_topk_scores_and_selection(ray_session):
    out = tfidf_topk(rd.from_pandas(DOCS), k=2).to_pandas()
    n = 3
    # doc 1: apple tf=2 df=2 beats cherry/banana (tf=1)
    d1 = out[out.doc_id == 1].sort_values("term")
    assert set(d1.term) == {"apple", "banana"} or set(d1.term) == {"apple", "cherry"}
    apple = out[(out.doc_id == 1) & (out.term == "apple")].iloc[0]
    assert apple.tf == 2 and apple.df == 2
    expect = round(2 * (math.log((1 + n) / (1 + 2)) + 1), 6)
    assert apple.tfidf == pytest.approx(expect, abs=0)
    # doc 3: date (df=1) outranks apple (df=2) at equal tf
    d3 = out[out.doc_id == 3]
    sel = d3.set_index("term")
    assert sel.at["date", "tfidf"] > sel.at["apple", "tfidf"]


def test_tie_at_k_breaks_by_term(ray_session):
    docs = pd.DataFrame({"doc_id": [1], "text": ["zeta alpha beta"]})
    out = tfidf_topk(rd.from_pandas(docs), k=2).to_pandas()
    # all three tie (tf=1, df=1): lexicographic term order decides
    assert sorted(out.term) == ["alpha", "beta"]


def test_min_df_and_max_vocab(ray_session):
    out = tfidf_topk(rd.from_pandas(DOCS), k=5, min_df=2).to_pandas()
    assert "date" not in set(out.term)
    out2 = tfidf_topk(rd.from_pandas(DOCS), k=5, max_vocab=1).to_pandas()
    # highest-df, term-ascending cap keeps only "apple" (df=2 ties: apple first)
    assert set(out2.term) == {"apple"}


def test_empty_and_null_text(ray_session):
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["", None, "word"]})
    out = tfidf_topk(rd.from_pandas(docs), k=3).to_pandas()
    assert out.doc_id.tolist() == [3]
    assert out.term.tolist() == ["word"]
