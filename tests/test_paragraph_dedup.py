"""Paragraph-level corpus dedup (stages/paragraph_dedup.py)."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from great_expectations_ray.stages.paragraph_dedup import (
    dedup_paragraphs,
    paragraph_drop_marks,
)

DOCS = pd.DataFrame(
    {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta\ncommon paragraph\ngamma",
            "common paragraph\ndelta",          # loses its copy (doc 1 was first)
            "x\ncommon paragraph\ncommon paragraph",  # loses both copies
            "unique only",
        ],
    }
)
EXPECTED = {
    1: ("alpha beta\ncommon paragraph\ngamma", 0),
    2: ("delta", 1),
    3: ("x", 2),
    4: ("unique only", 0),
}


@pytest.mark.parametrize("broadcast", [True, False])
def test_keep_first_semantics(ray_session, broadcast):
    ds = rd.from_pandas(DOCS)
    out = (
        dedup_paragraphs(ds, sep="\n", min_len=1, broadcast_drops=broadcast)
        .to_pandas()
        .set_index("doc_id")
    )
    for did, (text, n) in EXPECTED.items():
        assert out.at[did, "text"] == text, did
        assert int(out.at[did, "n_dropped"]) == n, did


def test_min_len_exempts_short_paragraphs(ray_session):
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["ab\nlong paragraph", "ab\nzz"]})
    out = (
        dedup_paragraphs(rd.from_pandas(docs), sep="\n", min_len=3)
        .to_pandas()
        .set_index("doc_id")
    )
    # "ab" and "zz" are under min_len: never deduped even though "ab" repeats
    assert out.at[1, "text"] == "ab\nlong paragraph"
    assert out.at[2, "text"] == "ab\nzz"
    assert int(out["n_dropped"].sum()) == 0


def test_within_doc_duplicates_drop(ray_session):
    docs = pd.DataFrame({"doc_id": [7], "text": ["same\nsame\nsame"]})
    out = dedup_paragraphs(rd.from_pandas(docs), sep="\n").to_pandas()
    assert out.at[0, "text"] == "same"
    assert int(out.at[0, "n_dropped"]) == 2


def test_doc_losing_everything_becomes_empty(ray_session):
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["only para", "only para"]})
    out = (
        dedup_paragraphs(rd.from_pandas(docs), sep="\n")
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.at[1, "text"] == "only para"
    assert out.at[2, "text"] == ""


def test_null_text_passes_through(ray_session):
    docs = pd.DataFrame({"doc_id": [1, 2], "text": [None, "real para"]})
    out = (
        dedup_paragraphs(rd.from_pandas(docs), sep="\n")
        .to_pandas()
        .set_index("doc_id")
    )
    assert int(out["n_dropped"].sum()) == 0
    assert out.at[2, "text"] == "real para"


def test_drop_marks_are_global_first_by_doc_then_position(ray_session):
    # same para at (2,0) and (1,1): (1,1) wins (doc order dominates)
    docs = pd.DataFrame({"doc_id": [1, 2], "text": ["a1\ndup", "dup\nb1"]})
    marks = paragraph_drop_marks(rd.from_pandas(docs), sep="\n").to_pandas()
    assert marks.to_records(index=False).tolist() == [(2, 0)]


def test_extra_columns_survive(ray_session):
    docs = pd.DataFrame(
        {"doc_id": [1, 2], "lang": ["en", "fr"], "text": ["k\np q r", "p q r\nz"]}
    )
    out = (
        dedup_paragraphs(rd.from_pandas(docs), sep="\n")
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.at[2, "lang"] == "fr"
    assert out.at[2, "text"] == "z"
