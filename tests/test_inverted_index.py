"""Distributed inverted-index build (stages/inverted_index.py)."""

import pandas as pd
import pyarrow as pa
import ray

from great_expectations_ray.stages.inverted_index import (
    build_inverted_index,
    term_doc_frequencies,
)


def test_term_doc_frequencies_batch():
    t = pa.table({
        "doc_id": [7, 8],
        "text": ["the cat the dog", "CAT! cat,"],
    })
    out = (term_doc_frequencies(t, text_col="text", id_col="doc_id")
           .to_pandas().sort_values(["term", "doc_id"]).reset_index(drop=True))
    want = pd.DataFrame({
        "term": ["cat", "cat", "dog", "the"],
        "doc_id": [7, 8, 7, 7],
        "tf": [1, 2, 1, 2],
    })
    assert out.equals(want)


def _index_df(rows, parts):
    ds = ray.data.from_items(rows).repartition(parts)
    return (build_inverted_index(ds, text_col="text", id_col="doc_id")
            .to_pandas().sort_values("term").reset_index(drop=True))


def test_build_inverted_index_postings():
    rows = [
        {"doc_id": 1, "text": "alpha beta alpha"},
        {"doc_id": 2, "text": "beta gamma"},
        {"doc_id": 3, "text": "alpha"},
    ]
    out = _index_df(rows, 2)
    by_term = out.set_index("term")
    assert by_term.loc["alpha", "df"] == 2
    assert by_term.loc["alpha", "posting"] == "1:2,3:1"
    assert by_term.loc["beta", "posting"] == "1:1,2:1"
    assert by_term.loc["gamma", "tf_sum"] == 1


def test_build_inverted_index_partition_invariance():
    rows = [{"doc_id": i, "text": f"w{i % 5} shared token{i % 3} shared"}
            for i in range(60)]
    a = _index_df(rows, 1)
    b = _index_df(rows, 7)
    assert a.equals(b)
    assert a.set_index("term").loc["shared", "df"] == 60
    assert a.set_index("term").loc["shared", "tf_sum"] == 120


def test_build_inverted_index_sharded_mode():
    """Shards of one term concatenate (in shard order) to the unsharded
    posting; per-shard df sums to the global df."""
    rows = [{"doc_id": i, "text": "common w" + str(i)} for i in range(40)]
    flat = _index_df(rows, 4)
    ds = ray.data.from_items(rows).repartition(4)
    sh = (build_inverted_index(ds, text_col="text", id_col="doc_id",
                               shard_docs=16)
          .to_pandas().sort_values(["term", "shard"]).reset_index(drop=True))
    common = sh[sh.term == "common"]
    assert common["shard"].tolist() == [0, 1, 2]   # 40 docs / 16 per shard
    assert common["df"].sum() == 40
    joined = ",".join(common["posting"])
    assert joined == flat.set_index("term").loc["common", "posting"]
