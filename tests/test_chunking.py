from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from great_expectations_ray.stages.chunking import chunk_documents, chunk_table


def test_chunk_boundaries_and_overlap():
    t = chunk_table(pa.array(["abcdefghij"]), pa.array([0]),
                    chunk_size=4, overlap=1)
    # step 3: starts 0,3,6,9; last chunk short
    assert t.column("start").to_pylist() == [0, 3, 6, 9]
    assert t.column("chunk").to_pylist() == ["abcd", "defg", "ghij", "j"]
    assert t.column("chunk_idx").to_pylist() == [0, 1, 2, 3]


def test_empty_and_null_rows_emit_nothing():
    t = chunk_table(pa.array(["", None, "xy"]), pa.array([0, 1, 2]),
                    chunk_size=4, overlap=0)
    assert t.column("doc_id").to_pylist() == [2]
    assert t.column("chunk").to_pylist() == ["xy"]


def test_non_ascii_chunks_at_codepoints():
    # 5 two-byte chars: byte slicing would split them; char semantics must hold
    t = chunk_table(pa.array(["ééééé"]), pa.array([0]), chunk_size=2, overlap=0)
    assert t.column("chunk").to_pylist() == ["éé", "éé", "é"]
    assert t.column("start").to_pylist() == [0, 2, 4]


def test_mixed_ascii_and_unicode_batch():
    t = chunk_table(pa.array(["abcd", "éé"]), pa.array([0, 1]),
                    chunk_size=2, overlap=0)
    got = sorted(zip(t.column("doc_id").to_pylist(),
                     t.column("start").to_pylist(),
                     t.column("chunk").to_pylist()))
    assert got == [(0, 0, "ab"), (0, 2, "cd"), (1, 0, "éé")]


def test_overlap_validation():
    with pytest.raises(ValueError):
        chunk_table(pa.array(["x"]), pa.array([0]), chunk_size=4, overlap=4)


def test_dataset_wrapper(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["abcdef"]}))
    rows = chunk_documents(ds, chunk_size=3, overlap=0).take_all()
    assert [r["chunk"] for r in rows] == ["abc", "def"]


def test_negative_overlap_rejected():
    with pytest.raises(ValueError):
        chunk_table(pa.array(["abcdefgh"]), pa.array([0]), chunk_size=3, overlap=-2)
