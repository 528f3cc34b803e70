from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.substr_dedup import (
    duplicate_substrings,
    window_table,
)

SHARED = "SHARED LICENSE BLOCK THAT IS WELL OVER FORTY CHARS LONG INDEED"  # 62


def test_window_table_positions_and_content():
    t = window_table(pa.array(["abcdefghij"]), pa.array([7]), window=4, stride=3)
    assert t.column("pos").to_pylist() == [0, 3, 6]
    assert t.column("win").to_pylist() == [b"abcd", b"defg", b"ghij"]
    assert t.column("doc_id").to_pylist() == [7, 7, 7]


def test_window_table_short_and_null_rows():
    t = window_table(pa.array(["ab", None, "abcd"]), pa.array([0, 1, 2]),
                     window=4, stride=1)
    assert t.column("doc_id").to_pylist() == [2]
    assert t.column("win").to_pylist() == [b"abcd"]


def test_exact_detection(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["prefix " + SHARED, SHARED + " suffix",
                 "nothing in common with the others at all, guaranteed xyz"],
    }))
    out = {r["doc_id"]: r for r in
           duplicate_substrings(ds, window=40).take_all()}
    assert set(out) == {0, 1}
    # 62-char shared span -> 62-40+1 = 23 windows in each doc
    assert out[0]["dup_windows"] == 23 and out[0]["first_dup_pos"] == 7
    assert out[1]["dup_windows"] == 23 and out[1]["first_dup_pos"] == 0


def test_within_doc_repeats_do_not_mark(ray_session):
    rep = "self repeated block of more than forty characters here! "
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": [rep * 3, "completely unrelated other document body text okay"],
    }))
    assert duplicate_substrings(ds, window=40).take_all() == []


def test_non_ascii_content_does_not_crash(ray_session):
    shared = "SHARED LICENSE BLOCK THAT IS WELL OVER FORTY CHARS LONG INDEED"
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["héllo wörld prefix " + shared, shared + " suffix é çontent"],
    }))
    out = {r["doc_id"]: r for r in
           duplicate_substrings(ds, window=40).take_all()}
    assert set(out) == {0, 1}
    assert out[0]["dup_windows"] == 23
