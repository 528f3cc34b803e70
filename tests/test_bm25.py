from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.stages.bm25 import bm25_stats, bm25_topk


def _ds(texts, parallelism=3):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(parallelism)


def test_stats_n_total_df():
    texts = ["a b c", "a a d", "e f", None, ""]
    n, total, dfs = bm25_stats(_ds(texts), ["a", "e", "zzz"])
    assert n == 5 and total == 8
    assert dfs.tolist() == [2, 1, 0]


def test_scores_match_reference_formula():
    texts = ["cat dog fish", "cat cat cat", "dog dog bird", "bird fish"]
    out = bm25_topk(_ds(texts), ["cat", "dog"], k=4, k1=1.2, b=0.75)
    # hand-computed Okapi BM25 (Lucene idf), doc-length normalised
    n, avgdl = 4, (3 + 3 + 3 + 2) / 4
    def idf(df):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def s(tf, dl, df):
        return idf(df) * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    exp = {
        0: s(1, 3, 2) + s(1, 3, 2),
        1: s(3, 3, 2),
        2: s(2, 3, 2),
    }
    got = dict(zip(out["doc_id"], out["score"]))
    assert len(got) == 3  # doc 3 matches neither term
    for d, v in exp.items():
        assert abs(got[d] - v) < 1e-5, (d, got[d], v)
    # ranking: doc0 (two distinct terms) vs doc1 (tf=3 single term)
    assert list(out["doc_id"]) == sorted(got, key=lambda d: (-got[d], d))


def test_topk_truncation_and_tiebreak():
    texts = ["x y", "x y", "x y", "q"]
    out = bm25_topk(_ds(texts), ["x"], k=2)
    # identical docs tie -> lowest doc_ids kept
    assert list(out["doc_id"]) == [0, 1]


def test_empty_corpus():
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                 "text": pa.array([], pa.string())}))
    out = bm25_topk(ds, ["x"], k=3)
    assert len(out) == 0
