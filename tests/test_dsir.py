"""DSIR importance resampling (stages/dsir.py — Xie et al. 2023):
hashed-n-gram bag models, broadcast log-ratio weighting, deterministic
Gumbel-top-k selection."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from great_expectations_ray.stages.dsir import (
    D,
    DsirWeigher,
    dsir_select,
    fit_hashed_bag,
    fit_hashed_bag_pair,
    gumbel_keys,
    hashed_feature_counts,
)


def test_hashed_feature_counts_unigrams_and_bigrams():
    b, c = hashed_feature_counts("the cat the cat")
    # unigrams: the x2, cat x2; bigrams: "the cat" x2, "cat the" x1
    assert c.sum() == 4 + 3
    assert (np.diff(b) > 0).all()  # sorted sparse buckets
    b2, c2 = hashed_feature_counts("")
    assert len(b2) == 0 and len(c2) == 0


def test_batch_feature_buckets_matches_per_doc_reference():
    from great_expectations_ray.stages.dsir import _batch_feature_buckets

    texts = ["Hello world hello", "", "  --- !!! ", "a", "a b a b a",
             "Ünïcode tökens 123 foo_bar", None, "trailing space ",
             " leading", "a-b-c_d e", "ONE\ntwo\tthree"]
    docs, buckets = _batch_feature_buckets(pa.array(texts, pa.string()))
    for i, t in enumerate(texts):
        b_ref, c_ref = hashed_feature_counts(t or "")
        mine = buckets[docs == i]
        if len(mine) == 0:
            assert len(b_ref) == 0
            continue
        b2, c2 = np.unique(mine, return_counts=True)
        assert np.array_equal(b_ref, b2) and np.array_equal(c_ref, c2), t


def test_fit_hashed_bag_matches_local_counts(ray_session):
    texts = ["aa bb aa", "bb cc", "aa"]
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(2)
    logp = fit_hashed_bag(ds, column="text", add_k=0.01)
    assert logp.shape == (D,)
    # independent local recount
    counts = np.zeros(D)
    for t in texts:
        b, c = hashed_feature_counts(t)
        counts[b] += c
    sm = counts + 0.01
    assert np.allclose(logp, np.log(sm / sm.sum()))
    # probabilities normalize
    assert abs(np.exp(logp).sum() - 1.0) < 1e-9


def test_dsir_select_prefers_target_like_docs(ray_session):
    # raw corpus: half "python" docs, half "banana" docs; target = python
    rows = []
    for i in range(40):
        rows.append({"doc_id": i,
                     "text": ("def main import os python code " * 3)
                     if i % 2 == 0 else ("banana smoothie recipe sugar " * 3),
                     "kind": "code" if i % 2 == 0 else "food"})
    ds = rd.from_items(rows).repartition(4)
    target = ds.filter(expr="kind == 'code'")
    out = dsir_select(ds, k=10, column="text", id_col="doc_id",
                      target_ds=target, raw_ds=ds).to_pandas()
    assert len(out) == 40
    assert int(out["selected"].sum()) == 10
    sel = out[out["selected"]]
    # every selected doc is target-like: code docs score higher by a wide
    # margin, so Gumbel noise can't flip any of the top 10
    assert (sel["doc_id"] % 2 == 0).all()
    # logw separates the populations
    code_w = out[out.doc_id % 2 == 0]["dsir_logw"].mean()
    food_w = out[out.doc_id % 2 == 1]["dsir_logw"].mean()
    assert code_w > food_w


def test_dsir_deterministic_across_partitionings(ray_session):
    rows = [{"doc_id": i, "text": f"token{i % 7} alpha beta {i % 3}"}
            for i in range(30)]
    a = dsir_select(rd.from_items(rows).repartition(1), k=5,
                    target_ds=rd.from_items(rows[:10]),
                    column="text", id_col="doc_id").to_pandas()
    b = dsir_select(rd.from_items(rows).repartition(6), k=5,
                    target_ds=rd.from_items(rows[:10]),
                    column="text", id_col="doc_id").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert np.allclose(a["dsir_logw"], b["dsir_logw"])
    assert (a["selected"] == b["selected"]).all()
    assert int(a["selected"].sum()) == 5


def test_gumbel_keys_deterministic():
    ids = np.arange(5)
    lw = np.zeros(5)
    k1, k2 = gumbel_keys(ids, lw, seed=0), gumbel_keys(ids, lw, seed=0)
    assert (k1 == k2).all()
    assert not (k1 == gumbel_keys(ids, lw, seed=1)).all()


def test_weigher_empty_text(ray_session):
    import ray

    lr = np.zeros(D)
    w = DsirWeigher(ray.put(lr), column="text")
    out = w(pa.table({"text": ["", None, "abc"]}))
    assert out.column("dsir_logw").to_pylist() == [0.0, 0.0, 0.0]


def test_fit_hashed_bag_pair_matches_two_single_fits(ray_session):
    t_texts = ["aa bb aa", "cc dd"]
    r_texts = ["aa bb aa", "cc dd", "ee ff gg", "aa"]
    t = rd.from_arrow(pa.table({"text": t_texts})).repartition(2)
    r = rd.from_arrow(pa.table({"text": r_texts})).repartition(3)
    log_p, log_q = fit_hashed_bag_pair(t, r, column="text")
    assert np.allclose(log_p, fit_hashed_bag(t, column="text"))
    assert np.allclose(log_q, fit_hashed_bag(r, column="text"))


def test_dsir_flags_only_matches_full_output(ray_session):
    rows = [{"doc_id": i, "text": f"token{i % 7} alpha beta {i % 3}"}
            for i in range(30)]
    kwargs = dict(k=5, target_ds=rd.from_items(rows[:10]),
                  column="text", id_col="doc_id")
    full = dsir_select(rd.from_items(rows).repartition(4), **kwargs).to_pandas()
    flags = dsir_select(rd.from_items(rows).repartition(4), flags_only=True,
                        **kwargs).to_pandas()
    assert sorted(flags.columns) == ["doc_id", "dsir_key", "dsir_logw",
                                     "selected"]
    full = full.sort_values("doc_id").reset_index(drop=True)
    flags = flags.sort_values("doc_id").reset_index(drop=True)
    assert np.allclose(full["dsir_logw"], flags["dsir_logw"])
    assert np.allclose(full["dsir_key"], flags["dsir_key"])
    assert (full["selected"] == flags["selected"]).all()
