"""Skew mitigation: salted aggregation equals direct aggregation; dedup
pre-reduce preserves keep-first semantics on the Zipf-skewed corpus."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from great_expectations_ray.corpus import corpus_batch
from great_expectations_ray.stages.dedup import dedup_exact
from great_expectations_ray.stages.skew import salted_sum


def test_salted_sum_equals_direct():
    import ray.data as rd

    df = corpus_batch(0, 2000).to_pandas()
    df["one"] = 1
    df["n"] = df.content.str.len()
    ds = rd.from_pandas(df[["repo", "one", "n"]]).repartition(8)

    salted = salted_sum(ds, ["repo"], ["one", "n"], salt=4)
    got = pd.DataFrame(salted.take_all())
    got = got.rename(columns={"sum(sum(one))": "cnt", "sum(sum(n))": "total_n"})
    exp = df.groupby("repo").agg(cnt=("one", "sum"), total_n=("n", "sum")).reset_index()
    m = got.merge(exp, on="repo", suffixes=("", "_exp"))
    assert len(m) == exp.repo.nunique()
    assert (m.cnt == m.cnt_exp).all()
    assert (m.total_n == m.total_n_exp).all()
    # the corpus really is skewed — mega-repo holds ~30%
    assert exp.set_index("repo").cnt.max() / exp.cnt.sum() > 0.25


def test_dedup_prereduce_keeps_min_order():
    import ray.data as rd

    df = corpus_batch(0, 1500).to_pandas()
    df["doc_id"] = df.path.str.extract(r"file_(\d+)\.").astype(int)
    ds = rd.from_pandas(df).repartition(6)
    kept = dedup_exact(ds, ["content"], order_by="doc_id")
    got = pd.DataFrame(kept.select_columns(["doc_id"]).take_all())
    exp = df.sort_values("doc_id").drop_duplicates(subset=["content"], keep="first")
    assert sorted(got.doc_id) == sorted(exp.doc_id)
    # duplicates actually exist (canonical groups)
    assert len(exp) < len(df)
