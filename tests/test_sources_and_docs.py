"""Sources (reader guessing, pruning) + data-docs summary action."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from great_expectations_ray.sources.readers import from_memory, read_batch


def test_read_batch_parquet_pruning():
    ds = read_batch("/root/testdata/sf0.001/lineitem.parquet",
                    columns=["l_orderkey", "l_quantity"])
    assert set(ds.schema().names) == {"l_orderkey", "l_quantity"}
    assert ds.count() == 6000


def test_read_batch_guess_failure():
    with pytest.raises(ValueError):
        read_batch("/no/such/file.xyz")


def test_from_memory():
    t = pa.table({"a": [1, 2, 3]})
    assert from_memory(t).count() == 3
    import pandas as pd

    assert from_memory(pd.DataFrame({"a": [1]})).count() == 1


def test_data_docs_action(tmp_path):
    from great_expectations_ray.corpus import corpus_dataset
    from great_expectations_ray.pipelines.checkpoint import run_checkpoint
    from great_expectations_ray.pipelines.data_docs import write_data_docs
    from great_expectations_ray.pipelines.quality_filter import QualityFilterConfig

    src = tmp_path / "in"
    corpus_dataset(200, blocks=2).write_parquet(str(src))
    out_root = str(tmp_path / "out")
    res = run_checkpoint(
        str(src) + "/*.parquet", out_root,
        config=QualityFilterConfig(actor_concurrency=2, use_langid=False,
                                   use_perplexity=False),
        n_partitions=2,
        actions=[lambda r: write_data_docs(out_root, r)],
    )
    assert os.path.exists(os.path.join(out_root, "docs", "index.html"))
    assert os.path.exists(os.path.join(out_root, "docs", "summary.json"))
    html = open(os.path.join(out_root, "docs", "index.html")).read()
    assert "rows=200" in html
