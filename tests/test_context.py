"""Fluent DataContext onboarding path: get_context -> data_sources.add_* ->
add_asset -> get_batch -> validate, with rooted-store persistence and a
data-docs build — the reference's EP1/EP3 entry flow over Ray Data."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import great_expectations_ray as gxr
from great_expectations_ray import ExpectationSuite


@pytest.fixture()
def parquet_dir(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    pq.write_table(
        pa.table({"id": list(range(50)), "v": [i * 1.5 for i in range(50)]}),
        str(d / "orders.parquet"),
    )
    return str(d)


def test_ephemeral_context_roundtrip(parquet_dir, ray_session):
    ctx = gxr.get_context()
    src = ctx.data_sources.add_parquet("wh", parquet_dir)
    asset = src.add_asset("orders", "orders.parquet")
    batch = asset.get_batch()
    assert batch.row_count() == 50 and "id" in batch.columns

    suite = ctx.suites.add(
        ExpectationSuite("orders").add(
            "expect_column_values_to_not_be_null", column="id")
    )
    assert ctx.suites.get("orders") is suite
    res = ctx.validate(batch, suite)
    assert res.success
    assert ctx.data_sources.all() == ["wh"]
    assert src.get_asset("orders") is asset


def test_rooted_context_persists_and_builds_docs(parquet_dir, tmp_path,
                                                 ray_session):
    root = str(tmp_path / "gx_store")
    ctx = gxr.get_context(root_dir=root)
    src = ctx.data_sources.add_parquet("wh", parquet_dir)
    batch = src.add_asset("orders", "orders.parquet").get_batch()
    suite = ctx.suites.add(
        ExpectationSuite("orders").add(
            "expect_column_values_to_be_between", column="v",
            min_value=0, max_value=100)
    )
    res = ctx.validate(batch, suite, run_name="r1")
    assert res.success

    # a fresh context on the same root sees the persisted suite
    ctx2 = gxr.get_context(root_dir=root)
    assert "orders" in ctx2.suites.all()
    loaded = ctx2.suites.get("orders")
    assert loaded.expectations[0].expectation_type == \
        "expect_column_values_to_be_between"

    index = ctx2.build_data_docs()
    assert index and os.path.exists(index)
    html = open(index).read()
    assert "orders" in html and "r1" in html


def test_memory_and_sql_datasources(ray_session, tmp_path):
    import pandas as pd

    ctx = gxr.get_context()
    mem = ctx.data_sources.add_memory("mem")
    batch = mem.add_asset(
        "t", data=pd.DataFrame({"a": [1, 2, 3]})).get_batch()
    assert batch.row_count() == 3

    p = str(tmp_path / "x.parquet")
    pq.write_table(pa.table({"a": list(range(20))}), p)
    sql = ctx.data_sources.add_sql(
        "duck", lambda: __import__("duckdb").connect())
    asset = sql.add_asset("small", f"SELECT a FROM read_parquet('{p}')")
    # pushdown kwargs flow through get_batch overrides
    b = asset.get_batch(row_condition='col("a") >= 15')
    assert b.row_count() == 5
