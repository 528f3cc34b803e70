from __future__ import annotations

import pyarrow as pa

from great_expectations_ray.api import Batch
from great_expectations_ray.core.suite import ExpectationConfiguration, ExpectationSuite


def test_fluent_roundtrip():
    b = Batch.from_parquet("/root/testdata/sf0.001/orders.parquet")
    assert b.row_count() == 1500
    assert "o_orderkey" in b.columns
    assert len(b.head(3)) == 3

    evr = b.expect("expect_column_values_to_not_be_null", column="o_orderkey")
    assert evr.success

    res = b.validate(
        ExpectationSuite("s")
        .add("expect_table_row_count_to_equal", value=1500)
        .add("expect_column_values_to_be_between", column="o_totalprice", min_value=0)
    )
    assert res.success


def test_fluent_single_config():
    b = Batch.from_memory(pa.table({"a": [1, 2, None]}))
    res = b.validate(ExpectationConfiguration(
        "expect_column_values_to_not_be_null", {"column": "a", "mostly": 0.5}
    ))
    assert res.results[0].success
