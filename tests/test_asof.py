"""Distributed as-of join (functions/asof.py) vs pandas merge_asof on the
whole frame."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from great_expectations_ray.functions.asof import asof_join


def _frames(seed=11, n_left=400, n_right=300, n_keys=7):
    rng = np.random.default_rng(seed)
    l = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_left),
        "ts": rng.integers(0, 10_000, n_left).astype("datetime64[s]"),
        "lid": np.arange(n_left),
    })
    r = pd.DataFrame({
        "k": rng.integers(0, n_keys, n_right),
        "ts": rng.integers(0, 10_000, n_right).astype("datetime64[s]"),
        "rid": np.arange(n_right),
        "rv": rng.normal(size=n_right).round(3),
    })
    # dedupe (k, ts) on the right so the asof winner is unambiguous
    r = r.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    return l, r


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_matches_pandas_merge_asof(ray_session, direction):
    import ray.data as rd

    l, r = _frames()
    out = (
        asof_join(
            rd.from_pandas(l).repartition(5), rd.from_pandas(r).repartition(3),
            by="k", on="ts", left_cols=["lid"], right_cols=["rid", "rv"],
            direction=direction,
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    expect = pd.merge_asof(
        l.sort_values("ts", kind="mergesort"),
        r.rename(columns={"rid": "rid_r", "rv": "rv_r"}).sort_values("ts", kind="mergesort"),
        on="ts", by="k", direction=direction,
    ).sort_values("lid").reset_index(drop=True)
    assert np.array_equal(
        out["rid_r"].to_numpy(), expect["rid_r"].to_numpy(), equal_nan=True
    )
    assert np.array_equal(
        out["rv_r"].to_numpy(), expect["rv_r"].to_numpy(), equal_nan=True
    )


def test_null_timestamps(ray_session):
    import ray.data as rd

    l = pd.DataFrame({"k": [1, 1], "ts": pd.to_datetime([None, "2024-01-02"]),
                      "lid": [0, 1]})
    r = pd.DataFrame({"k": [1, 1], "ts": pd.to_datetime(["2024-01-01", None]),
                      "rid": [10, 11]})
    out = (
        asof_join(rd.from_pandas(l), rd.from_pandas(r), by="k", on="ts",
                  left_cols=["lid"], right_cols=["rid"])
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert len(out) == 2  # null-ts left row kept (left outer)
    assert pd.isna(out.loc[0, "rid_r"])  # ...with null payload
    assert out.loc[1, "rid_r"] == 10  # null-ts right row never matches


def test_range_join_overlapping_bands(ray_session):
    import ray.data as rd

    from great_expectations_ray.functions.rangejoin import range_join_broadcast

    bands = pd.DataFrame({"band": ["a", "b"], "lo": [0.0, 5.0], "hi": [10.0, 15.0]})
    t = pa.table({"v": pa.array([1.0, 7.0, 12.0, 20.0])})
    out = (
        range_join_broadcast(rd.from_arrow(t).repartition(2), bands,
                             value_col="v", keep_cols=["v"], interval_cols=["band"])
        .to_pandas()
    )
    got = sorted(zip(out["v"], out["band"]))
    # 7.0 overlaps BOTH bands (1:N); 20.0 matches none (inner semantics)
    assert got == [(1.0, "a"), (7.0, "a"), (7.0, "b"), (12.0, "b")]


def test_range_join_validates_interval_schema(ray_session):
    import ray.data as rd

    from great_expectations_ray.functions.rangejoin import range_join_broadcast

    with pytest.raises(ValueError):
        range_join_broadcast(
            rd.from_arrow(pa.table({"v": [1.0]})),
            pd.DataFrame({"band": ["x"], "start": [0.0]}),
            value_col="v", keep_cols=["v"], interval_cols=["band"],
        )


def test_null_join_keys_never_match(ray_session):
    import ray.data as rd

    l = pd.DataFrame({"k": pd.array([None, 1], dtype="Int64"),
                      "ts": pd.to_datetime(["2024-01-05", "2024-01-05"]),
                      "lid": [0, 1]})
    r = pd.DataFrame({"k": pd.array([None, 1], dtype="Int64"),
                      "ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
                      "rid": [10, 11]})
    out = (
        asof_join(rd.from_pandas(l), rd.from_pandas(r), by="k", on="ts",
                  left_cols=["lid"], right_cols=["rid"])
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    assert len(out) == 2
    assert pd.isna(out.loc[0, "rid_r"])  # SQL: NULL = NULL is not a match
    assert out.loc[1, "rid_r"] == 11


def test_right_only_keys_keep_schema(ray_session):
    import ray.data as rd

    # a key existing ONLY on the right produces an empty-left bucket; the
    # emitted block must stay typed (no pa.null columns / dtype upcasts)
    l = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-02"]), "lid": [7]})
    r = pd.DataFrame({"k": [1, 2, 3, 4], "ts": pd.to_datetime(["2024-01-01"] * 4),
                      "rid": [10, 11, 12, 13]})
    out = (
        asof_join(rd.from_pandas(l).repartition(1), rd.from_pandas(r).repartition(2),
                  by="k", on="ts", left_cols=["lid"], right_cols=["rid"])
        .to_pandas()
    )
    assert out["lid"].tolist() == [7]
    assert str(out["lid"].dtype).startswith("int")  # not upcast to float


def test_asof_rejects_key_overlap(ray_session):
    import ray.data as rd

    l = pd.DataFrame({"k": [1], "ts": pd.to_datetime(["2024-01-01"]), "lid": [0]})
    with pytest.raises(ValueError):
        asof_join(rd.from_pandas(l), rd.from_pandas(l), by="k", on="ts",
                  left_cols=["k", "lid"], right_cols=["lid"])


def test_range_join_no_match_batches_keep_schema(ray_session):
    import ray.data as rd

    from great_expectations_ray.functions.rangejoin import range_join_broadcast

    bands = pd.DataFrame({"band": ["a"], "lo": [100.0], "hi": [200.0]})
    t = pa.table({"v": pa.array([1.0, 2.0])})  # nothing matches
    out = range_join_broadcast(rd.from_arrow(t).repartition(2), bands,
                               value_col="v", keep_cols=["v"], interval_cols=["band"])
    tbl = pa.concat_tables(out.to_arrow_refs() and
                           [pa.Table.from_pandas(out.to_pandas())])
    assert len(out.to_pandas()) == 0
    # schema of the empty result keeps the interval column's real type
    assert out.schema().base_schema.field("band").type == pa.string()
