from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

from great_expectations_ray.functions.quantiles import grouped_quantiles_disc


def test_matches_duckdb_quantile_disc(ray_session):
    df = pd.DataFrame({
        "g": ["a"] * 20 + ["b"] * 7 + ["c"],
        "v": list(range(1, 21)) + [10, 30, 20, 50, 40, 70, 60] + [99],
    })
    out = (grouped_quantiles_disc(
        rd.from_arrow(pa.Table.from_pandas(df)),
        group_cols=["g"], value_col="v", qs=[0.25, 0.5, 0.95])
        .to_pandas().sort_values("g").reset_index(drop=True))
    ref = duckdb.sql("""
        SELECT g, quantile_disc(v, 0.25) AS p25, quantile_disc(v, 0.5) AS p50,
               quantile_disc(v, 0.95) AS p95
        FROM df GROUP BY g ORDER BY g""").fetchdf()
    pd.testing.assert_frame_equal(
        out.astype({"p25": "int64", "p50": "int64", "p95": "int64"}), ref)


def test_exact_rank_no_float_off_by_one(ray_session):
    # 0.95 * 20 == 19.000000000000004 in floats; exact rank is 19 -> value 19
    df = pd.DataFrame({"g": ["x"] * 20, "v": list(range(1, 21))})
    out = grouped_quantiles_disc(
        rd.from_arrow(pa.Table.from_pandas(df)),
        group_cols=["g"], value_col="v", qs=[0.95]).take_all()
    assert out[0]["p95"] == 19


def test_single_element_groups(ray_session):
    df = pd.DataFrame({"g": ["a", "b"], "v": [5, 9]})
    out = {r["g"]: r for r in grouped_quantiles_disc(
        rd.from_arrow(pa.Table.from_pandas(df)),
        group_cols=["g"], value_col="v", qs=[0.5, 0.95]).take_all()}
    assert out["a"]["p50"] == 5 and out["a"]["p95"] == 5
    assert out["b"]["p50"] == 9


def test_nulls_ignored_like_sql(ray_session):
    df = pd.DataFrame({
        "g": ["a", "a", "a", "a", "b"],
        "v": [1.0, 2.0, 3.0, None, None],
    })
    out = {r["g"]: r for r in grouped_quantiles_disc(
        rd.from_arrow(pa.Table.from_pandas(df)),
        group_cols=["g"], value_col="v", qs=[0.95]).take_all()}
    ref = duckdb.sql(
        "SELECT g, quantile_disc(v, 0.95) AS p95 FROM df GROUP BY g ORDER BY g"
    ).fetchdf()
    assert out["a"]["p95"] == ref["p95"][0] == 3.0
    # all-null group survives with a NULL quantile
    assert "b" in out and pd.isna(out["b"]["p95"]) and pd.isna(ref["p95"][1])
