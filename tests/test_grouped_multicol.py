"""Multi-column group keys for grouped validation (pipelines/grouped.py
``by=[...]``) — the reference partitions batch definitions by several
columns (e.g. year+month: datasource/fluent/batch_request.py); here the
same one-pass machinery groups on a tuple key, in both narrow (driver
results) and wide (bucketed-exchange verdict Dataset) modes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from great_expectations_ray import ExpectationSuite, validate
from great_expectations_ray.pipelines.grouped import (
    validate_grouped,
    validate_grouped_wide,
)


def _suite() -> ExpectationSuite:
    return (
        ExpectationSuite("mc")
        .add("expect_column_values_to_be_between", column="v",
             min_value=0, max_value=100, mostly=0.8)
        .add("expect_column_mean_to_be_between", column="v",
             min_value=10, max_value=60)
        .add("expect_table_row_count_to_be_between", min_value=1)
    )


def _frame() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    n = 500
    repo = rng.choice(["r1", "r2"], size=n).astype(object)
    lang = rng.choice(["py", "go", "js"], size=n).astype(object)
    repo[::67] = None          # null in one key column
    lang[::101] = None         # null in the other (some rows: both null)
    v = rng.integers(0, 80, size=n).astype(float)
    v[(repo == "r2") & (lang == "go")] += 200.0  # one failing cell
    return pd.DataFrame({"repo": repo, "lang": lang, "v": v})


def test_multicol_matches_per_slice_validate(ray_session):
    df = _frame()
    ds = rd.from_pandas(df).repartition(5)
    got = validate_grouped(ds, _suite(), by=["repo", "lang"])
    # keys are tuples covering every observed (repo, lang) combination
    expected_keys = set(
        df.groupby(["repo", "lang"], dropna=False).groups.keys())
    expected_keys = {
        tuple(None if pd.isna(x) else x for x in k) for k in expected_keys}
    assert set(got) == expected_keys
    for key, res in got.items():
        mask = pd.Series(True, index=df.index)
        for col, kv in zip(["repo", "lang"], key):
            mask &= df[col].isna() if kv is None else (df[col] == kv)
        ref = validate(
            rd.from_pandas(df[mask.fillna(False)].reset_index(drop=True)),
            _suite())
        assert res.statistics == ref.statistics, key
        assert res.meta["row_count"] == ref.meta["row_count"], key
        assert res.meta["group_key"] == key
        assert res.meta["group_by"] == ["repo", "lang"]
    # the engineered failing cell fails, its siblings pass
    assert not got[("r2", "go")].success
    assert got[("r1", "py")].success


def test_multicol_wide_matches_narrow(ray_session):
    df = _frame()
    ds = rd.from_pandas(df).repartition(4)
    narrow = validate_grouped(ds, _suite(), by=["repo", "lang"])
    wide = validate_grouped_wide(
        ds, _suite(), by=["repo", "lang"], n_buckets=8).to_pandas()
    assert set(wide.columns) >= {"group_repo", "group_lang", "success",
                                 "row_count"}
    assert len(wide) == len(narrow)
    for _, row in wide.iterrows():
        key = tuple(None if pd.isna(row[f"group_{c}"]) else row[f"group_{c}"]
                    for c in ("repo", "lang"))
        assert key in narrow, key
        assert bool(row["success"]) == bool(narrow[key].success), key
        assert int(row["row_count"]) == narrow[key].meta["row_count"], key


def test_multicol_single_element_list_matches_scalar_by(ray_session):
    df = _frame()
    ds = rd.from_pandas(df).repartition(3)
    a = validate_grouped(ds, _suite(), by="lang")
    b = validate_grouped(ds, _suite(), by=["lang"])
    assert set(b) == {(k,) for k in a}
    for k, res in a.items():
        assert b[(k,)].statistics == res.statistics


def test_multicol_two_phase_narrow(ray_session):
    # z-score rules need the per-group second pass — exercise it on a
    # 2-column key (per-(repo, lang) thresholds)
    df = _frame().dropna(subset=["repo", "lang"]).reset_index(drop=True)
    suite = ExpectationSuite("z").add(
        "expect_column_value_z_scores_to_be_less_than", column="v",
        threshold=6.0, double_sided=True)
    got = validate_grouped(rd.from_pandas(df).repartition(4), suite,
                           by=["repo", "lang"])
    for key, res in got.items():
        mask = (df["repo"] == key[0]) & (df["lang"] == key[1])
        ref = validate(rd.from_pandas(df[mask].reset_index(drop=True)), suite)
        assert res.success == ref.success, key
        assert res.statistics == ref.statistics, key


def test_multicol_bad_by_rejected(ray_session):
    ds = rd.from_pandas(_frame())
    with pytest.raises(ValueError, match="column name"):
        validate_grouped(ds, _suite(), by=[])
    with pytest.raises(ValueError, match="column name"):
        validate_grouped(ds, _suite(), by=[1, 2])  # type: ignore[list-item]


def test_multicol_cli_comma_by(ray_session, tmp_path, capsys):
    import json

    from great_expectations_ray.__main__ import main as cli_main

    df = _frame().dropna(subset=["repo", "lang"]).reset_index(drop=True)
    inp = tmp_path / "mc.parquet"
    df.to_parquet(inp)
    suite_path = tmp_path / "suite.json"
    suite_path.write_text(json.dumps(_suite().to_json_dict()))
    rc = cli_main(["validate", "--input", str(inp), "--suite",
                   str(suite_path), "--by", "repo,lang"])
    out = json.loads(capsys.readouterr().out)
    # one entry per (repo, lang) combination, keyed by str(tuple)
    assert any(k.startswith("('r1'") for k in out), list(out)[:3]
    assert rc == 1  # the engineered (r2, go) failure drives the exit code
