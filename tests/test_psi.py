"""Population Stability Index (functions/psi.py)."""

import numpy as np
import pandas as pd
import ray

from great_expectations_ray.functions.psi import psi_bins


def _ds(values, parts=3):
    return ray.data.from_pandas(
        pd.DataFrame({"v": np.asarray(values, dtype=np.float64)})
    ).repartition(parts)


def test_psi_identical_distributions_near_zero():
    rng = np.random.default_rng(4)
    x = rng.normal(size=4000)
    out = psi_bins(_ds(x), _ds(x), "v")
    assert len(out) == 10
    # identical populations: every term is ~0 (Laplace smoothing only)
    assert out.attrs["psi"] < 1e-6
    assert (out["base_cnt"] == out["cur_cnt"]).all()


def test_psi_detects_shift():
    rng = np.random.default_rng(4)
    base = rng.normal(size=4000)
    cur = rng.normal(loc=0.8, size=4000)
    out = psi_bins(_ds(base), _ds(cur), "v")
    # industry rule of thumb: >0.25 = major shift
    assert out.attrs["psi"] > 0.25
    assert out["base_cnt"].sum() == 4000
    assert out["cur_cnt"].sum() == 4000


def test_psi_partition_invariance():
    rng = np.random.default_rng(7)
    base = rng.uniform(size=1500)
    cur = rng.uniform(size=1100) ** 2
    a = psi_bins(_ds(base, 1), _ds(cur, 1), "v")
    b = psi_bins(_ds(base, 7), _ds(cur, 5), "v")
    assert a.equals(b)
    assert a.attrs["psi"] == b.attrs["psi"]


def test_cli_drift_psi_columns(ray_session, capsys):
    import json

    from great_expectations_ray.__main__ import main

    rc = main(["drift",
               "--baseline", "/root/testdata/sf0.001/lineitem.parquet",
               "--current", "/root/testdata/sf0.001/lineitem.parquet",
               "--psi-columns", "l_quantity"])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0  # identical data: no drift
    assert rep["psi"]["l_quantity"]["psi"] < 1e-9
    assert len(rep["psi"]["l_quantity"]["bins"]) == 10


def test_distributed_ks_2samp_datasets_matches_single_dataset_form():
    """The two-dataset form agrees with an independent per-driver ECDF
    computation and detects a shifted distribution."""
    import numpy as np

    from great_expectations_ray.functions.ks import (
        distributed_ks_2samp_datasets,
    )

    rng = np.random.default_rng(12)
    a = rng.normal(size=900)
    b = rng.normal(loc=0.5, size=700)
    r = distributed_ks_2samp_datasets(_ds(a, 4), _ds(b, 3), "v")

    # reference D via brute-force ECDF sup over all sample points
    pts = np.concatenate([a, b])
    fa = np.searchsorted(np.sort(a), pts, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), pts, side="right") / len(b)
    d_ref = np.abs(fa - fb).max()
    assert abs(r["d_statistic"] - d_ref) < 1e-12
    assert r["p_value"] < 1e-6
    assert (r["n_a"], r["n_b"]) == (900, 700)


def test_cli_drift_ks_columns(ray_session, capsys):
    import json

    from great_expectations_ray.__main__ import main

    rc = main(["drift",
               "--baseline", "/root/testdata/sf0.001/lineitem.parquet",
               "--current", "/root/testdata/sf0.001/lineitem.parquet",
               "--ks-columns", "l_extendedprice"])
    rep = json.loads(capsys.readouterr().out)
    assert rc == 0
    # identical data: D is zero up to float accumulation residue
    assert rep["ks"]["l_extendedprice"]["d_statistic"] < 1e-12


def test_psi_empty_baseline_raises(ray_session):
    """An empty/all-null baseline must raise a clear error instead of
    feeding negative rank targets into rank_select_values."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from great_expectations_ray.functions.psi import psi_bins

    base = rd.from_arrow(pa.table({"x": pa.array([None, None],
                                                 type=pa.float64())}))
    cur = rd.from_arrow(pa.table({"x": [1.0, 2.0, 3.0]}))
    with pytest.raises(ValueError, match="non-null"):
        psi_bins(base, cur, "x")
