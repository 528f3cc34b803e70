"""Driver-gate rehearsal: run every ``demo_queries`` entry on sf0.001 and
compare against its DuckDB oracle the way the driver does — row count, schema
(column names), and order-insensitive values."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from great_expectations_ray.pipelines import demo_queries as dq

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bool):
            df[c] = df[c].astype(bool)
        if str(df[c].dtype).startswith("int"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(dq.QUERIES))
def test_query_matches_oracle(name, con):
    ours = dq.QUERIES[name](SF_DIR)
    if not isinstance(ours, pd.DataFrame):
        ours = ours.to_pandas()
    if name not in dq.ORACLE_SQL:
        # rows-only check (model-based query, driver records the weaker gate)
        assert len(ours) > 0
        assert not ours.isna().any().any()
        return
    theirs = con.execute(dq.ORACLE_SQL[name]).fetchdf()
    ours, theirs = _normalize(ours), _normalize(theirs)
    assert list(ours.columns) == list(theirs.columns), (
        f"{name}: columns {list(ours.columns)} vs {list(theirs.columns)}"
    )
    assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)} rows"
    for c in ours.columns:
        a, b = ours[c], theirs[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True
            ), f"{name}.{c}: float mismatch\n{a[a.astype(float)!=b.astype(float)].head()}"
        else:
            eq = (a == b) | (a.isna() & b.isna())
            assert eq.all(), f"{name}.{c}: mismatch\n{pd.DataFrame({'ours': a[~eq], 'sql': b[~eq]}).head()}"


# ---- sf0.01 rehearsal for the fixture-backed model/LSH oracles ------------ #
# the driver's correctness gate runs at sf0.01; the fingerprint row selection
# in the fixture SQL must pick the right expected rows there too

FIXTURE_QUERIES = [
    "langid_methods_docs", "perplexity_methods_docs", "neardup_docs",
    "ann_methods_topk", "fingerprint_docs", "semdedup_embeddings",
    "token_stats_methods_docs",
]
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con01():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name", FIXTURE_QUERIES)
def test_fixture_query_matches_oracle_sf01(name, con01):
    ours = dq.QUERIES[name](SF01_DIR)
    if not isinstance(ours, pd.DataFrame):
        ours = ours.to_pandas()
    theirs = con01.execute(dq.ORACLE_SQL[name]).fetchdf()
    ours, theirs = _normalize(ours), _normalize(theirs)
    assert list(ours.columns) == list(theirs.columns)
    assert len(ours) == len(theirs), f"{name}: {len(ours)} vs {len(theirs)}"
    for c in ours.columns:
        a, b = ours[c], theirs[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0)
        else:
            assert ((a == b) | (a.isna() & b.isna())).all(), f"{name}.{c}"
