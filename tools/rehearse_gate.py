"""Driver-gate rehearsal: run every catalog query AND its oracle SQL at a
given SF and compare the driver's way — row count, schema (sorted column
names), and exact values on the column-name-sorted frame.

Run:  python tools/rehearse_gate.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import great_expectations_ray.pipelines.demo_queries as dq

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    bad = 0
    for name in sorted(dq.QUERIES):
        try:
            ours = dq.QUERIES[name](sf_dir)
            if not isinstance(ours, pd.DataFrame):
                ours = ours.to_pandas()
            theirs = con.execute(dq.ORACLE_SQL[name]).fetchdf()
            a, b = normalize(ours), normalize(theirs)
            ok_rows = len(a) == len(b)
            ok_schema = list(a.columns) == list(b.columns)
            # dtype-strict: the driver hashes values, so an int64 frame vs a
            # float64 frame (DuckDB SUM(BIGINT)->HUGEINT->float) hash-mismatches
            # even when every value is equal.  Fail on numeric-class mismatch
            # (int/uint vs float) — the bug class that cost a red row in r2
            # (setops_nations) and r3 (bpe_apply_docs).
            ok_dtype = True
            if ok_schema:
                _cls = lambda k: "i" if k in "iu" else k  # noqa: E731
                for c in a.columns:
                    ka, kb = a[c].dtype.kind, b[c].dtype.kind
                    if {_cls(ka), _cls(kb)} == {"i", "f"}:
                        ok_dtype = False
                        print(f"     dtype-strict: {name}.{c} ours={a[c].dtype} "
                              f"oracle={b[c].dtype}", flush=True)
            ok_vals = ok_rows and ok_schema
            if ok_vals:
                for c in a.columns:
                    x, y = a[c], b[c]
                    if x.dtype.kind == "f" or y.dtype.kind == "f":
                        same = np.allclose(x.astype(float), y.astype(float),
                                           rtol=0, atol=0, equal_nan=True)
                    else:
                        same = x.astype(str).tolist() == y.astype(str).tolist()
                    if not same:
                        ok_vals = False
                        break
            status = "OK " if (ok_rows and ok_schema and ok_vals and ok_dtype) else "FAIL"
            if status == "FAIL":
                bad += 1
            print(f"{status} {name}: rows={len(a)}/{len(b)} "
                  f"schema={ok_schema} values={ok_vals} dtype={ok_dtype}", flush=True)
        except Exception as exc:  # noqa: BLE001
            bad += 1
            print(f"ERR  {name}: {type(exc).__name__}: {exc}", flush=True)
    print(f"\n{'ALL GREEN' if bad == 0 else f'{bad} FAILURES'} "
          f"({len(dq.QUERIES)} queries, {sf_dir})")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"))
