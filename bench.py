#!/usr/bin/env python
"""Benchmark harness.

Headline: the flagship quality-filter pipeline (text stats + langid actor
pool + perplexity actor pool + fused rule-eval/scrub + parquet sinks +
rollup) over a deterministic synthetic code corpus sized to the sf, measured
in files/sec.  Plus per-query timings for a representative slice of the
operator catalog over $GRAFT_SF_DIR.

    python bench.py              # one JSON line on stdout
    python bench.py --scaling    # run at 8 and 32 CPUs in fresh processes,
                                 # report throughputs + scaling efficiency
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_ROWS = {"sf0.001": 2_000, "sf0.01": 20_000, "sf0.1": 200_000}

BENCH_QUERIES = [
    "agg_quantity",
    "value_counts_returnflag",
    "between_quantity",
    "regex_docs_by_lang",
    "dedup_docs_prefix",
    "token_stats_docs",
    "ann_topk",
    "events_increasing",
    "qf_corpus_keep",
]


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = 0.1
    n_rows = SF_ROWS.get(sf_name, 200_000)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=ncpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from great_expectations_ray.corpus import write_corpus_parquet
    from great_expectations_ray.pipelines import demo_queries as dq
    from great_expectations_ray.pipelines.quality_filter import (
        QualityFilterConfig,
        run_quality_filter,
    )

    corpus_dir = write_corpus_parquet(n_rows, f"/tmp/gxr_bench_corpus_{n_rows}")
    # warm the page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(corpus_dir).count()

    out_dir = tempfile.mkdtemp(prefix="gxr_bench_out_")
    cfg = QualityFilterConfig(actor_concurrency=max(2, ncpus // 3))
    t0 = time.time()
    res = run_quality_filter(rd.read_parquet(corpus_dir), cfg, output_dir=out_dir)
    headline = time.time() - t0
    n_groups = len(res["rollup"])
    shutil.rmtree(out_dir, ignore_errors=True)

    queries: dict[str, float] = {"quality_filter": round(headline, 3)}
    for name in BENCH_QUERIES:
        t0 = time.time()
        dq.QUERIES[name](sf_dir)
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "quality_filter_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "files_per_sec": round(n_rows / headline, 1),
        "corpus_rows": n_rows,
        "rollup_groups": n_groups,
        "queries": queries,
        "sf": sf,
        "num_cpus": ncpus,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job, two fresh processes at 8 and 32 CPUs — the sandbox stand-in
    for the two-cluster-size rule (BASELINE.md)."""

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_n, hi_n = 8, 32
    lo = run(lo_n)
    hi = run(hi_n)
    tp_lo = lo["files_per_sec"]
    tp_hi = hi["files_per_sec"]
    eff = (tp_hi / tp_lo) / (hi_n / lo_n)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        f"sec_{lo_n}": lo["value"],
        f"sec_{hi_n}": hi["value"],
        f"files_per_sec_{lo_n}": tp_lo,
        f"files_per_sec_{hi_n}": tp_hi,
        "corpus_rows": lo["corpus_rows"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
