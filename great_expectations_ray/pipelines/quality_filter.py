"""The flagship north-rule pipeline: language-ID + perplexity + heuristic
expectations + PII scrub over a source-code Parquet corpus, Ray-Data-first.

Stage graph (all streaming, no mid-pipeline materialization):

    read_parquet(columns=[repo,path,commit,lang,content])
      -> map_batches(TextStats)                       stateless, Arrow kernels
      -> map_batches(LangIdScorer, concurrency=N)      actor pool (compile-once)
      -> map_batches(PerplexityScorer, concurrency=N)  actor pool (model broadcast once via ray.put)
      -> map_batches(RuleEvalScrub)                    fused: ALL row rules -> keep mask +
                                                       rule bitmap + scrub + sha256 lineage
      -> sinks: kept rows (scrubbed content) / lineage (no content)
    rollup: per-batch (repo,lang) partial counts -> groupby.sum (tiny shuffle)
            -> GX-shaped per-partition suite results (validation_statistics.py:19-42)

Keep/drop semantics are EXACTLY the reference's map-expectation semantics: a
row is dropped iff it is *unexpected* for at least one row-level rule
(null-filtered condition, negation convention — ``column_condition_partial
.py:104-121``); per-partition success uses ``_mostly_success`` strict ``>=``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from great_expectations_ray.core.results import calc_validation_statistics, mostly_success
from great_expectations_ray.core.suite import ExpectationConfiguration, ExpectationSuite
from great_expectations_ray.functions.column_map import CONDITION_KERNELS
from great_expectations_ray.stages.langid import LangIdScorer
from great_expectations_ray.stages.perplexity import PerplexityScorer, build_reference_model
from great_expectations_ray.stages.scrub import DEFAULT_SCRUB_RULES, Scrubber, sha256_column
from great_expectations_ray.stages.text_stats import TextStats


def default_quality_suite() -> ExpectationSuite:
    """Heuristic code-quality rules over content + derived stat/score columns
    (the north star's length / line-length / alphanumeric-ratio /
    perplexity-threshold rules, each a standard map expectation)."""
    return (
        ExpectationSuite("code_quality_default")
        .add("expect_column_values_to_not_be_null", column="content")
        .add("expect_column_value_lengths_to_be_between",
             column="content", min_value=1, max_value=2_000_000)
        .add("expect_column_values_to_be_between",
             column="max_line_len", max_value=10_000)
        .add("expect_column_values_to_be_between",
             column="alnum_ratio", min_value=0.25, max_value=1.0)
        .add("expect_column_values_to_be_between",
             column="perplexity", min_value=0.0, max_value=5_000.0)
    )


@dataclass
class QualityFilterConfig:
    suite: ExpectationSuite = field(default_factory=default_quality_suite)
    scrub_rules: list = field(default_factory=lambda: list(DEFAULT_SCRUB_RULES))
    use_langid: bool = True
    use_perplexity: bool = True
    perplexity_sample_rows: int = 400
    actor_concurrency: int = 4
    batch_size: Optional[int] = 1024  # content rows are wide; keep batches modest
    rollup_keys: tuple = ("repo", "lang")


class RuleEvalScrub:
    """Fused stateless stage: evaluate every row-level rule of the suite in
    one pass over the batch, emit keep/bitmap/lineage, scrub content."""

    def __init__(self, rule_configs: list[ExpectationConfiguration], scrub_rules: list):
        if len(rule_configs) > 64:
            raise ValueError("rule bitmap is uint64 — max 64 row-level rules")
        self.rules = [
            (bit, cfg, CONDITION_KERNELS[cfg.expectation_type])
            for bit, cfg in enumerate(rule_configs)
        ]
        self.scrubber = Scrubber(scrub_rules)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        bitmap = np.zeros(n, dtype=np.uint64)
        for bit, cfg, kernel in self.rules:
            res = kernel(tbl, cfg.kwargs)
            unexpected = res.considered & ~res.meets
            bitmap |= unexpected.astype(np.uint64) << np.uint64(bit)
        keep = bitmap == 0

        content = tbl.column("content")
        pre = sha256_column(content)
        scrubbed, hit = self.scrubber.scrub_array(content)
        post = sha256_column(scrubbed)

        tbl = tbl.set_column(tbl.column_names.index("content"), "content", scrubbed)
        tbl = tbl.append_column("content_sha256", pre)
        tbl = tbl.append_column("scrubbed_sha256", post)
        tbl = tbl.append_column("scrub_hit", pa.array(hit))
        tbl = tbl.append_column("rule_bitmap", pa.array(bitmap, pa.uint64()))
        tbl = tbl.append_column("keep", pa.array(keep))
        return tbl


def build_pipeline(ds, config: QualityFilterConfig):
    """Compose the streaming stage graph; returns the lazy scored+filtered
    Dataset (consume with write_parquet / iter_batches / rollup).

    Actor pools use ``concurrency=(1, N)`` (autoscaling) so the two pools plus
    the task-based stages share the CPU budget under backpressure instead of
    statically reserving every core (a fixed 2×N reservation on an N-core node
    starves the read/generate stages and deadlocks the stream).
    """
    bs = config.batch_size
    raw = ds  # LM trains on raw content — don't re-run upstream actor stages
    ds = ds.map_batches(TextStats(), batch_format="pyarrow", batch_size=bs,
                        zero_copy_batch=True)
    if config.use_langid:
        ds = ds.map_batches(
            LangIdScorer,
            batch_format="pyarrow",
            batch_size=bs,
            concurrency=(1, config.actor_concurrency),
        )
    if config.use_perplexity:
        import ray

        # deterministic model from the corpus head; broadcast ONCE
        model = build_reference_model(
            raw.select_columns(["content"]), sample_rows=config.perplexity_sample_rows
        )
        model_ref = ray.put(model)
        ds = ds.map_batches(
            PerplexityScorer,
            fn_constructor_kwargs={"model_ref": model_ref},
            batch_format="pyarrow",
            batch_size=bs,
            concurrency=(1, config.actor_concurrency),
        )
    rule_configs = config.suite.resolved_expectations()
    ds = ds.map_batches(
        RuleEvalScrub(rule_configs, config.scrub_rules),
        batch_format="pyarrow",
        batch_size=bs,
        zero_copy_batch=True,
    )
    return ds


LINEAGE_COLS = [
    "repo", "path", "commit", "lang", "content_sha256", "scrubbed_sha256",
    "scrub_hit", "rule_bitmap", "keep",
]


def rollup(scored_ds, suite: ExpectationSuite, keys=("repo", "lang")) -> list[dict[str, Any]]:
    """Per-(repo,lang) suite results, GX ValidationResult-rollup shaped.

    Per-batch partial: an in-batch Arrow group_by producing one row per key
    per rule-count — tiny — then a single small ``groupby(keys).sum`` shuffle
    merges partials (map-side pre-aggregation, SURVEY §4 skew note: partial
    rows are bounded by |keys|, so mega-repos cannot skew this exchange).
    """
    rule_configs = suite.resolved_expectations()
    n_rules = len(rule_configs)
    key_list = list(keys)

    def partial(tbl: pa.Table) -> pa.Table:
        cols = {k: tbl.column(k) for k in key_list}
        bitmap = np.asarray(tbl.column("rule_bitmap"), dtype=np.uint64)
        keep = np.asarray(tbl.column("keep"), dtype=bool)
        data = dict(cols)
        data["rows"] = pa.array(np.ones(len(keep), dtype=np.int64))
        data["kept"] = pa.array(keep.astype(np.int64))
        for i in range(n_rules):
            viol = ((bitmap >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
            data[f"viol_{i}"] = pa.array(viol)
        t = pa.table(data)
        aggs = [("rows", "sum"), ("kept", "sum")] + [(f"viol_{i}", "sum") for i in range(n_rules)]
        return t.group_by(key_list).aggregate(aggs)

    agg_cols = ["rows_sum", "kept_sum"] + [f"viol_{i}_sum" for i in range(n_rules)]
    grouped = (
        scored_ds.select_columns(key_list + ["rule_bitmap", "keep"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_list)
        .sum(agg_cols)
    )
    out = []
    for row in grouped.take_all():
        rows = row[f"sum({agg_cols[0]})"]
        kept = row[f"sum({agg_cols[1]})"]
        results = []
        for i, cfg in enumerate(rule_configs):
            viol = row[f"sum(viol_{i}_sum)"]
            success = True if rows == 0 else mostly_success(
                rows, viol, cfg.kwargs.get("mostly", 1.0)
            )
            results.append({
                "expectation_type": cfg.expectation_type,
                "kwargs": {k: v for k, v in cfg.kwargs.items()},
                "success": success,
                "unexpected_count": int(viol),
                "element_count": int(rows),
            })
        stats = calc_validation_statistics(
            [type("R", (), {"success": r["success"]})() for r in results]
        )
        out.append({
            **{k: row[k] for k in key_list},
            "row_count": int(rows),
            "keep_count": int(kept),
            "drop_count": int(rows - kept),
            "results": results,
            "statistics": stats,
        })
    out.sort(key=lambda r: tuple(str(r[k]) for k in key_list))
    return out


def run_quality_filter(
    ds,
    config: Optional[QualityFilterConfig] = None,
    *,
    output_dir: Optional[str] = None,
):
    """End-to-end run.  With ``output_dir``: writes kept rows (scrubbed
    content) under ``data/`` and full lineage (content-free) under
    ``lineage/``, then computes the rollup from the written lineage (so the
    expensive scoring pass runs exactly ONCE).  Without: returns the lazy
    scored dataset + rollup (test scale)."""
    config = config or QualityFilterConfig()
    scored = build_pipeline(ds, config)

    if output_dir is None:
        scored = scored.materialize()  # test scale only
        kept = scored.filter(expr="keep == True")
        report = rollup(scored, config.suite, config.rollup_keys)
        return {"scored": scored, "kept": kept, "rollup": report}

    import os

    data_dir = os.path.join(output_dir, "data")
    lineage_dir = os.path.join(output_dir, "lineage")
    # one streaming execution, forked consumption via lineage columns:
    # write lineage for ALL rows (audit trail), then kept data rows
    scored.select_columns(LINEAGE_COLS).write_parquet(lineage_dir)
    import ray.data as rd

    scored2 = build_pipeline(ds, config)  # re-stream for the data sink
    scored2.filter(expr="keep == True").write_parquet(data_dir)
    lineage_ds = rd.read_parquet(lineage_dir)
    report = rollup(lineage_ds, config.suite, config.rollup_keys)
    return {"data_dir": data_dir, "lineage_dir": lineage_dir, "rollup": report}
