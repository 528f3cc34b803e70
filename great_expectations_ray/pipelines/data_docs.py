"""Data-docs-style static summary — the reference's UpdateDataDocs action
(``render/renderer/site_builder.py``) recast as a tiny static JSON+HTML
emitter over checkpoint results.  Runs as a post-run action callback."""

from __future__ import annotations

import html
import json
import os
from typing import Any, Optional

from great_expectations_ray.pipelines.prescriptive import describe


def write_data_docs(output_root: str, checkpoint_result: Any) -> str:
    """Write ``docs/index.html`` + ``docs/summary.json`` under the run's
    output root; returns the html path."""
    docs = os.path.join(output_root, "docs")
    os.makedirs(docs, exist_ok=True)
    combined = checkpoint_result.combined_counts()
    payload = {
        "run": checkpoint_result.run_id.to_json_dict(),
        "combined": combined,
        "partitions_run": checkpoint_result.partitions_run,
        "partitions_skipped": checkpoint_result.partitions_skipped,
        "rollups": checkpoint_result.rollups,
    }
    with open(os.path.join(docs, "summary.json"), "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True, default=str)

    rows = []
    for pid, rep in sorted(checkpoint_result.rollups.items()):
        for grp in rep:
            keys = {k: v for k, v in grp.items()
                    if k not in ("results", "statistics", "row_count",
                                 "keep_count", "drop_count")}
            stats = grp["statistics"]
            rows.append(
                f"<tr><td>{html.escape(pid)}</td>"
                f"<td>{html.escape(json.dumps(keys))}</td>"
                f"<td>{grp['row_count']}</td><td>{grp['keep_count']}</td>"
                f"<td>{grp['drop_count']}</td>"
                f"<td>{stats['successful_expectations']}/{stats['evaluated_expectations']}</td></tr>"
            )
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        "<title>quality-filter run</title>"
        "<style>body{font-family:sans-serif;margin:2rem}table{border-collapse:"
        "collapse}td,th{border:1px solid #999;padding:4px 8px}</style></head><body>"
        f"<h1>Run: {html.escape(checkpoint_result.run_id.run_name)}</h1>"
        f"<p>rows={combined['row_count']} kept={combined['keep_count']} "
        f"dropped={combined['drop_count']} | partitions run="
        f"{len(checkpoint_result.partitions_run)} skipped="
        f"{len(checkpoint_result.partitions_skipped)}</p>"
        "<table><tr><th>partition</th><th>group</th><th>rows</th><th>kept</th>"
        "<th>dropped</th><th>rules ok</th></tr>"
        + "".join(rows)
        + "</table></body></html>"
    )
    path = os.path.join(docs, "index.html")
    with open(path, "w") as f:
        f.write(doc)
    return path


# --------------------------------------------------------------------------- #
# static HTML site over stored validation results — the reference's
# SiteBuilder (render/renderer/site_builder.py:1) recast: walk the
# ValidationResultsStore tree, render one page per result plus a run index.
# Page content mirrors the ValidationResultsPageRenderer essentials: suite
# header, statistics banner, and per-expectation rows with success icon,
# kwargs, observed_value / unexpected counts, and exception info.
# --------------------------------------------------------------------------- #

_CSS = (
    "body{font-family:sans-serif;margin:2rem;color:#222}"
    "table{border-collapse:collapse;margin:1rem 0}"
    "td,th{border:1px solid #bbb;padding:4px 10px;text-align:left;"
    "vertical-align:top}"
    ".ok{color:#0a7d32;font-weight:bold}.fail{color:#b3261e;font-weight:bold}"
    ".banner{padding:8px 14px;border-radius:6px;display:inline-block}"
    ".banner.ok{background:#e4f5e9}.banner.fail{background:#fbe9e7}"
    "code{background:#f4f4f4;padding:1px 4px}"
    "code.dim{color:#777;background:none;font-size:0.85em}"
    "p.dim{color:#777}"
    ".histbar{display:inline-block;height:10px;background:#4a7fb5;"
    "vertical-align:middle}"
    ".histcell{white-space:nowrap}"
    "details{margin:6px 0}summary{cursor:pointer;color:#555}"
    ".exclist{margin:8px 0;padding:8px 12px;background:#fff4f2;"
    "border:1px solid #e6b8b2;border-radius:6px}"
    ".exclist li{font-family:monospace;font-size:0.9em;margin:2px 0}"
    ".badge{background:#4a7fb5;color:#fff;border-radius:4px;"
    "padding:0 6px;font-size:0.85em}"
    # CSS-only tabs (reference site_index_page_renderer.py tab layout,
    # minus the bootstrap-table JS): radio inputs toggle panel visibility.
    ".tabs input[type=radio]{display:none}"
    ".tabs label{display:inline-block;padding:6px 16px;cursor:pointer;"
    "border:1px solid #bbb;border-bottom:none;border-radius:6px 6px 0 0;"
    "background:#f4f4f4;color:#555;margin-right:4px}"
    ".tabs .panel{display:none;border-top:1px solid #bbb;padding-top:4px}"
    "#tab-validations:checked~label[for=tab-validations],"
    "#tab-profiling:checked~label[for=tab-profiling],"
    "#tab-suites:checked~label[for=tab-suites]"
    "{background:#fff;color:#222;font-weight:bold}"
    "#tab-validations:checked~.panel-validations,"
    "#tab-profiling:checked~.panel-profiling,"
    "#tab-suites:checked~.panel-suites{display:block}"
    ".cta{margin:2rem 0;padding:14px 18px;background:#eef4fb;"
    "border:1px solid #b9cfe8;border-radius:6px}"
)


def _esc(v: Any) -> str:
    return html.escape(str(v))


def _fmt_result_cell(result: dict) -> str:
    """Observed-value cell: the fields a reader actually checks."""
    if not result:
        return ""
    bits = []
    if "observed_value" in result:
        bits.append(f"observed=<code>{_esc(result['observed_value'])}</code>")
    for k in ("element_count", "unexpected_count", "unexpected_percent"):
        if k in result and result[k] is not None:
            v = result[k]
            if isinstance(v, float):
                v = round(v, 4)
            bits.append(f"{k}={_esc(v)}")
    if result.get("partial_unexpected_list"):
        sample = result["partial_unexpected_list"][:5]
        bits.append(f"sample=<code>{_esc(sample)}</code>")
    return "<br>".join(bits)


def _render_unexpected_block(result: dict) -> str:
    """"Sampled Unexpected Values" content block (reference:
    render/renderer/content_block/validation_results_table_content_block —
    the unexpected-table GX shows under a failing map expectation).  Prefers
    ``partial_unexpected_counts`` (value + count, SUMMARY/COMPLETE formats);
    falls back to the raw ``partial_unexpected_list``."""
    counts = result.get("partial_unexpected_counts")
    if counts:
        rows = "".join(
            f"<tr><td><code>{_esc(e.get('value'))}</code></td>"
            f"<td>{_esc(e.get('count'))}</td></tr>"
            for e in counts
        )
        return (
            "<details open class='unexpected'><summary>Sampled unexpected "
            "values</summary><table><tr><th>value</th><th>count</th></tr>"
            + rows + "</table></details>"
        )
    sample = result.get("partial_unexpected_list")
    if not sample:
        return ""
    rows = "".join(
        f"<tr><td><code>{_esc(v)}</code></td></tr>" for v in sample
    )
    return (
        "<details open class='unexpected'><summary>Sampled unexpected "
        "values</summary><table><tr><th>value</th></tr>"
        + rows + "</table></details>"
    )


def _render_histogram_block(result: dict) -> str:
    """Histogram content block from ``details.observed_partition``
    (reference: render/renderer/content_block expected/observed distribution
    graphs, rendered here as pure-HTML bars).  Handles both shapes: a
    continuous partition (``bins`` = n+1 edges + n ``weights``) and a
    discrete one (``values`` + ``weights``)."""
    part = ((result.get("details") or {}).get("observed_partition")) or {}
    weights = part.get("weights") or []
    if not weights:
        return ""
    if part.get("bins"):
        edges = part["bins"]
        labels = [
            f"[{edges[i]:g}, {edges[i + 1]:g})" for i in range(len(edges) - 1)
        ]
    else:
        labels = [str(v) for v in part.get("values", [])]
    if len(labels) != len(weights):
        return ""
    peak = max(weights) or 1.0
    bars = "".join(
        f"<tr><td><code>{_esc(lab)}</code></td>"
        f"<td class='histcell'><div class='histbar' "
        f"style='width:{max(1, round(200 * w / peak))}px'></div> "
        f"{round(w, 4)}</td></tr>"
        for lab, w in zip(labels, weights)
    )
    tails = part.get("tail_weights")
    tail_html = (
        f"<p><code class='dim'>tail weights: {round(tails[0], 4)} / "
        f"{round(tails[1], 4)}</code></p>" if tails else ""
    )
    return (
        "<details open class='histogram'><summary>Observed distribution"
        "</summary><table><tr><th>bin</th><th>weight</th></tr>"
        + bars + "</table>" + tail_html + "</details>"
    )


def _render_exception_list(results: list[dict]) -> str:
    """'Failed expectations' bullet list over EVRs that raised — the
    reference's ExceptionListContentBlockRenderer
    (render/renderer/content_block/exception_list_content_block.py:80-88:
    '$column: $expectation_type raised an exception: $exception_message',
    rendered only when raised_exception is True)."""
    items = []
    for evr in results:
        exc = evr.get("exception_info") or {}
        if not exc.get("raised_exception"):
            continue
        cfg = evr.get("expectation_config") or {}
        etype = cfg.get("expectation_type") or cfg.get("type", "?")
        col = (cfg.get("kwargs") or {}).get("column")
        prefix = f"<span class='badge'>{_esc(col)}</span> " if col else ""
        items.append(
            f"<li>{prefix}<code>{_esc(etype)}</code> raised an exception: "
            f"{_esc(exc.get('exception_message', ''))}</li>"
        )
    if not items:
        return ""
    return (
        "<details class='exclist' open><summary>Failed expectations "
        f"({len(items)} raised)</summary><ul>" + "".join(items)
        + "</ul></details>"
    )


def _evr_rows(results: list[dict]) -> str:
    rows = []
    for evr in results:
        cfg = evr.get("expectation_config") or {}
        kwargs = {k: v for k, v in (cfg.get("kwargs") or {}).items()
                  if not k.startswith("_")}
        ok = evr.get("success")
        icon = "<span class='ok'>&#10003;</span>" if ok else "<span class='fail'>&#10007;</span>"
        exc = evr.get("exception_info") or {}
        exc_html = (
            f"<div class='fail'>{_esc(exc.get('exception_message', ''))}</div>"
            if exc.get("raised_exception") else ""
        )
        etype = cfg.get("expectation_type") or cfg.get("type", "?")
        result = evr.get("result") or {}
        blocks = ""
        if not ok:
            blocks += _render_unexpected_block(result)
        blocks += _render_histogram_block(result)
        rows.append(
            f"<tr><td>{icon}</td>"
            f"<td>{_esc(describe(etype, cfg.get('kwargs') or {}))}"
            f"<br><code class='dim'>{_esc(etype)} "
            f"{_esc(json.dumps(kwargs, sort_keys=True, default=str))}</code></td>"
            f"<td>{_fmt_result_cell(result)}{exc_html}{blocks}</td></tr>"
        )
    return (
        "<table><tr><th></th><th>expectation</th>"
        "<th>result</th></tr>" + "".join(rows) + "</table>"
    )


def _evr_sections(results: list[dict]) -> str:
    """Group EVRs into per-column sections, table-level first — the
    reference's ``_group_evrs_by_column`` layout
    (render/renderer/page_renderer.py:156-179, "Table-Level Expectations"
    ordering at :236-239).  Column name comes from the config's ``column``
    kwarg (``column_A/column_B`` and ``column_list`` land in table-level,
    matching the reference's single-column grouping rule)."""
    TABLE = "Table-Level Expectations"
    sections: dict[str, list[dict]] = {}
    for evr in results:
        cfg = evr.get("expectation_config") or {}
        col = (cfg.get("kwargs") or {}).get("column") or TABLE
        sections.setdefault(str(col), []).append(evr)
    ordered = ([TABLE] if TABLE in sections else []) + sorted(
        k for k in sections if k != TABLE
    )
    if len(ordered) <= 1 and TABLE in sections:
        # nothing but table-level rules: a single flat table reads better
        return _evr_rows(results)
    return "".join(
        f"<h3>{_esc(name)}</h3>" + _evr_rows(sections[name])
        for name in ordered
    )


def render_validation_page(payload: dict, *, title: str = "Validation result") -> str:
    """HTML page for one stored validation result.  Accepts both shapes:
    a ``SuiteValidationResult.to_json_dict()`` (has ``results``) and a
    checkpoint partition rollup (has ``rollup`` with per-group results)."""
    ok = bool(payload.get("success"))
    banner = (
        f"<p class='banner {'ok' if ok else 'fail'}'>"
        f"{'Succeeded' if ok else 'Failed'}</p>"
    )
    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head><body>"
        f"<h1>{_esc(title)}</h1>"
        f"<h2>Suite: {_esc(payload.get('suite_name', 'suite'))}</h2>{banner}"
    ]
    stats = payload.get("statistics")
    if stats:
        parts.append(
            f"<p>{stats.get('successful_expectations')}/"
            f"{stats.get('evaluated_expectations')} expectations succeeded "
            f"({round(stats.get('success_percent') or 0, 2)}%)</p>"
        )
    if payload.get("results"):
        parts.append(_render_exception_list(payload["results"]))
        parts.append(_evr_sections(payload["results"]))
    for grp in payload.get("rollup", []):
        keys = {k: v for k, v in grp.items()
                if k not in ("results", "statistics", "row_count",
                             "keep_count", "drop_count")}
        gs = grp.get("statistics", {})
        parts.append(
            f"<h3>Group <code>{_esc(json.dumps(keys, sort_keys=True, default=str))}</code>"
            f" — rows={grp.get('row_count')} kept={grp.get('keep_count')}"
            f" ({gs.get('successful_expectations')}/"
            f"{gs.get('evaluated_expectations')} rules ok)</h3>"
        )
        if grp.get("results"):
            parts.append(_evr_rows(grp["results"]))
    parts.append("</body></html>")
    return "".join(parts)


def render_suite_page(suite_dict: dict) -> str:
    """HTML page for a stored expectation suite (reference:
    ExpectationSuitePageRenderer shape — name, parameters, one row per
    expectation config)."""
    rows = []
    for cfg in suite_dict.get("expectations", []):
        kwargs = {k: v for k, v in (cfg.get("kwargs") or {}).items()}
        etype = cfg.get("expectation_type") or cfg.get("type", "?")
        rows.append(
            f"<tr><td>{_esc(describe(etype, kwargs))}</td>"
            f"<td><code>{_esc(etype)} "
            f"{_esc(json.dumps(kwargs, sort_keys=True, default=str))}</code></td></tr>"
        )
    params = suite_dict.get("suite_parameters") or {}
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>Suite: {_esc(suite_dict.get('name', 'suite'))}</title>"
        f"<style>{_CSS}</style></head><body>"
        f"<h1>Expectation suite: {_esc(suite_dict.get('name', 'suite'))}</h1>"
        + (f"<p>parameters: <code>{_esc(json.dumps(params, sort_keys=True))}"
           "</code></p>" if params else "")
        + "<table><tr><th>expectation</th><th>config</th></tr>"
        + "".join(rows)
        + "</table></body></html>"
    )


def render_profiling_page(
    profiles: dict, *, title: str = "Profiling results"
) -> str:
    """Descriptive page over profiler output — the reference's
    ProfilingResultsPageRenderer (render/renderer/page_renderer.py:875) +
    ProfilingResultsColumnSectionRenderer (column_section_renderer.py:61)
    essentials: a table overview, then one section per column with type,
    missing %, distinct count, numeric stats / string length range, and a
    value-set bar chart when the profile kept exact value counts.

    ``profiles`` is ``profiler.profile()`` output: name -> ColumnProfile
    (or an already-serialized ``to_json_dict()`` mapping)."""
    cols = []
    for name, prof in profiles.items():
        d = prof if isinstance(prof, dict) else prof.to_json_dict()
        cols.append((str(name), d))
    cols.sort(key=lambda kv: kv[0])
    row_count = max((d.get("row_count", 0) for _, d in cols), default=0)

    # dataset overview section — the reference's
    # profiling_results_overview_section_renderer.py:1 essentials: variable
    # type tally plus a per-column (type, missing, distinct) table, before
    # the per-column detail sections.
    type_tally: dict[str, int] = {}
    for _, d in cols:
        kind = ("numeric" if "mean" in d
                else "string" if "len_min" in d else "other")
        type_tally[kind] = type_tally.get(kind, 0) + 1
    tally_s = ", ".join(f"{k}=<code>{v}</code>"
                        for k, v in sorted(type_tally.items()))
    overview_rows = []
    for name, d in cols:
        rows = d.get("row_count", 0)
        nulls = d.get("null_count", 0)
        pct = round(100.0 * nulls / rows, 2) if rows else 0.0
        overview_rows.append(
            f"<tr><td><a href='#col-{_esc(name)}'>{_esc(name)}</a></td>"
            f"<td><code>{_esc(d.get('dtype'))}</code></td>"
            f"<td>{pct}%</td>"
            f"<td>{_esc(d.get('distinct_estimate'))}</td></tr>")

    parts = [
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head><body>"
        f"<h1>{_esc(title)}</h1>"
        "<h2>Overview</h2>"
        f"<p>rows=<code>{row_count}</code> "
        f"columns=<code>{len(cols)}</code> | variable types: {tally_s}</p>"
        "<table><tr><th>column</th><th>type</th><th>missing</th>"
        "<th>distinct&approx;</th></tr>"
        + "".join(overview_rows) + "</table>"
    ]
    for name, d in cols:
        rows = d.get("row_count", 0)
        nulls = d.get("null_count", 0)
        missing_pct = round(100.0 * nulls / rows, 2) if rows else 0.0
        facts = [
            f"type=<code>{_esc(d.get('dtype'))}</code>",
            f"missing={missing_pct}% ({nulls})",
            f"distinct&approx;{_esc(d.get('distinct_estimate'))}",
        ]
        if "mean" in d:
            facts.append(
                f"min=<code>{_esc(d.get('min'))}</code> "
                f"max=<code>{_esc(d.get('max'))}</code> "
                f"mean=<code>{_esc(round(d['mean'], 6))}</code> "
                f"stdev=<code>{_esc(round(d.get('stdev', 0.0), 6))}</code>"
            )
        if "len_min" in d:
            facts.append(
                f"value lengths <code>[{_esc(d['len_min'])}, "
                f"{_esc(d['len_max'])}]</code>"
            )
        parts.append(f"<h3 id='col-{_esc(name)}'>{_esc(name)}</h3><p>"
                     + " | ".join(facts) + "</p>")
        vs = d.get("value_set")
        if vs:
            parts.append(_render_histogram_block(
                {"details": {"observed_partition": {
                    "values": [str(v) for v in vs],
                    # profile keeps the set, not per-value counts: render
                    # presence bars (the reference's example-values list)
                    "weights": [1.0] * len(vs),
                }}}
            ).replace("Observed distribution", "Distinct values"))
    parts.append("</body></html>")
    return "".join(parts)


def _fmt_run_time(run: str) -> tuple[str, str]:
    """Split a stored ``{run_name}-{epoch}`` key into (run_name, formatted
    datetime) — the reference index's _get_formatted_datetime column
    (site_index_page_renderer.py:136).  Falls back to the raw key when no
    trailing epoch is present."""
    import datetime

    name, _, ts = run.rpartition("-")
    if name and ts.isdigit():
        dt = datetime.datetime.fromtimestamp(
            int(ts), tz=datetime.timezone.utc)
        return name, dt.strftime("%Y-%m-%d %H:%M:%S UTC")
    return run, ""


def build_site(root: str, site_dir: Optional[str] = None) -> str:
    """Build the browsable static site from every result in the
    ``ValidationResultsStore``, every suite in the ``ExpectationsStore`` and
    every profile in the ``ProfilingResultsStore`` under ``root``
    (site_builder.py:1 shape: ``index.html`` + one page per artifact).

    The index is the reference's SiteIndexPageRenderer layout
    (site_index_page_renderer.py:164-258): three tabs — Validation Results
    (run time / run name / batch / suite / status), Expectation Suites,
    Profiling Results — CSS-only (no JS), plus the call-to-action block
    (call_to_action_renderer.py) when the project has no artifacts yet.
    Returns the index path."""
    from great_expectations_ray.state.stores import (
        ExpectationsStore,
        ProfilingResultsStore,
        ValidationResultsStore,
    )

    site_dir = site_dir or os.path.join(root, "docs", "site")
    val_dir = os.path.join(site_dir, "validations")
    os.makedirs(val_dir, exist_ok=True)

    suite_rows = []
    try:
        es = ExpectationsStore(root)
        suites = es.list_suites()
    except Exception:
        suites = []
    if suites:
        suites_dir = os.path.join(site_dir, "expectations")
        os.makedirs(suites_dir, exist_ok=True)
        for name in suites:
            suite = es.load(name)
            page_rel = os.path.join("expectations", f"{name}.html")
            with open(os.path.join(site_dir, page_rel), "w") as f:
                f.write(render_suite_page(suite.to_json_dict()))
            suite_rows.append(
                f"<tr><td><a href='{_esc(page_rel)}'>{_esc(name)}</a></td>"
                f"<td>{len(suite.expectations)}</td></tr>"
            )

    store = ValidationResultsStore(root)

    index_rows = []
    for suite, run, batch in store.list_keys():
        payload = json.loads(
            store.backend.get(("validations", suite, run, f"{batch}.json"))
        )
        page_rel = os.path.join("validations", f"{suite}-{run}-{batch}.html")
        page = render_validation_page(
            payload, title=f"{suite} / {run} / {batch}"
        )
        with open(os.path.join(site_dir, page_rel), "w") as f:
            f.write(page)
        ok = bool(payload.get("success"))
        run_name, run_when = _fmt_run_time(run)
        index_rows.append(
            f"<tr><td>{_esc(run_when)}</td><td>{_esc(run_name)}</td>"
            f"<td>{_esc(batch)}</td>"
            f"<td><a href='{_esc(page_rel)}'>{_esc(suite)}</a></td>"
            f"<td class='{'ok' if ok else 'fail'}'>"
            f"{'&#10003;' if ok else '&#10007;'}</td></tr>"
        )

    prof_rows = []
    try:
        ps = ProfilingResultsStore(root)
        prof_keys = ps.list_keys()
    except Exception:
        prof_keys = []
    if prof_keys:
        prof_dir = os.path.join(site_dir, "profiling")
        os.makedirs(prof_dir, exist_ok=True)
        for asset, run in prof_keys:
            profiles = ps.load(asset, run)
            page_rel = os.path.join("profiling", f"{asset}-{run}.html")
            with open(os.path.join(site_dir, page_rel), "w") as f:
                f.write(render_profiling_page(
                    profiles, title=f"Profiling: {asset} / {run}"))
            run_name, run_when = _fmt_run_time(run)
            prof_rows.append(
                f"<tr><td>{_esc(run_when)}</td><td>{_esc(run_name)}</td>"
                f"<td><a href='{_esc(page_rel)}'>{_esc(asset)}</a></td>"
                f"<td>{len(profiles)}</td></tr>"
            )

    val_panel = (
        "<table><tr><th>run time</th><th>run name</th><th>batch</th>"
        "<th>suite</th><th>status</th></tr>" + "".join(index_rows)
        + "</table>"
    ) if index_rows else "<p class='dim'>No validation results stored.</p>"
    prof_panel = (
        "<table><tr><th>run time</th><th>run name</th><th>asset</th>"
        "<th>columns</th></tr>" + "".join(prof_rows) + "</table>"
    ) if prof_rows else "<p class='dim'>No profiling results stored.</p>"
    suites_panel = (
        "<table><tr><th>suite</th><th>expectations</th></tr>"
        + "".join(suite_rows) + "</table>"
    ) if suite_rows else "<p class='dim'>No expectation suites stored.</p>"

    body = (
        "<div class='tabs'>"
        "<input type='radio' name='tab' id='tab-validations' checked>"
        "<input type='radio' name='tab' id='tab-profiling'>"
        "<input type='radio' name='tab' id='tab-suites'>"
        f"<label for='tab-validations'>Validation Results"
        f" ({len(index_rows)})</label>"
        f"<label for='tab-profiling'>Profiling Results"
        f" ({len(prof_rows)})</label>"
        f"<label for='tab-suites'>Expectation Suites"
        f" ({len(suite_rows)})</label>"
        f"<div class='panel panel-validations'>{val_panel}</div>"
        f"<div class='panel panel-profiling'>{prof_panel}</div>"
        f"<div class='panel panel-suites'>{suites_panel}</div>"
        "</div>"
    )
    if not (index_rows or prof_rows or suite_rows):
        # call_to_action_renderer.py essentials: how to populate the site
        body += (
            "<div class='cta'><b>No Expectations, Validations, or Profiles "
            "yet.</b><p>Run a checkpoint to populate this site:</p>"
            "<p><code>python -m great_expectations_ray run "
            f"--input 'data/*.parquet' --output {_esc(root)}</code></p>"
            "<p>or profile a table: <code>python -m great_expectations_ray "
            f"profile --input data.parquet --root {_esc(root)}</code></p>"
            "</div>"
        )
    index = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>Data Docs</title><style>{_CSS}</style></head><body>"
        "<h1>Data Docs</h1>" + body + "</body></html>"
    )
    path = os.path.join(site_dir, "index.html")
    with open(path, "w") as f:
        f.write(index)
    return path


def render_grouped_page(
    grouped: dict,
    *,
    by: str,
    title: str = "Grouped validation",
) -> str:
    """HTML page for a ``validate_grouped`` result: a per-group summary
    table (status / rule counts / row count, anchor-linked) followed by
    each group's full EVR table — the Data Docs face of the one-pass
    grouped run (one page where the reference renders N separate
    validation pages for N batch slices)."""
    keys = sorted(grouped, key=lambda k: (k is None, str(k)))
    n_fail = sum(1 for k in keys if not grouped[k].success)
    banner_cls = "ok" if n_fail == 0 else "fail"
    head = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_esc(title)}</title><style>{_CSS}</style></head><body>"
        f"<h1>{_esc(title)}</h1>"
        f"<h2>Grouped by <code>{_esc(by)}</code> — {len(keys)} groups</h2>"
        f"<p class='banner {banner_cls}'>"
        f"{len(keys) - n_fail}/{len(keys)} groups succeeded</p>"
    )
    rows = []
    for i, k in enumerate(keys):
        r = grouped[k]
        st = r.statistics
        label = "(null)" if k is None else str(k)
        badge = "✓" if r.success else "✗"
        rows.append(
            f"<tr><td><a href='#grp-{i}'>{_esc(label)}</a></td>"
            f"<td>{badge}</td>"
            f"<td>{st.get('successful_expectations')}/"
            f"{st.get('evaluated_expectations')}</td>"
            f"<td>{r.meta.get('row_count')}</td></tr>")
    summary = (
        "<table><tr><th>group</th><th>status</th><th>rules ok</th>"
        "<th>rows</th></tr>" + "".join(rows) + "</table>")
    sections = []
    for i, k in enumerate(keys):
        r = grouped[k].to_json_dict()
        label = "(null)" if k is None else str(k)
        sections.append(
            f"<h3 id='grp-{i}'>Group <code>{_esc(label)}</code></h3>")
        if r.get("results"):
            sections.append(_render_exception_list(r["results"]))
            sections.append(_evr_rows(r["results"]))
    return head + summary + "".join(sections) + "</body></html>"
