"""Data-docs-style static summary — the reference's UpdateDataDocs action
(``render/renderer/site_builder.py``) recast as a tiny static JSON+HTML
emitter over checkpoint results.  Runs as a post-run action callback."""

from __future__ import annotations

import html
import json
import os
from typing import Any


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
