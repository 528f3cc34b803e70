"""Corpus diff — dataset versioning between two snapshots of a corpus:
which documents were ADDED, REMOVED, CHANGED (same id, different content)
or UNCHANGED.  The audit artifact an incremental-crawl pipeline publishes
next to each release (and the precondition for incremental downstream
recompute: only added+changed docs re-enter the pipeline).

Distributed shape: each side projects to ``(id, content-hash)`` — document
bytes never move — then a side-tagged union meets in ONE bucketed exchange
on id; per id the status falls out of which sides are present and whether
the hashes agree.  Hashes ride ``scrub.sha256_column`` (straight off the
Arrow buffer).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

STATUSES = ("added", "removed", "changed", "unchanged")


def diff_corpora(old_ds, new_ds, *, id_col: str = "doc_id",
                 content_col: str = "text", n_buckets: int = 64):
    """Dataset of (id_col, status) over the UNION of both sides' ids."""
    from great_expectations_ray.functions.bucketed import grouped_apply_bucketed
    from great_expectations_ray.stages.scrub import sha256_column

    def project(side: int):
        def f(tbl: pa.Table) -> pa.Table:
            return pa.table({
                id_col: tbl.column(id_col),
                "h": sha256_column(tbl.column(content_col)),
                "side": pa.array(
                    np.full(tbl.num_rows, side, dtype=np.int8)),
            })

        return f

    both = (
        old_ds.select_columns([id_col, content_col])
        .map_batches(project(0), batch_format="pyarrow", zero_copy_batch=True)
        .union(new_ds.select_columns([id_col, content_col])
               .map_batches(project(1), batch_format="pyarrow",
                            zero_copy_batch=True)))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "side"], kind="mergesort")
        grp = g.groupby(id_col, sort=False)
        sides = grp["side"].agg(["min", "max"])
        nh = grp["h"].nunique()
        status = np.where(
            sides["min"] == 1, "added",
            np.where(sides["max"] == 0, "removed",
                     np.where(nh > 1, "changed", "unchanged")))
        return pd.DataFrame({id_col: sides.index.to_numpy(),
                             "status": status})

    return grouped_apply_bucketed(both, [id_col], resolve,
                                  n_buckets=n_buckets)
