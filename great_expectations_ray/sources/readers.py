"""Sources — batch-spec-style readers over Ray Data.

The reference guesses a pandas reader from the file extension
(``pandas_execution_engine.py:399-434``) and wraps object-store URIs
(S3/GCS/Azure) behind the same API.  Ray Data's readers already accept
``s3://``/``gs://`` URIs through Arrow filesystems, so the mapping is thin:
extension -> ``ray.data.read_*``, with column pruning and row filters pushed
into the parquet scan (prune at the read — never load columns a 2-column
transform won't touch)."""

from __future__ import annotations

import os
from typing import Any, Optional

_EXT_READERS = {
    ".parquet": "read_parquet",
    ".pq": "read_parquet",
    ".csv": "read_csv",
    ".tsv": "read_csv",
    ".json": "read_json",
    ".jsonl": "read_json",
    ".txt": "read_text",
}


def read_batch(
    path_or_paths: str | list[str],
    *,
    columns: Optional[list[str]] = None,
    filter_expr: Any = None,
    reader: Optional[str] = None,
    **reader_options: Any,
):
    """Materialize a "Batch" (SURVEY §1) as a lazy ``ray.data.Dataset``.

    ``reader`` overrides extension guessing (the reference's
    ``reader_method``); ``columns``/``filter_expr`` push projection and
    row-group pruning into parquet scans."""
    import ray.data as rd

    first = path_or_paths[0] if isinstance(path_or_paths, list) else path_or_paths
    if reader is None:
        ext = os.path.splitext(first)[1].lower()
        if ext not in _EXT_READERS and os.path.isdir(first):
            ext = ".parquet"  # directory of parquet parts — the common layout
        if ext not in _EXT_READERS:
            raise ValueError(
                f"cannot guess reader for {first!r}; pass reader='read_parquet'|... "
                f"(known: {sorted(_EXT_READERS)})"
            )
        reader = _EXT_READERS[ext]

    fn = getattr(rd, reader)
    kwargs = dict(reader_options)
    if reader == "read_parquet":
        if columns is not None:
            kwargs["columns"] = columns
        if filter_expr is not None:
            kwargs["filter"] = filter_expr
        return fn(path_or_paths, **kwargs)
    ds = fn(path_or_paths, **kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


def from_memory(data: Any):
    """RuntimeDataBatchSpec analog: wrap an in-memory table/frame."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(data, pa.Table):
        return rd.from_arrow(data)
    if isinstance(data, pd.DataFrame):
        return rd.from_pandas(data)
    raise TypeError(f"unsupported in-memory batch type {type(data)}")
