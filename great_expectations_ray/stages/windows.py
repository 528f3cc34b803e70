"""Windowed aggregates over event streams.

The reference has NO streaming/window semantics (SURVEY §2.6) — these are the
training-pipeline extensions for stream-shaped tables (`events`): treat the
input as an ordered, partitioned log; windows are computed per key inside
``groupby(key).map_groups`` over the ts-sorted group (ordering assumption:
ts is unique per (key, event_id) tiebreak — stated per the Ray guide).

- tumbling: fixed-width buckets — ALSO expressible as a pure bucket groupby
  (``floor(ts/width)``), which is the shuffle-cheap path used by default.
- sliding: width + slide step; one row per (key, window_start).
- session: gap-based sessionization per key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def tumbling_window_agg(
    ds,
    *,
    ts_col: str,
    key_col: str,
    value_col: str,
    width_us: int,
):
    """One row per (key, window_start): count + sum + mean of value.

    Implemented as a BUCKET groupby (no per-key ordering needed — tumbling
    windows are order-free), so the only exchange is one hash shuffle on
    (key, bucket)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def bucketize(tbl: pa.Table) -> pa.Table:
        ts = pc.cast(tbl.column(ts_col), pa.int64())
        bucket = pc.multiply(pc.divide(ts, width_us), width_us)
        t = pa.table({
            key_col: tbl.column(key_col),
            "window_start": bucket,
            "cnt": pa.array(np.ones(tbl.num_rows, dtype=np.int64)),
            "val_sum": pc.cast(tbl.column(value_col), pa.float64()),
        })
        # map-side partial per (key, bucket) before the shuffle
        return t.group_by([key_col, "window_start"]).aggregate(
            [("cnt", "sum"), ("val_sum", "sum")]
        )

    grouped = (
        ds.select_columns([key_col, ts_col, value_col])
        .map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .sum(["cnt_sum", "val_sum_sum"])
    )
    return grouped  # columns: key, window_start, sum(cnt_sum), sum(val_sum_sum)


def sliding_window_agg(
    ds,
    *,
    ts_col: str,
    key_col: str,
    value_col: str,
    width_us: int,
    slide_us: int,
):
    """Sliding windows per key: each event lands in width/slide windows.
    Explode to (key, window_start) then aggregate — shuffle volume multiplies
    by the overlap factor, stated cost of sliding semantics."""
    import pyarrow as pa
    import pyarrow.compute as pc

    k = width_us // slide_us

    def explode(tbl: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(tbl.column(ts_col), pa.int64()))
        n = len(ts)
        # windows containing t: starts in (t-width, t] aligned to slide
        last_start = (ts // slide_us) * slide_us
        starts = last_start[:, None] - np.arange(k)[None, :] * slide_us
        valid = starts > (ts[:, None] - width_us)
        keys = np.repeat(np.asarray(tbl.column(key_col)), k)
        vals = np.repeat(np.asarray(pc.cast(tbl.column(value_col), pa.float64())), k)
        flat_starts = starts.reshape(-1)
        flat_valid = valid.reshape(-1)
        t = pa.table({
            key_col: pa.array(keys[flat_valid]),
            "window_start": pa.array(flat_starts[flat_valid]),
            "cnt": pa.array(np.ones(int(flat_valid.sum()), dtype=np.int64)),
            "val_sum": pa.array(vals[flat_valid]),
        })
        return t.group_by([key_col, "window_start"]).aggregate(
            [("cnt", "sum"), ("val_sum", "sum")]
        )

    return (
        ds.select_columns([key_col, ts_col, value_col])
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "window_start"])
        .sum(["cnt_sum", "val_sum_sum"])
    )


def session_windows(
    ds,
    *,
    ts_col: str,
    key_col: str,
    gap_us: int,
):
    """Gap-based sessions per key: one row per session with start/end/count.
    Needs per-key ordering -> groupby(key).map_groups over the sorted group."""

    def sessionize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        if str(g[ts_col].dtype).startswith("datetime64"):
            # normalize to microseconds regardless of pandas' stored unit
            ts = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        else:
            ts = g[ts_col].astype("int64").to_numpy()
        new_session = np.ones(len(ts), dtype=bool)
        if len(ts) > 1:
            new_session[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new_session) - 1
        out = pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            "session_id": sid,
            "ts": ts,
        })
        agg = out.groupby("session_id").agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
        ).reset_index(drop=True)
        agg[key_col] = g[key_col].iloc[0]
        return agg[[key_col, "session_start", "session_end", "n_events"]]

    return ds.select_columns([key_col, ts_col]).groupby(key_col).map_groups(
        sessionize, batch_format="pandas"
    )
