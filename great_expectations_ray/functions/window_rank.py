"""Partitioned window functions — row_number / rank / dense_rank / lag /
lead over (PARTITION BY key ORDER BY order_cols).

Ray Data has no window functions; this fills the gap with the engine's
standard wide-op shape: ONE bucketed ``groupby(hash(key))`` exchange (equal
keys co-locate; high key cardinality costs no per-group overhead — see
functions/bucketed.py), then one vectorized pandas pass per bucket.

Semantics match SQL:

- ``order_by`` may be one column or a list (composite ordering — pass a
  unique tie-breaker for a deterministic row_number, same requirement SQL
  has); each entry is ``"col"`` (ASC) or ``("col", "desc")``, nulls LAST
  either way (mirror with NULLS LAST in oracle SQL for DESC);
- null order keys sort LAST and still receive ranks (SQL NULLS LAST) —
  they never crash the kernel;
- ``rank`` = row_number of the first peer (method='min'), ``dense_rank``
  increments once per distinct order tuple; both handle composite
  orderings via vectorized run detection over the sorted bucket.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

from great_expectations_ray.functions.bucketed import grouped_apply_bucketed

_SUPPORTED = ("row_number", "rank", "dense_rank", "lag", "lead",
              "moving_sum", "moving_avg")


def _run_starts(df: pd.DataFrame, cols: list[str]) -> np.ndarray:
    """Boolean mask: row starts a new run of equal values over ``cols``
    (nulls compare equal to nulls, like SQL grouping)."""
    n = len(df)
    start = np.zeros(n, dtype=bool)
    if n == 0:
        return start
    start[0] = True
    for c in cols:
        v = df[c].to_numpy()
        neq = v[1:] != v[:-1]
        isna = pd.isna(df[c]).to_numpy()
        neq &= ~(isna[1:] & isna[:-1])  # null == null for peer grouping
        start[1:] |= neq
    return start


def windowed_rank(
    ds,
    *,
    partition_by: str,
    order_by: str | list[str],
    value_col: str | None = None,
    outputs: Iterable[str] = ("row_number",),
    keep_cols: Iterable[str] = (),
    frame_rows: int = 2,
):
    """Dataset of keep_cols + partition/order cols + requested window
    columns (``lag``/``lead``/``moving_*`` require ``value_col``).

    ``moving_sum`` / ``moving_avg`` use the frame ``ROWS BETWEEN
    frame_rows PRECEDING AND CURRENT ROW``; the count divides by non-null
    frame values (SQL ``count(value) OVER``).  Pass an INTEGER value
    column (fixed-point quantized) when bit-exact parity with a SQL engine
    is required — integer frame sums are accumulation-order-free, float
    sums are not."""
    outputs = list(outputs)
    raw = [order_by] if isinstance(order_by, str) else list(order_by)
    # each entry: "col" (ASC) or ("col", "asc"|"desc")
    order_cols, order_asc = [], []
    for entry in raw:
        if isinstance(entry, tuple):
            col, direction = entry
            order_cols.append(col)
            order_asc.append(direction.lower() != "desc")
        else:
            order_cols.append(entry)
            order_asc.append(True)
    for o in outputs:
        if o not in _SUPPORTED:
            raise ValueError(f"unsupported window function {o!r}")
    if value_col is None and any(
            o in outputs for o in ("lag", "lead", "moving_sum", "moving_avg")):
        raise ValueError("lag/lead/moving_* need value_col")
    needed = sorted({partition_by, *order_cols, *keep_cols}
                    | ({value_col} if value_col else set()))

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([partition_by, *order_cols], kind="mergesort",
                          ascending=[True, *order_asc], na_position="last")
        grp = g.groupby(partition_by, sort=False, dropna=False)
        out = g[needed].copy()
        rn = (grp.cumcount() + 1).to_numpy()
        if "row_number" in outputs:
            out["row_number"] = rn
        if "rank" in outputs or "dense_rank" in outputs:
            # a new peer run starts where the partition key OR any order
            # column changes (nulls are peers of nulls — SQL NULLS LAST)
            starts = _run_starts(g, [partition_by, *order_cols])
            if "rank" in outputs:
                # rank = row_number of the run's FIRST row: forward-fill the
                # index of the latest run start (rn resets per partition, so
                # accumulate positions, not rn values)
                idx = np.where(starts, np.arange(len(g)), 0)
                out["rank"] = rn[np.maximum.accumulate(idx)]
            if "dense_rank" in outputs:
                # dense rank restarts at 1 on each partition boundary
                part_start = _run_starts(g, [partition_by])
                run_id = np.cumsum(starts)
                part_run_id = np.where(part_start, run_id, 0)
                out["dense_rank"] = run_id - np.maximum.accumulate(part_run_id) + 1
        if "lag" in outputs:
            out["lag"] = grp[value_col].shift(1)
        if "lead" in outputs:
            out["lead"] = grp[value_col].shift(-1)
        if "moving_sum" in outputs or "moving_avg" in outputs:
            # frame sum accumulated oldest->newest via per-partition shifts;
            # with an integer value column each add is exact, so the result
            # is independent of accumulation order (SQL-engine parity)
            s = grp[value_col]
            msum = np.zeros(len(g), dtype=np.float64)
            cnt = np.zeros(len(g), dtype=np.int64)
            for j in range(frame_rows, -1, -1):
                sh = s.shift(j)
                ok = sh.notna().to_numpy()
                msum += np.where(ok, sh.fillna(0).to_numpy(np.float64), 0.0)
                cnt += ok
            if "moving_sum" in outputs:
                # all-null frame -> NULL, as SQL SUM() OVER does
                out["moving_sum"] = np.where(cnt > 0, msum, np.nan)
            if "moving_avg" in outputs:
                out["moving_avg"] = np.where(cnt > 0, msum / np.maximum(cnt, 1),
                                             np.nan)
        return out

    return grouped_apply_bucketed(ds.select_columns(needed), [partition_by], bucket)


def _norm_order(order_by):
    raw = [order_by] if isinstance(order_by, str) else list(order_by)
    cols, asc = [], []
    for entry in raw:
        if isinstance(entry, tuple):
            cols.append(entry[0])
            asc.append(entry[1].lower() != "desc")
        else:
            cols.append(entry)
            asc.append(True)
    return cols, asc


def sessionize(
    ds,
    *,
    partition_by: str,
    order_by: str | list[str],
    ts_col: str,
    gap,
    keep_cols: Iterable[str] = (),
    out_col: str = "session_idx",
):
    """Gap-based sessionization: within each partition ordered by
    ``order_by``, a new session starts at the first row and wherever
    ``ts - previous ts > gap`` — ``out_col`` is the 1-based session index
    (int64), the SQL idiom ``SUM(CASE WHEN ts - lag(ts) OVER w > gap THEN 1
    ELSE 0 END) OVER w``.

    Same wide-op shape as ``windowed_rank``: ONE bucketed key exchange,
    then a vectorized cumsum per bucket.  ``gap`` is anything
    ``pd.Timedelta`` accepts (``"8 hours"``, a timedelta) for timestamp
    columns, or a number for numeric ts columns."""
    order_cols, order_asc = _norm_order(order_by)
    needed = sorted({partition_by, ts_col, *order_cols, *keep_cols})
    gap_v = gap if isinstance(gap, (int, float)) else pd.Timedelta(gap)

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([partition_by, *order_cols], kind="mergesort",
                          ascending=[True, *order_asc], na_position="last")
        grp = g.groupby(partition_by, sort=False, dropna=False)
        out = g[needed].copy()
        prev = grp[ts_col].shift(1)
        new = prev.isna().to_numpy() | ((g[ts_col] - prev) > gap_v).to_numpy()
        # per-partition cumsum of session starts: global cumsum minus the
        # running count at each partition's first row
        run = np.cumsum(new)
        part_start = _run_starts(g, [partition_by])
        base = np.where(part_start, run - 1, 0)
        out[out_col] = (run - np.maximum.accumulate(base)).astype(np.int64)
        return out

    return grouped_apply_bucketed(ds.select_columns(needed), [partition_by], bucket)


def session_stats(
    ds,
    *,
    partition_by: str,
    order_by: str | list[str],
    ts_col: str,
    gap,
    value_col: str | None = None,
):
    """Per-session aggregates in the SAME single exchange as ``sessionize``:
    one row per (partition, session_idx) with ``n_events``, ``t_start``,
    ``t_end`` and (if ``value_col``) ``value_sum``.  Equivalent SQL: group
    by the sessionized index."""
    order_cols, order_asc = _norm_order(order_by)
    needed = sorted({partition_by, ts_col, *order_cols}
                    | ({value_col} if value_col else set()))
    gap_v = gap if isinstance(gap, (int, float)) else pd.Timedelta(gap)

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([partition_by, *order_cols], kind="mergesort",
                          ascending=[True, *order_asc], na_position="last")
        grp = g.groupby(partition_by, sort=False, dropna=False)
        prev = grp[ts_col].shift(1)
        new = prev.isna().to_numpy() | ((g[ts_col] - prev) > gap_v).to_numpy()
        run = np.cumsum(new)
        part_start = _run_starts(g, [partition_by])
        base = np.where(part_start, run - 1, 0)
        sidx = (run - np.maximum.accumulate(base)).astype(np.int64)
        agg = {"n_events": (ts_col, "size"),
               "t_start": (ts_col, "min"), "t_end": (ts_col, "max")}
        if value_col:
            agg["value_sum"] = (value_col, "sum")
        gg = g.assign(**{"__sidx": sidx}).groupby(
            [partition_by, "__sidx"], sort=False, dropna=False)
        out = gg.agg(**agg).reset_index()
        out = out.rename(columns={"__sidx": "session_idx"})
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return grouped_apply_bucketed(ds.select_columns(needed), [partition_by], bucket)


def hopping_window_stats(
    ds,
    *,
    ts_col: str,
    width,
    slide,
    value_col: str | None = None,
    partition_by: str | None = None,
):
    """Overlapping (hopping / sliding) time-window aggregates: every event
    lands in each window ``[k*slide, k*slide + width)`` that covers its
    timestamp — ``width == slide`` degenerates to tumbling windows.  One row
    per (``partition_by``?, ``window_start``) with ``n_events`` and (if
    ``value_col``) ``value_sum``; ``window_start`` is epoch-anchored.

    SQL equivalent (the test oracle): expand each event to its covering
    window indices with ``generate_series((t-width)//slide + 1, t//slide)``
    and GROUP BY ``k*slide``.

    Scale shape: the expansion factor is ``ceil(width/slide)`` but the
    per-batch partial aggregation collapses it BEFORE the exchange — only
    (window, partial-count/sum) rows move, ONE bucketed exchange
    (functions/bucketed.py), vectorized final sum per bucket.  Timestamps
    convert to int64 epoch-us; ``width``/``slide`` take anything
    ``pd.Timedelta`` accepts, or plain numbers for numeric ts columns.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ts_is_time = pa.types.is_timestamp(
        dict(zip(ds.schema().names, ds.schema().types))[ts_col])
    if ts_is_time:
        width_v = int(pd.Timedelta(width).value // 1000)   # ns -> us
        slide_v = int(pd.Timedelta(slide).value // 1000)
    else:
        width_v, slide_v = width, slide
    if width_v <= 0 or slide_v <= 0:
        raise ValueError("width and slide must be positive")

    needed = sorted({ts_col}
                    | ({value_col} if value_col else set())
                    | ({partition_by} if partition_by else set()))
    keys = ([partition_by] if partition_by else []) + ["window_start"]

    def to_int(tbl: pa.Table) -> pa.Table:
        if ts_is_time:
            col = pc.cast(pc.cast(tbl.column(ts_col), pa.timestamp("us")),
                          pa.int64())
            tbl = tbl.set_column(tbl.schema.get_field_index(ts_col),
                                 ts_col, col)
        return tbl

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[ts_col].to_numpy()
        k_min = (t - width_v) // slide_v + 1   # numpy // floors
        k_max = t // slide_v
        counts = (k_max - k_min + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(df)), counts)
        starts = np.zeros(len(df), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        off = np.arange(int(counts.sum())) - np.repeat(starts, counts)
        exp = pd.DataFrame({
            "window_start": (k_min[idx] + off) * slide_v,
        })
        if partition_by:
            exp[partition_by] = df[partition_by].to_numpy()[idx]
        agg = {"n_events": ("window_start", "size")}
        if value_col:
            exp["__v"] = df[value_col].to_numpy()[idx]
            agg["value_sum"] = ("__v", "sum")
        return exp.groupby(keys, sort=False).agg(**agg).reset_index()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        agg = {"n_events": ("n_events", "sum")}
        if value_col:
            agg["value_sum"] = ("value_sum", "sum")
        out = g.groupby(keys, sort=False).agg(**agg).reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    partials = ds.select_columns(needed).map_batches(
        to_int, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(partial, batch_format="pandas")
    return grouped_apply_bucketed(partials, keys, final)
