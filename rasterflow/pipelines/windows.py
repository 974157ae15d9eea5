"""Windowed aggregates over event streams (batch expression).

Ray Data has no event-time/watermark machinery; stream-shaped workloads are
expressed as ordered, partitioned logs: assign each row its tumbling window
(``floor(event_time / size)`` — vectorized), then reduce per (window[, key]).
The reference's time axis is likewise coarse bucketed (10-day index cells,
SURVEY §2.7.1); tumbling windows generalize that to arbitrary sizes.

Uses :func:`rasterflow.util.grouped_aggregate` so high window-cardinality
doesn't hit Ray's per-group overhead; count-distinct works because all rows
of a window hash to the same partition.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import grouped_aggregate


def add_tumbling_window(ds, ts_col: str = "ts", size_s: int = 3600, out_col: str = "window"):
    """Adds the window ordinal = floor(epoch_seconds / size) as int64."""

    _PER_SEC = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}

    def f(b: pa.Table) -> pa.Table:
        t = b.column(ts_col)
        if pa.types.is_timestamp(t.type):
            raw = t.cast(pa.int64()).to_numpy(zero_copy_only=False)
            sec = raw // _PER_SEC[t.type.unit]
        else:
            sec = t.to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(out_col, pa.array(sec // size_s))

    return ds.map_batches(f, batch_format="pyarrow")


def tumbling_window_agg(
    ds,
    ts_col: str = "ts",
    size_s: int = 3600,
    keys: list[str] | None = None,
    count_distinct: str | None = None,
    value_sum: str | None = None,
):
    """Per-window (optionally per-key) aggregates.

    Output columns: window[, keys...], n[, nd_<col>][, sum_<col>] — stable
    names for the SQL oracle."""
    w = add_tumbling_window(ds, ts_col=ts_col, size_s=size_s)
    gkeys = ["window"] + (list(keys) if keys else [])
    first_key = count_distinct or (keys[0] if keys else "window")
    aggs: dict[str, tuple[str, str]] = {"n": (first_key, "size")}
    if count_distinct is not None:
        aggs[f"nd_{count_distinct}"] = (count_distinct, "nunique")
    if value_sum is not None:
        aggs[f"sum_{value_sum}"] = (value_sum, "sum")
    return grouped_aggregate(w, gkeys, aggs).sort(gkeys)


def sessionize(
    ds,
    ts_col: str = "ts",
    key: str = "user_id",
    gap_s: int = 1800,
):
    """Session windows per key: events closer than ``gap_s`` chain into one
    session.  Expressed as groupby(key) -> sorted per-group session labeling
    (pandas, vectorized inside the group).  Output: one row per session
    ``(key, session_start, session_end, n_events)``.

    Partitioning assumption: one key's events fit in one group (standard for
    user-keyed web logs)."""
    import pandas as pd

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col)
        t = g[ts_col]
        if np.issubdtype(t.dtype, np.datetime64):
            # normalize to whole seconds regardless of the stored unit
            sec = t.to_numpy().astype("datetime64[s]").astype("int64")
            sec = pd.Series(sec, index=g.index)
        else:
            sec = t.astype("int64")
        new_sess = (sec.diff().fillna(np.inf) > gap_s).cumsum()
        out = g.assign(_sec=sec, _sess=new_sess).groupby("_sess").agg(
            session_start=("_sec", "min"), session_end=("_sec", "max"), n_events=("_sec", "size")
        )
        out[key] = g[key].iloc[0]
        return out.reset_index(drop=True)[[key, "session_start", "session_end", "n_events"]]

    return ds.groupby(key).map_groups(per_key, batch_format="pandas").sort([key, "session_start"])


def hopping_window_agg(
    ds,
    ts_col: str = "ts",
    size_s: int = 3600,
    hop_s: int = 900,
    count_distinct: str | None = None,
):
    """Hopping (sliding) windows: window ``w`` covers ``[w*hop, w*hop+size)``,
    so each event lands in ``size/hop`` overlapping windows.

    Vectorized expansion per batch (``np.repeat`` over the per-event window
    range — no per-row loop), then the same hash-partitioned reduce as the
    tumbling aggregate.  Shuffle volume is ``size/hop`` × rows of NARROW
    (window[, distinct-key]) columns — the expansion factor is the price of
    overlap and is stated, not hidden.

    Output: ``window, n[, nd_<col>]`` sorted by window (names match the SQL
    oracle)."""
    assert size_s % hop_s == 0, "size must be a multiple of hop"
    _PER_SEC = {"s": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}

    def expand(b: pa.Table) -> pa.Table:
        t = b.column(ts_col)
        if pa.types.is_timestamp(t.type):
            raw = t.cast(pa.int64()).to_numpy(zero_copy_only=False)
            sec = raw // _PER_SEC[t.type.unit]
        else:
            sec = t.to_numpy(zero_copy_only=False).astype(np.int64)
        w_min = (sec - size_s) // hop_s + 1
        w_max = sec // hop_s
        counts = (w_max - w_min + 1).astype(np.int64)
        total = int(counts.sum())
        row_idx = np.repeat(np.arange(len(sec)), counts)
        ends = np.cumsum(counts)
        within = np.arange(total) - np.repeat(ends - counts, counts)
        win = np.repeat(w_min, counts) + within
        cols: dict[str, object] = {"window": pa.array(win)}
        if count_distinct is not None:
            cols[count_distinct] = b.column(count_distinct).take(pa.array(row_idx))
        return pa.table(cols)

    exp = ds.map_batches(expand, batch_format="pyarrow")
    first_key = count_distinct or "window"
    aggs: dict[str, tuple[str, str]] = {"n": (first_key, "size")}
    if count_distinct is not None:
        aggs[f"nd_{count_distinct}"] = (count_distinct, "nunique")
    return grouped_aggregate(exp, ["window"], aggs).sort(["window"])
