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


def _cents_half_away(values: np.ndarray) -> np.ndarray:
    """``round(value*100)`` as int64 cents with HALF-AWAY-FROM-ZERO ties —
    the SQL ``round()`` rule (DuckDB, ANSI).  ``np.round`` is half-to-even,
    which diverges from the oracle whenever ``value*100`` lands exactly on
    .5; this rule is pinned by a tie-value test."""
    v = np.asarray(values, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


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
    num_partitions: int | None = None,
):
    """Session windows per key: events closer than ``gap_s`` chain into one
    session.  Output: one row per session
    ``(key, session_start, session_end, n_events)``.

    Hash-partitioned by key; each partition labels ALL of its keys' sessions
    in one vectorized pass (sort by (key, ts), break where the key changes
    OR the gap exceeds ``gap_s``, one grouped agg over the labels) — no
    per-key dispatch (round 3: 2M events / 50k users went 52 s → ~2 s when
    the per-user ``map_groups`` was replaced by this).  Partitioning
    assumption: one KEY's events fit in one partition task (standard for
    user-keyed web logs)."""
    import pandas as pd

    from .dedup import _FNV
    from ..util import shuffle_parts

    if num_partitions is None:
        num_partitions = shuffle_parts(1.0)

    def addpk(b: pa.Table) -> pa.Table:
        import pandas as _pd

        kcol = b.column(key).to_numpy(zero_copy_only=False)
        hk = _pd.util.hash_array(kcol, hash_key="0123456789123456").astype(np.uint64)
        pk = ((hk * _FNV) % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("_pk", pa.array(pk))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col], kind="stable")
        t = g[ts_col]
        if np.issubdtype(t.dtype, np.datetime64):
            # normalize to whole seconds regardless of the stored unit
            sec = t.to_numpy().astype("datetime64[s]").astype("int64")
        else:
            sec = t.to_numpy().astype("int64")
        k = g[key].to_numpy()
        newk = np.concatenate(([True], k[1:] != k[:-1]))
        gap = np.concatenate(([True], (sec[1:] - sec[:-1]) > gap_s))
        sess = np.cumsum(newk | gap)
        df = pd.DataFrame({key: k, "_sec": sec, "_sess": sess})
        out = df.groupby("_sess", sort=False).agg(
            **{key: (key, "first")},
            session_start=("_sec", "min"),
            session_end=("_sec", "max"),
            n_events=("_sec", "size"),
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out.reset_index(drop=True)[[key, "session_start", "session_end", "n_events"]]

    withpk = ds.map_batches(addpk, batch_format="pyarrow")
    return (
        withpk.groupby("_pk")
        .map_groups(per_partition, batch_format="pandas")
        .sort([key, "session_start"])
    )


def lag_deltas(
    ds,
    ts_col: str = "ts",
    key: str = "user_id",
    id_col: str = "event_id",
    num_partitions: int | None = None,
    out_col: str = "delta_us",
):
    """Per-key inter-event gaps: for every event, microseconds since the
    key's PREVIOUS event (null for the key's first) — the LAG window
    primitive behind dwell-time / inter-arrival features.

    Same plan shape as :func:`sessionize`: hash-partition by key, then each
    partition computes ALL of its keys' lags in one vectorized pass (sort by
    ``(key, ts, id)`` — id breaks timestamp ties deterministically — then one
    ``diff`` masked at key boundaries); no per-key dispatch.  Partitioning
    assumption: one key's events fit in one partition task.  Output:
    ``(id, key, delta_us)``, every input row, sorted by id."""
    import pandas as pd

    from .dedup import _FNV
    from ..util import shuffle_parts

    if num_partitions is None:
        num_partitions = shuffle_parts(1.0)

    def addpk(b: pa.Table) -> pa.Table:
        kcol = b.column(key).to_numpy(zero_copy_only=False)
        hk = pd.util.hash_array(kcol, hash_key="0123456789123456").astype(np.uint64)
        pk = ((hk * _FNV) % np.uint64(num_partitions)).astype(np.int32)
        return b.select([id_col, key, ts_col]).append_column("_pk", pa.array(pk))

    _PER_US = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="stable")
        t = g[ts_col].to_numpy()
        if np.issubdtype(t.dtype, np.datetime64):
            us = t.astype("datetime64[us]").astype("int64")
        else:
            us = t.astype("int64")
        k = g[key].to_numpy()
        d = np.empty(len(us), dtype=np.float64)
        if len(us):
            d[0] = np.nan
        if len(us) > 1:
            d[1:] = np.where(k[1:] == k[:-1], (us[1:] - us[:-1]).astype(np.float64), np.nan)
        # float64 with NaN for the first-event null: matches DuckDB's pandas
        # conversion of a nullable BIGINT (and the representation every other
        # nullable-int query emits, cf. relational.hash_join's NaN padding) —
        # pandas nullable Int64 hash-mismatched the driver oracle (r04).
        out = pd.DataFrame({id_col: g[id_col].to_numpy(), key: k, out_col: d})
        return out

    withpk = ds.map_batches(addpk, batch_format="pyarrow")
    return withpk.groupby("_pk").map_groups(per_partition, batch_format="pandas").sort(id_col)


def rolling_sum(
    ds,
    ts_col: str = "ts",
    key: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 5,
    num_partitions: int | None = None,
    out_col: str = "roll_cents",
):
    """Per-key rolling sum over the last ``window`` events (ROWS BETWEEN
    window-1 PRECEDING AND CURRENT ROW) — the moving-aggregate window frame.

    Values are fixed-point: ``round(value·100)`` int64 cents, so the rolling
    sum is exact integer arithmetic and hash-matches the SQL oracle
    regardless of accumulation order (the float-sum rule in
    ``points.py``'s oracle-plane design).  Same partition plan as
    :func:`sessionize` / :func:`lag_deltas`; within a partition the frame
    sum is one cumulative sum differenced at ``window`` lag, reset at key
    boundaries — vectorized, no per-key dispatch."""
    import pandas as pd

    from .dedup import _FNV
    from ..util import shuffle_parts

    if num_partitions is None:
        num_partitions = shuffle_parts(1.0)

    def addpk(b: pa.Table) -> pa.Table:
        kcol = b.column(key).to_numpy(zero_copy_only=False)
        hk = pd.util.hash_array(kcol, hash_key="0123456789123456").astype(np.uint64)
        pk = ((hk * _FNV) % np.uint64(num_partitions)).astype(np.int32)
        return b.select([id_col, key, ts_col, value_col]).append_column("_pk", pa.array(pk))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="stable")
        k = g[key].to_numpy()
        cents = _cents_half_away(g[value_col].to_numpy())
        n = len(cents)
        cs = np.concatenate(([0], np.cumsum(cents)))
        roll = cs[1:] - cs[np.maximum(np.arange(n) - window + 1, 0)]
        # subtract the part of the frame that belongs to the previous key:
        # positions < the key's first row contribute cs[start] - cs[frame_lo]
        newk = np.concatenate(([True], k[1:] != k[:-1]))
        seg_start = np.maximum.accumulate(np.where(newk, np.arange(n), 0))
        lo = np.maximum(np.arange(n) - window + 1, 0)
        cross = lo < seg_start
        roll[cross] -= cs[seg_start[cross]] - cs[lo[cross]]
        return pd.DataFrame(
            {id_col: g[id_col].to_numpy(), key: k, out_col: roll}
        )

    withpk = ds.map_batches(addpk, batch_format="pyarrow")
    return withpk.groupby("_pk").map_groups(per_partition, batch_format="pandas").sort(id_col)


def rolling_sum_time(
    ds,
    ts_col: str = "ts",
    key: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    window_s: int = 3600,
    num_partitions: int | None = None,
    out_col: str = "roll_cents",
):
    """Per-key rolling sum over a TIME window (RANGE BETWEEN window_s
    PRECEDING AND CURRENT ROW on epoch seconds): every row's sum covers all
    of its key's rows with ``t in [t_i - window_s, t_i]`` — peers with equal
    timestamps are all included, exactly the SQL RANGE-frame rule.

    Fixed-point cents like :func:`rolling_sum` (exact integer result).  Per
    partition: one (key, t) sort, one cumulative sum, and ONE vectorized
    ``searchsorted`` over rank-encoded (key, t) composites to find each
    row's frame start — the same no-per-key-dispatch trick as
    :func:`rasterflow.pipelines.relational.interval_join`."""
    import pandas as pd

    from .dedup import _FNV
    from ..util import shuffle_parts

    if num_partitions is None:
        num_partitions = shuffle_parts(1.0)

    def addpk(b: pa.Table) -> pa.Table:
        kcol = b.column(key).to_numpy(zero_copy_only=False)
        hk = pd.util.hash_array(kcol, hash_key="0123456789123456").astype(np.uint64)
        pk = ((hk * _FNV) % np.uint64(num_partitions)).astype(np.int32)
        return b.select([id_col, key, ts_col, value_col]).append_column("_pk", pa.array(pk))

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="stable")
        t = g[ts_col].to_numpy()
        if np.issubdtype(t.dtype, np.datetime64):
            sec = t.astype("datetime64[s]").astype("int64")
        else:
            sec = t.astype("int64")
        kcodes, _u = pd.factorize(g[key].to_numpy())
        kcodes = kcodes.astype(np.int64)
        cents = _cents_half_away(g[value_col].to_numpy())
        n = len(cents)
        cs = np.concatenate(([0], np.cumsum(cents)))
        # frame end: RANGE includes PEERS — the last index with the same
        # (key, sec); frame start: first index with sec >= t_i - window_s
        uniq = np.unique(sec)
        sr = np.searchsorted(uniq, sec).astype(np.int64)
        lb = np.searchsorted(uniq, sec - window_s).astype(np.int64)
        m = np.int64(len(uniq) + 1)
        enc = kcodes * m + sr  # sorted ascending (rows sorted by (key, sec))
        lo = np.searchsorted(enc, kcodes * m + lb, side="left")
        hi = np.searchsorted(enc, enc, side="right")
        roll = cs[hi] - cs[lo]
        return pd.DataFrame({id_col: g[id_col].to_numpy(), key: g[key].to_numpy(), out_col: roll})

    withpk = ds.map_batches(addpk, batch_format="pyarrow")
    return withpk.groupby("_pk").map_groups(per_partition, batch_format="pandas").sort(id_col)


def funnel_users(
    ds,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    ts_col: str = "ts",
    key: str = "user_id",
    type_col: str = "event_type",
    num_partitions: int | None = None,
):
    """Ordered funnel matching: keys that performed ``stages`` in strict
    temporal order — ``t1 = min ts(stage1)``, ``t2 = min ts(stage2) with
    ts > t1``, ... — the sequential-pattern primitive of event analytics.

    One hash-partition exchange; within a partition each stage is one
    filtered ``groupby(key).min`` over epoch-microsecond ints (greedy
    earliest-completion is the standard funnel semantics and is what the
    SQL oracle's chained MIN subqueries compute).  Output: one row per
    completing key, ``(key, t1..tN)`` epoch-µs, sorted by key."""
    import pandas as pd

    from .dedup import _FNV
    from ..util import shuffle_parts

    if num_partitions is None:
        num_partitions = shuffle_parts(1.0)

    def addpk(b: pa.Table) -> pa.Table:
        kcol = b.column(key).to_numpy(zero_copy_only=False)
        hk = pd.util.hash_array(kcol, hash_key="0123456789123456").astype(np.uint64)
        pk = ((hk * _FNV) % np.uint64(num_partitions)).astype(np.int32)
        return b.select([key, ts_col, type_col]).append_column("_pk", pa.array(pk))

    tcols = [f"t{i + 1}" for i in range(len(stages))]

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        t = g[ts_col].to_numpy()
        if np.issubdtype(t.dtype, np.datetime64):
            us = t.astype("datetime64[us]").astype("int64")
        else:
            us = t.astype("int64")
        df = pd.DataFrame({key: g[key].to_numpy(), "_us": us, "_ty": g[type_col].to_numpy()})
        cur = None  # Series: key -> completion time of the previous stage
        for stage in stages:
            s = df[df["_ty"] == stage]
            if cur is not None:
                prev = s[key].map(cur)
                s = s[s["_us"] > prev.fillna(np.inf)]
            cur = s.groupby(key)["_us"].min()
            if not len(cur):
                break
        if cur is None or not len(cur):
            return pd.DataFrame(
                {key: pd.Series(dtype=df[key].dtype)}
                | {c: pd.Series(dtype="int64") for c in tcols}
            )
        # replay to collect every stage's time for the completing keys
        keep = cur.index
        out = {key: np.asarray(keep)}
        prev = None
        for i, stage in enumerate(stages):
            s = df[df["_ty"] == stage]
            s = s[s[key].isin(keep)]
            if prev is not None:
                s = s[s["_us"] > s[key].map(prev)]
            prev = s.groupby(key)["_us"].min()
            out[tcols[i]] = prev.loc[keep].to_numpy()
        return pd.DataFrame(out)

    withpk = ds.map_batches(addpk, batch_format="pyarrow")
    return withpk.groupby("_pk").map_groups(per_partition, batch_format="pandas").sort(key)


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
