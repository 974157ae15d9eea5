"""Tumbling windows + sessionization vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest

from rasterflow.pipelines.windows import sessionize, tumbling_window_agg


@pytest.fixture(scope="module")
def events(ray_session):
    import ray.data

    rng = np.random.default_rng(4)
    n = 5000
    ts = np.sort(rng.integers(0, 40 * 3600, n)) * 1_000_000  # us over ~40h
    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": rng.integers(0, 50, n),
            "value": rng.random(n),
        }
    )
    return ray.data.from_pandas(df), df


def test_tumbling_window_counts(events):
    ds, df = events
    out = tumbling_window_agg(ds, size_s=3600, count_distinct="user_id").to_pandas()
    sec = df["ts"].astype("int64") // 10**9
    w = sec // 3600
    exp = df.assign(w=w).groupby("w").agg(n=("user_id", "size"), nd=("user_id", "nunique"))
    got = out.set_index("window")
    assert got["n"].to_dict() == exp["n"].to_dict()
    assert got["nd_user_id"].to_dict() == exp["nd"].to_dict()


def test_tumbling_window_keyed(events):
    ds, df = events
    out = tumbling_window_agg(ds, size_s=7200, keys=["user_id"]).to_pandas()
    sec = df["ts"].astype("int64") // 10**9
    exp = df.assign(w=sec // 7200).groupby(["w", "user_id"]).size()
    assert len(out) == len(exp)
    got = out.set_index(["window", "user_id"])["n"]
    assert got.to_dict() == exp.to_dict()


def test_sessionize_matches_pandas(events):
    ds, df = events
    got = sessionize(ds, key="user_id", gap_s=1800).to_pandas()
    # pandas oracle
    rows = []
    for uid, g in df.groupby("user_id"):
        sec = np.sort(g["ts"].astype("int64").to_numpy() // 10**9)
        start = sec[0]
        last = sec[0]
        n = 1
        for s in sec[1:]:
            if s - last > 1800:
                rows.append((uid, start, last, n))
                start, n = s, 0
            last = s
            n += 1
        rows.append((uid, start, last, n))
    exp = pd.DataFrame(rows, columns=["user_id", "session_start", "session_end", "n_events"])
    exp = exp.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    got = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_hopping_window_matches_pandas(ray_session):
    """Hopping windows ≡ per-event expansion done in pandas."""
    import numpy as np
    import pandas as pd
    import ray.data

    from rasterflow.pipelines.windows import hopping_window_agg

    rng = np.random.default_rng(11)
    sec = rng.integers(0, 20_000, size=3000)
    uid = rng.integers(0, 40, size=3000)
    ds = ray.data.from_pandas(pd.DataFrame({"ts": sec, "user_id": uid}))
    got = hopping_window_agg(ds, ts_col="ts", size_s=3600, hop_s=900, count_distinct="user_id").to_pandas()

    rows = []
    for s, u in zip(sec, uid):
        for w in range((s - 3600) // 900 + 1, s // 900 + 1):
            rows.append((w, u))
    exp = (
        pd.DataFrame(rows, columns=["window", "user_id"])
        .groupby("window")
        .agg(n=("user_id", "size"), nd_user_id=("user_id", "nunique"))
        .reset_index()
        .sort_values("window")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), exp.astype("int64")
    )
