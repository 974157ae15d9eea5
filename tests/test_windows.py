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


def test_rolling_sum_time_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from rasterflow.pipelines.windows import rolling_sum_time

    rng = np.random.default_rng(23)
    n = 400
    # coarse seconds so time windows and PEER ties are actually exercised
    sec = np.sort(rng.integers(0, 500, n))
    df = pd.DataFrame(
        {
            "event_id": np.arange(n),
            "user_id": rng.integers(0, 8, n),
            "ts": pd.to_datetime(sec * 10**6, unit="us"),
            "value": np.round(rng.uniform(0, 20, n), 2),
        }
    )
    got = (
        rolling_sum_time(ray.data.from_pandas(df).repartition(4), window_s=60)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    cents = np.round(df["value"].to_numpy() * 100).astype(np.int64)
    exp_vals = []
    for i in range(n):
        m = (
            (df["user_id"] == df["user_id"][i])
            & (sec >= sec[i] - 60)
            & (sec <= sec[i])
        )
        exp_vals.append(int(cents[m.to_numpy()].sum()))
    exp = pd.DataFrame(
        {"event_id": df["event_id"], "user_id": df["user_id"], "roll_cents": exp_vals}
    )
    pd.testing.assert_frame_equal(got, exp)


def test_funnel_users_matches_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from rasterflow.pipelines.windows import funnel_users

    rng = np.random.default_rng(29)
    n = 600
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 30, n),
            "ts": pd.to_datetime(rng.integers(0, 10**8, n), unit="us"),
            "event_type": np.array(["view", "click", "purchase", "error"])[
                rng.integers(0, 4, n)
            ],
        }
    )
    got = (
        funnel_users(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    rows = []
    for u in sorted(df["user_id"].unique()):
        m = df["user_id"] == u
        t1c = us[(m & (df["event_type"] == "view")).to_numpy()]
        if not len(t1c):
            continue
        t1 = t1c.min()
        t2c = us[(m & (df["event_type"] == "click")).to_numpy()]
        t2c = t2c[t2c > t1]
        if not len(t2c):
            continue
        t2 = t2c.min()
        t3c = us[(m & (df["event_type"] == "purchase")).to_numpy()]
        t3c = t3c[t3c > t2]
        if not len(t3c):
            continue
        rows.append((u, t1, t2, int(t3c.min())))
    exp = pd.DataFrame(rows, columns=["user_id", "t1", "t2", "t3"])
    assert len(exp) > 5
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
