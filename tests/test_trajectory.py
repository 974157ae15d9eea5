"""Trajectory analytics (rasterflow.pipelines.trajectory) vs pandas brute."""

import numpy as np
import pandas as pd

from rasterflow.geom.cells import Grid
from rasterflow.pipelines.trajectory import od_matrix, user_steps

GRID = Grid.from_bounds(0.0, 0.0, 10.0, 10.0, 2.0)


def _events(n=2000, users=37, seed=17):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            # integer ts with planted ties (id breaks them deterministically)
            "ts": rng.integers(0, 500, n).astype(np.int64),
            "x": rng.uniform(-1.0, 11.0, n),  # some points off-canvas
            "y": rng.uniform(-1.0, 11.0, n),
        }
    )


def _ref_sorted(df):
    return df.sort_values(["user_id", "ts", "event_id"], kind="stable")


def test_user_steps_matches_pandas(ray_session):
    import ray.data

    df = _events()
    got = user_steps(ray.data.from_pandas(df).repartition(6)).to_pandas()
    got3 = user_steps(
        ray.data.from_pandas(df).repartition(1), num_partitions=3
    ).to_pandas()
    pd.testing.assert_frame_equal(got, got3)  # partition invariance

    s = _ref_sorted(df)
    px = s.groupby("user_id")["x"].shift()
    py = s.groupby("user_id")["y"].shift()
    d2 = (s["x"] - px) ** 2 + (s["y"] - py) ** 2
    exp = pd.DataFrame(
        {"event_id": s["event_id"], "user_id": s["user_id"], "d2_step": d2}
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)


def test_od_matrix_matches_pandas(ray_session):
    import ray.data

    df = _events(seed=23)
    got = od_matrix(ray.data.from_pandas(df).repartition(5), GRID).to_pandas()

    s = _ref_sorted(df)
    lin, valid = GRID.locate_linear(s["x"].to_numpy(), s["y"].to_numpy())
    same = np.zeros(len(s), dtype=bool)
    u = s["user_id"].to_numpy()
    same[1:] = u[1:] == u[:-1]
    ok = same[1:] & valid[1:] & valid[:-1]
    flows = pd.DataFrame({"cell_from": lin[:-1][ok], "cell_to": lin[1:][ok]})
    exp = (
        flows.groupby(["cell_from", "cell_to"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["cell_from", "cell_to"])
        .reset_index(drop=True)
    )
    # mass conservation: every valid consecutive same-user step counted once
    assert got["n"].sum() == ok.sum()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)


def test_home_cells_matches_pandas(ray_session):
    import ray.data

    from rasterflow.pipelines.trajectory import home_cells

    df = _events(seed=29)
    got = home_cells(ray.data.from_pandas(df).repartition(6), GRID).to_pandas()

    lin, valid = GRID.locate_linear(df["x"].to_numpy(), df["y"].to_numpy())
    ref = pd.DataFrame({"user_id": df["user_id"], "cell_id": lin})[valid]
    cnt = ref.groupby(["user_id", "cell_id"], as_index=False).size().rename(columns={"size": "n"})
    cnt = cnt.sort_values(["n", "cell_id"], ascending=[False, True], kind="stable")
    exp = (
        cnt.groupby("user_id", sort=False)
        .head(1)[["user_id", "cell_id", "n"]]
        .sort_values(["user_id", "cell_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)


def test_knn_self_join_matches_brute(ray_session):
    """k+1-then-drop-self through the sharded index ≡ brute self-kNN,
    including duplicate-coordinate ties."""
    from rasterflow.pipelines.knn import KnnCellRingIndex
    import ray.data

    rng = np.random.default_rng(31)
    n, k = 400, 3
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "x": rng.uniform(0.0, 4.0, n),
            "y": rng.uniform(0.0, 4.0, n),
        }
    )
    df.loc[1, ["x", "y"]] = df.loc[0, ["x", "y"]].to_numpy()  # exact dup coords
    idx = KnnCellRingIndex(
        ray.data.from_pandas(df).repartition(3), cell=0.5, id_col="doc_id", num_shards=2
    )
    res = idx.query(df[["x", "y"]].to_numpy(), k + 1).to_pandas()
    res["src_id"] = df["doc_id"].to_numpy()[res["query_id"].to_numpy()]
    res = res[res["doc_id"] != res["src_id"]]
    res = res.sort_values(["src_id", "dist", "doc_id"], kind="stable")
    got = res.groupby("src_id", sort=False).head(k)[["src_id", "doc_id", "dist"]].reset_index(drop=True)

    x, y = df["x"].to_numpy(), df["y"].to_numpy()
    d = np.sqrt((x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2)
    rows = []
    for i in range(n):
        order = np.lexsort((np.arange(n), d[i]))
        order = order[order != i][:k]
        rows += [(i, int(j), d[i, j]) for j in order]
    exp = pd.DataFrame(rows, columns=["src_id", "doc_id", "dist"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    idx.shutdown() if hasattr(idx, "shutdown") else None


def test_user_trips_matches_pandas(ray_session):
    import ray.data

    from rasterflow.pipelines.trajectory import user_trips

    df = _events(n=1500, users=20, seed=37)
    gap = 40  # ts units; planted ties still split deterministically by id
    got = user_trips(
        ray.data.from_pandas(df).repartition(6), GRID, gap_us=gap
    ).to_pandas()

    s = _ref_sorted(df).reset_index(drop=True)
    u = s["user_id"].to_numpy()
    ts = s["ts"].to_numpy()
    brk = np.ones(len(s), dtype=np.int64)
    brk[1:] = np.where((u[1:] == u[:-1]) & (ts[1:] - ts[:-1] <= gap), 0, 1)
    trip = pd.Series(brk).groupby(u).cumsum().to_numpy()
    ix, iy, _ = GRID.locate(s["x"].to_numpy(), s["y"].to_numpy())
    cell = iy * np.int64(GRID.nx) + ix
    ref = pd.DataFrame({"user_id": u, "trip_id": trip, "cell": cell})
    exp = ref.groupby(["user_id", "trip_id"], as_index=False).agg(
        n_events=("cell", "size"), cell_start=("cell", "first"), cell_end=("cell", "last")
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        exp.sort_values(["user_id", "trip_id"]).reset_index(drop=True),
        check_dtype=False,
    )
    # every user's trips are 1..K contiguous
    assert (got.groupby("user_id")["trip_id"].min() == 1).all()


def test_triangle_counts_matches_brute(ray_session):
    import ray.data

    from rasterflow.pipelines.graph import triangle_counts

    rng = np.random.default_rng(59)
    n = 60
    # random graph dense enough for triangles
    a, b = np.triu_indices(n, k=1)
    keep = rng.random(len(a)) < 0.12
    pairs = pd.DataFrame({"id_a": a[keep].astype(np.int64), "id_b": b[keep].astype(np.int64)})
    got = triangle_counts(ray.data.from_pandas(pairs).repartition(4)).to_pandas()

    adj = np.zeros((n, n), dtype=bool)
    adj[pairs["id_a"], pairs["id_b"]] = True
    adj |= adj.T
    tri_per_node = ((adj.astype(np.int64) @ adj.astype(np.int64)) * adj).sum(1) // 2
    exp = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64), "n_tri": tri_per_node}
    )
    exp = exp[exp["n_tri"] > 0].reset_index(drop=True)
    assert len(exp) > 5
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)


def test_copresence_pairs_matches_pandas(ray_session):
    import ray.data

    from rasterflow.pipelines.trajectory import copresence_pairs

    df = _events(n=1800, users=25, seed=43)
    w = 50
    got = copresence_pairs(
        ray.data.from_pandas(df).repartition(6), GRID, window_us=w
    ).to_pandas()

    lin, valid = GRID.locate_linear(df["x"].to_numpy(), df["y"].to_numpy())
    ref = pd.DataFrame(
        {"cell": lin, "w": df["ts"].to_numpy() // w, "u": df["user_id"]}
    )[valid].drop_duplicates()
    m = ref.merge(ref, on=["cell", "w"])
    m = m[m["u_x"] < m["u_y"]]
    exp = (
        m.groupby(["u_x", "u_y"], as_index=False)
        .size()
        .rename(columns={"u_x": "user_a", "u_y": "user_b", "size": "n_meet"})
        .sort_values(["user_a", "user_b"])
        .reset_index(drop=True)
    )
    assert len(exp) > 20
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)


def test_value_by_home_cell_matches_pandas(ray_session):
    import ray.data

    from rasterflow.pipelines.trajectory import value_by_home_cell
    from rasterflow.pipelines.windows import _cents_half_away

    df = _events(n=1500, users=15, seed=47)
    rng = np.random.default_rng(48)
    df["value"] = rng.uniform(0.0, 50.0, len(df))
    pts = ray.data.from_pandas(df[["event_id", "user_id", "x", "y"]]).repartition(4)
    ev = ray.data.from_pandas(df[["user_id", "value"]]).repartition(3)
    got = value_by_home_cell(ev, pts, GRID).to_pandas()

    lin, valid = GRID.locate_linear(df["x"].to_numpy(), df["y"].to_numpy())
    cc = pd.DataFrame({"user_id": df["user_id"], "cell_id": lin})[valid]
    cnt = cc.groupby(["user_id", "cell_id"], as_index=False).size()
    cnt = cnt.sort_values(["size", "cell_id"], ascending=[False, True], kind="stable")
    home = cnt.groupby("user_id", sort=False).head(1).set_index("user_id")["cell_id"]
    ref = pd.DataFrame(
        {"cell_id": df["user_id"].map(home), "cents": _cents_half_away(df["value"].to_numpy())}
    ).dropna()
    exp = ref.groupby("cell_id", as_index=False).agg(
        n_events=("cents", "size"), cents=("cents", "sum")
    )
    exp["cell_id"] = exp["cell_id"].astype(np.int64)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.sort_values("cell_id").reset_index(drop=True),
        check_dtype=False,
    )
