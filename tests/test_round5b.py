"""Round-5 additions: segment-level corpus dedup and token-budget sampling."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _brute_segment_dedup(df: pd.DataFrame, n: int) -> pd.DataFrame:
    """Pandas reference: explode n-token segments, keep first corpus-wide
    occurrence by (doc_id, seg_no), reassemble docs."""
    rows = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = text.split()
        for seg_no, s in enumerate(range(0, len(toks), n)):
            rows.append((doc_id, seg_no, " ".join(toks[s : s + n])))
    segs = pd.DataFrame(rows, columns=["doc_id", "seg_no", "seg"])
    segs = segs.sort_values(["doc_id", "seg_no"], kind="stable")
    keep = segs.groupby("seg", sort=False).head(1)
    out = (
        keep.sort_values(["doc_id", "seg_no"])
        .groupby("doc_id", sort=True)
        .agg(n_seg=("seg", "size"), text=("seg", " ".join))
        .reset_index()
    )
    return out


def test_segment_dedup_matches_brute(ray_session):
    import ray.data

    from rasterflow.pipelines.dedup import segment_dedup

    src = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exp = _brute_segment_dedup(src, 8)

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = segment_dedup(ds, seg_tokens=8).to_pandas()
    assert list(got.columns) == ["doc_id", "n_seg", "text"]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


def test_segment_dedup_partition_invariant(ray_session):
    import ray.data

    from rasterflow.pipelines.dedup import segment_dedup

    ds1 = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = segment_dedup(ds1, seg_tokens=8).to_pandas()
    ds2 = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).repartition(13)
    b = segment_dedup(ds2, seg_tokens=8).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_segment_dedup_planted(ray_session):
    """Later occurrences of a planted segment are dropped; a doc made
    entirely of seen segments disappears from the output."""
    import ray.data

    from rasterflow.pipelines.dedup import segment_dedup

    boiler = "a b c d"  # one 4-token segment, repeated across docs
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                boiler + " u v w x",  # keeps both segments (first occurrence)
                boiler + " p q r s",  # boilerplate dropped, tail kept
                boiler,  # all segments seen -> doc dropped
            ],
        }
    )
    out = segment_dedup(
        ray.data.from_pandas(df), seg_tokens=4
    ).to_pandas()
    assert out["doc_id"].tolist() == [1, 2]
    assert out.loc[out.doc_id == 1, "text"].iloc[0] == boiler + " u v w x"
    assert out.loc[out.doc_id == 2, "text"].iloc[0] == "p q r s"
    assert out["n_seg"].tolist() == [2, 1]


def _brute_token_budget(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    from rasterflow.stages.texthash import mulrot_hash64

    ids = df["doc_id"].to_numpy().astype(np.uint64)
    with np.errstate(over="ignore"):
        h = mulrot_hash64(ids).astype(np.int64)
    t = df.assign(h=h, n_tok=[len(s.split()) for s in df["text"]])
    outs = []
    for lang, g in t.groupby("lang", sort=True):
        g = g.sort_values(["h", "doc_id"], kind="stable")
        cum = g["n_tok"].cumsum()
        keep = cum <= budget
        o = g.loc[keep, ["lang", "doc_id", "n_tok"]].copy()
        o["cum_tok"] = cum[keep]
        outs.append(o)
    return (
        pd.concat(outs).sort_values("doc_id").reset_index(drop=True)
        if outs
        else pd.DataFrame(columns=["lang", "doc_id", "n_tok", "cum_tok"])
    )


def test_token_budget_sample_matches_brute(ray_session):
    import ray.data

    from rasterflow.pipelines.sampling import token_budget_sample

    src = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"])
    exp = _brute_token_budget(src, 1500)

    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).repartition(7)
    got = token_budget_sample(ds, budget=1500).to_pandas()
    assert list(got.columns) == ["lang", "doc_id", "n_tok", "cum_tok"]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # every stratum honours the budget (inclusive running total)
    assert (got.groupby("lang")["cum_tok"].max() <= 1500).all()


def test_token_budget_sample_tiny_budget_drops_stratum(ray_session):
    """A budget below the first doc's token count empties that stratum
    entirely (the cumulative rule is inclusive)."""
    import ray.data

    from rasterflow.pipelines.sampling import token_budget_sample

    df = pd.DataFrame(
        {
            "doc_id": [10, 11, 20],
            "lang": ["en", "en", "fr"],
            "text": ["one two three four five", "a b c d e f", "x y"],
        }
    )
    out = token_budget_sample(ray.data.from_pandas(df), budget=3).to_pandas()
    # en docs are 5 and 6 tokens: neither fits a 3-token budget; fr's 2 fits
    assert out["doc_id"].tolist() == [20]
    assert out["cum_tok"].tolist() == [2]


def test_hotspot_regions_planted(ray_session):
    """Hand-built point cloud: an L-shaped 3-cell region, a separate 1-cell
    singleton, and a diagonal-only neighbor that must NOT merge (4-adjacency,
    not 8)."""
    import ray.data

    from rasterflow.geom.cells import Grid
    from rasterflow.pipelines.cellagg import hotspot_regions

    grid = Grid.from_bounds(0.0, 0.0, 10.0, 10.0, 1.0)  # nx=ny=10

    def cell_pts(cx, cy, k):
        return [(cx + 0.5, cy + 0.5)] * k

    pts = (
        cell_pts(2, 2, 5) + cell_pts(3, 2, 6) + cell_pts(3, 3, 7)  # L region
        + cell_pts(4, 4, 5)    # diagonal to (3,3): separate region
        + cell_pts(8, 8, 9)    # isolated singleton
        + cell_pts(6, 6, 4)    # below threshold -> not hot
    )
    df = pd.DataFrame(pts, columns=["x", "y"])
    out = hotspot_regions(ray.data.from_pandas(df), grid, min_count=5).to_pandas()

    # region ids are min member cell ids (cell = cy*10 + cx)
    assert out["region_id"].tolist() == [22, 44, 88]
    l_region = out[out.region_id == 22].iloc[0]
    assert l_region["n_cells"] == 3 and l_region["n_points"] == 18
    assert (
        l_region[["cx_min", "cx_max", "cy_min", "cy_max"]].tolist() == [2, 3, 2, 3]
    )
    assert out[out.region_id == 44].iloc[0]["n_cells"] == 1
    s = out[out.region_id == 88].iloc[0]
    assert s["n_cells"] == 1 and s["n_points"] == 9


def test_hotspot_regions_no_hot_cells(ray_session):
    """All cells below threshold -> empty result, stable schema."""
    import ray.data

    from rasterflow.geom.cells import Grid
    from rasterflow.pipelines.cellagg import hotspot_regions

    grid = Grid.from_bounds(0.0, 0.0, 4.0, 4.0, 1.0)
    df = pd.DataFrame({"x": [0.5, 1.5], "y": [0.5, 1.5]})
    out = hotspot_regions(ray.data.from_pandas(df), grid, min_count=5)
    assert out.count() == 0
    # Dataset schema is the contract (to_pandas drops columns for any
    # fully-empty dataset in Ray 2.49 — a bridge artifact, not ours)
    assert out.schema().names == [
        "region_id", "n_cells", "n_points", "cx_min", "cx_max", "cy_min", "cy_max",
    ]


def test_hotspot_regions_row_wrap_not_adjacent(ray_session):
    """The last cell of row r and the first cell of row r+1 are consecutive
    linear ids but NOT neighbors — the east-edge guard must hold."""
    import ray.data

    from rasterflow.geom.cells import Grid
    from rasterflow.pipelines.cellagg import hotspot_regions

    grid = Grid.from_bounds(0.0, 0.0, 3.0, 3.0, 1.0)  # nx=3
    # cell (2,0) = id 2 and cell (0,1) = id 3: consecutive ids, not adjacent
    df = pd.DataFrame(
        [(2.5, 0.5)] * 5 + [(0.5, 1.5)] * 5, columns=["x", "y"]
    )
    out = hotspot_regions(ray.data.from_pandas(df), grid, min_count=5).to_pandas()
    assert out["region_id"].tolist() == [2, 3]
    assert (out["n_cells"] == 1).all()


def test_focal_smooth_planted(ray_session):
    """One interior cell with k points lights its full 3x3 neighborhood with
    binomial weights; a corner cell lights only its 4 in-grid neighbors."""
    import ray.data

    from rasterflow.geom.cells import Grid
    from rasterflow.pipelines.cellagg import focal_cell_smooth

    grid = Grid.from_bounds(0.0, 0.0, 10.0, 10.0, 1.0)  # nx=ny=10
    # 3 points in cell (5,5) = id 55; 2 points in corner cell (0,0) = id 0
    df = pd.DataFrame([(5.5, 5.5)] * 3 + [(0.5, 0.5)] * 2, columns=["x", "y"])
    out = (
        focal_cell_smooth(ray.data.from_pandas(df), grid, kernel="gauss3")
        .to_pandas()
        .set_index("cell_id")
    )
    # interior: 9 lit cells around 55; corner: 4 lit cells around 0
    assert len(out) == 13
    assert out.loc[55, "focal_n"] == 12 and out.loc[55, "n"] == 3  # w=4 center
    assert out.loc[44, "focal_n"] == 3 and out.loc[44, "n"] == 0   # diag w=1
    assert out.loc[45, "focal_n"] == 6                              # edge w=2
    assert out.loc[0, "focal_n"] == 8 and out.loc[0, "n"] == 2      # 2*4
    assert out.loc[1, "focal_n"] == 4 and out.loc[11, "focal_n"] == 2
    assert set(out.index) == {44, 45, 46, 54, 55, 56, 64, 65, 66, 0, 1, 10, 11}


def test_focal_smooth_sum3_brute(ray_session):
    """Uniform kernel over a random raster == dense scipy-free brute force."""
    import ray.data

    from rasterflow.geom.cells import Grid
    from rasterflow.pipelines.cellagg import focal_cell_smooth

    rng = np.random.default_rng(7)
    grid = Grid.from_bounds(0.0, 0.0, 6.0, 5.0, 1.0)  # nx=6, ny=5
    pts = pd.DataFrame(
        {"x": rng.uniform(0, 6, 300), "y": rng.uniform(0, 5, 300)}
    )
    out = (
        focal_cell_smooth(ray.data.from_pandas(pts), grid, kernel="sum3")
        .to_pandas()
        .set_index("cell_id")
    )
    dense = np.zeros((5, 6), dtype=np.int64)
    ix = np.floor(pts["x"]).astype(int)
    iy = np.floor(pts["y"]).astype(int)
    np.add.at(dense, (iy, ix), 1)
    padded = np.pad(dense, 1)
    focal = sum(
        padded[1 + dy : 6 + dy, 1 + dx : 7 + dx]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    for cid, row in out.iterrows():
        cy, cx = divmod(cid, 6)
        assert row["focal_n"] == focal[cy, cx] and row["n"] == dense[cy, cx]
    # every cell with nonzero focal mass is present
    assert len(out) == int((focal > 0).sum())


def test_source_overlap_planted(ray_session):
    """Segments shared across sources count once per DISTINCT segment;
    within-source repeats don't inflate; disjoint sources are absent."""
    import ray.data

    from rasterflow.pipelines.dedup import source_segment_overlap

    seg1 = "a b c d e f g h"          # exactly one 8-token segment
    seg2 = "p q r s t u v w"
    docs = pd.DataFrame(
        {
            "source": ["A", "A", "B", "B", "C"],
            "text": [
                seg1,                   # A has seg1
                seg1,                   # ...twice (must not double-count)
                seg1 + " " + seg2,      # B has seg1 AND seg2
                seg2,                   # ...seg2 twice
                "x y z",                # C shares nothing
            ],
        }
    )
    out = source_segment_overlap(
        ray.data.from_pandas(docs), seg_tokens=8
    ).to_pandas()
    assert out[["src_a", "src_b"]].values.tolist() == [["A", "B"]]
    assert out["n_shared"].tolist() == [1]


def test_source_overlap_partition_invariance(ray_session):
    """Result is identical at 1 and 7 hash partitions (the matmul partials
    compose)."""
    import ray.data

    from rasterflow.pipelines.dedup import source_segment_overlap

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(120):
        src = f"s{rng.integers(0, 4)}"
        text = " ".join(rng.choice(vocab, size=rng.integers(4, 40)))
        rows.append((src, text))
    docs = pd.DataFrame(rows, columns=["source", "text"])
    ds = ray.data.from_pandas(docs)
    a = source_segment_overlap(ds, seg_tokens=4, num_partitions=1).to_pandas()
    b = source_segment_overlap(ds, seg_tokens=4, num_partitions=7).to_pandas()
    pd.testing.assert_frame_equal(a, b)
