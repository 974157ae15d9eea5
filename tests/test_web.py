"""URL curation (rasterflow.pipelines.web) + geo-temporal/geo-text cell ops."""

import numpy as np
import pandas as pd
import pyarrow as pa

from rasterflow.geom.cells import Grid
from rasterflow.pipelines.web import (
    canonicalize_urls,
    domain_of,
    domain_quality_gate,
    synth_urls,
    url_dedup,
)
from rasterflow.pipelines.zonal import cell_top_terms, cell_trend
from rasterflow.sources.fixtures import TS_SPAN


def test_url_canonicalization_collapses_variants():
    t = pa.table({"doc_id": pa.array(np.arange(40), type=pa.int64())})
    t = canonicalize_urls(synth_urls(t))
    df = t.to_pandas()
    df["page"] = df["doc_id"] // 4
    # every page's 4 variants map to ONE canonical form, and it is variant 0
    per_page = df.groupby("page")["canon"].nunique()
    assert (per_page == 1).all()
    v0 = df[df["doc_id"] % 4 == 0].set_index("page")["url"]
    c = df.groupby("page")["canon"].first()
    assert (c == v0).all()


def test_url_canonicalization_malformed_fallback():
    t = pa.table({"url": pa.array(["not a url", "FTP://A.B/C/", "https://h.io/x?y=1#z"])})
    got = canonicalize_urls(t)["canon"].to_pylist()
    # scheme+host fold; path CASE is preserved (paths are case-sensitive)
    assert got == ["not a url", "ftp://a.b/C", "https://h.io/x"]


def test_url_dedup_partition_invariant(ray_session):
    import ray.data

    ids = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
    one = url_dedup(ray.data.from_pandas(ids).repartition(1)).to_pandas()
    many = url_dedup(ray.data.from_pandas(ids).repartition(7)).to_pandas()
    pd.testing.assert_frame_equal(one, many)
    assert (one["keep_id"] % 4 == 0).all()
    assert (one["n_dups"] == 4).all()
    assert len(one) == 50


def test_domain_gate_matches_pandas(ray_session):
    import ray.data

    n = 400
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_chars": (np.arange(n, dtype=np.int64) * 37) % 700,
        }
    )
    got = domain_quality_gate(
        ray.data.from_pandas(df).repartition(5), min_docs=3, min_avg_chars=330.0
    ).to_pandas()

    ref = df.copy()
    ref["domain"] = "site" + ((ref["doc_id"] // 4) % 50).astype(str) + ".example"
    st = ref.groupby("domain").agg(n=("n_chars", "size"), s=("n_chars", "sum"))
    keep = st[(st["n"] >= 3) & (st["s"] / st["n"] >= 330.0)].index
    exp = ref[ref["domain"].isin(keep)][["doc_id", "domain"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)


def test_domain_of_strips_subdomains():
    t = pa.table({"canon": pa.array(["https://a.b.c.site9.example/p", "https://x.y/q"])})
    assert domain_of(t)["domain"].to_pylist() == ["site9.example", "x.y"]


GRID = Grid.from_bounds(0.0, 0.0, 10.0, 10.0, 1.0)


def _geo_pts(n=3000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "x": rng.uniform(0.0, 10.0, n),
            "y": rng.uniform(0.0, 10.0, n),
        }
    )


def test_cell_trend_matches_dense_least_squares(ray_session):
    import ray.data

    df = _geo_pts()
    got = cell_trend(
        ray.data.from_pandas(df).repartition(6), GRID, buckets=8, min_points=5
    ).to_pandas()

    w = TS_SPAN // 8
    ref = df.copy()
    ref["b"] = ((ref["doc_id"] * 137) % TS_SPAN) // w
    lin = (ref["y"] // 1.0).astype(np.int64) * GRID.nx + (ref["x"] // 1.0).astype(np.int64)
    ref["cell_id"] = lin
    rows = []
    for cid, g in ref.groupby("cell_id"):
        yb = np.bincount(g["b"], minlength=8)
        n = int(yb.sum())
        if n < 5:
            continue
        xs = np.arange(8)
        num = 8 * int((xs * yb).sum()) - int(xs.sum()) * n
        rows.append((cid, n, num))
    exp = pd.DataFrame(rows, columns=["cell_id", "n", "trend_num"]).sort_values(
        "cell_id"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)


def test_cell_top_terms_matches_pandas(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    vocab = np.array(["alpha", "beta", "gamma", "delta", "x1", "NOPE"])
    n = 800
    df = _geo_pts(n, seed=5)
    df["text"] = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 9))) for _ in range(n)
    ]
    got = cell_top_terms(
        ray.data.from_pandas(df).repartition(4), GRID, k=2
    ).to_pandas()

    lin = (df["y"] // 1.0).astype(np.int64) * GRID.nx + (df["x"] // 1.0).astype(np.int64)
    ex = pd.DataFrame({"cell_id": lin, "token": df["text"].str.split()}).explode(
        "token", ignore_index=True
    )
    ex = ex[ex["token"].str.fullmatch(r"[a-z]+", na=False)]
    cnt = ex.groupby(["cell_id", "token"], as_index=False).size().rename(columns={"size": "n"})
    cnt = cnt.sort_values(["n", "token"], ascending=[False, True], kind="stable")
    exp = (
        cnt.groupby("cell_id", sort=False)
        .head(2)[["cell_id", "token", "n"]]
        .sort_values(["cell_id", "token"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)
