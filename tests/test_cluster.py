"""Distributed k-means tests: parity with a driver-side Lloyd's from the
same init, blob recovery, placement independence, empty-cluster survival."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _blobs(n_per=300, d=8, k=3, seed=4, spread=0.05):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 3.0
    pts = np.concatenate([c + rng.normal(scale=spread, size=(n_per, d)) for c in centers])
    ids = np.arange(len(pts), dtype=np.int64)
    return pts.astype(np.float32), ids, centers


def _ds(pts, ids, blocks=4):
    import ray.data

    t = pa.table(
        {
            "vec_id": pa.array(ids),
            "embedding": pa.array([list(map(float, r)) for r in pts], type=pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def _lloyd_reference(x, cent0, iters):
    cent = cent0.copy()
    for _ in range(iters):
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cent.T) + (cent * cent).sum(1)[None, :]
        a = d2.argmin(axis=1)
        for c in range(len(cent)):
            m = a == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    # final assignment against the FINAL centroids (what kmeans_assign sees)
    d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cent.T) + (cent * cent).sum(1)[None, :]
    return cent, d2.argmin(axis=1)


def test_kmeans_matches_driver_lloyds(ray_session):
    from rasterflow.pipelines.cluster import _init_centroids, kmeans_assign, kmeans_fit

    pts, ids, _ = _blobs()
    ds = _ds(pts, ids)
    cent0 = _init_centroids(ds, "embedding", "vec_id", 3, 4096, 0)
    cent, inertia = kmeans_fit(ds, 3, iters=5)
    ref_cent, ref_assign = _lloyd_reference(pts.astype(np.float64), cent0, 5)
    np.testing.assert_allclose(cent, ref_cent, rtol=1e-8)
    got = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    np.testing.assert_array_equal(got["cluster"].to_numpy(), ref_assign)
    assert inertia >= 0


def test_kmeans_recovers_blobs(ray_session):
    from rasterflow.pipelines.cluster import kmeans_cluster_sizes

    pts, ids, _ = _blobs(n_per=200, k=3, seed=9)
    sizes = kmeans_cluster_sizes(_ds(pts, ids), k=3, iters=8).to_pandas()
    assert sorted(sizes["n"].tolist()) == [200, 200, 200]


def test_kmeans_placement_independent(ray_session):
    from rasterflow.pipelines.cluster import kmeans_fit

    pts, ids, _ = _blobs(n_per=150, seed=2)
    cents = [kmeans_fit(_ds(pts, ids, blocks=b), 3, iters=4)[0] for b in (1, 7)]
    # float sums fold in block order, so allow summation-order noise only
    np.testing.assert_allclose(cents[0], cents[1], rtol=1e-9)


def test_kmeans_survives_empty_cluster(ray_session):
    from rasterflow.pipelines.cluster import kmeans_fit

    # k=4 over 3 tight blobs: one centroid may starve; it must keep its old
    # position (no NaNs) and the fit must still complete
    pts, ids, _ = _blobs(n_per=100, k=3, seed=11, spread=0.01)
    cent, inertia = kmeans_fit(_ds(pts, ids), 4, iters=6)
    assert np.isfinite(cent).all() and np.isfinite(inertia)
