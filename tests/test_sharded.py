"""Tile-sharded join ≡ single-bundle join (exact strategies)."""

import numpy as np
import pytest

from rasterflow.pipelines.joins import aggregate_by_polygon
from rasterflow.pipelines.sharded import aggregate_by_polygon_sharded
from rasterflow.sources.fixtures import neigh_like_layer, pages_dataset
from rasterflow.stages.geocode import prepare_points


@pytest.fixture(scope="module")
def fix(ray_session):
    ds = pages_dataset(4000, override_num_blocks=4)
    pts = prepare_points(ds, geocoder="url", dtype=np.float64)
    return pts, neigh_like_layer(60, seed=5)


def to_dense(df, n):
    out = np.zeros(n)
    out[df["poly_id"].to_numpy()] = df["count"].to_numpy()
    return out


@pytest.mark.parametrize("how", ["index", "hybrid"])
def test_sharded_equals_unsharded(fix, how):
    pts, layer = fix
    base = aggregate_by_polygon(pts, layer, how=how, accuracy_m=200.0).to_pandas()
    for tile_res in (6, 8):
        sh = aggregate_by_polygon_sharded(
            pts, layer, tile_res=tile_res, how=how, accuracy_m=200.0
        ).to_pandas()
        np.testing.assert_array_equal(
            to_dense(sh, layer.npolys), to_dense(base, layer.npolys), err_msg=f"res={tile_res}"
        )


def test_sharded_raster_equals_unsharded_raster(fix):
    # tile canvases snap to the global lattice -> identical cover semantics
    pts, layer = fix
    base = aggregate_by_polygon(pts, layer, how="raster", accuracy_m=100.0).to_pandas()
    sh = aggregate_by_polygon_sharded(pts, layer, tile_res=7, how="raster", accuracy_m=100.0).to_pandas()
    np.testing.assert_array_equal(to_dense(sh, layer.npolys), to_dense(base, layer.npolys))


def test_sharded_raster_within_epsilon(fix):
    pts, layer = fix
    exact = aggregate_by_polygon(pts, layer, how="index").to_pandas()
    sh = aggregate_by_polygon_sharded(pts, layer, tile_res=7, how="raster", accuracy_m=100.0).to_pandas()
    e = to_dense(exact, layer.npolys)
    r = to_dense(sh, layer.npolys)
    assert np.abs(r - e).sum() <= max(5, 0.05 * e.sum())
