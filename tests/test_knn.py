"""kNN: brute pipeline ≡ cell-ring sharded index ≡ numpy oracle."""

import numpy as np
import pytest

from rasterflow.pipelines.knn import knn_brute, knn_cell_ring
from rasterflow.sources.fixtures import pages_dataset
from rasterflow.stages.geocode import prepare_points

K = 7


@pytest.fixture(scope="module")
def pts(ray_session):
    ds = pages_dataset(3000, override_num_blocks=6)
    p = prepare_points(ds, geocoder="url", dtype=np.float64)
    return p, p.to_pandas()


QUERIES = np.array([[0.0, 0.0], [1e6, -2e6], [-3e6, 1e6], [2.5e6, 2.5e6]])


def oracle_knn(tbl, queries, k):
    x = tbl["x"].to_numpy()
    y = tbl["y"].to_numpy()
    ids = tbl["url"].to_numpy()
    out = []
    for qi, (qx, qy) in enumerate(queries):
        d = np.sqrt((x - qx) * (x - qx) + (y - qy) * (y - qy))
        order = np.lexsort((ids, d))[:k]
        out.append((ids[order].tolist(), d[order].tolist()))
    return out


def test_knn_brute_matches_oracle(pts):
    p, tbl = pts
    got = knn_brute(p, QUERIES, K, id_col="url").to_pandas()
    exp = oracle_knn(tbl, QUERIES, K)
    for qi in range(len(QUERIES)):
        g = got[got["query_id"] == qi].sort_values(["dist", "url"])
        assert list(g["url"]) == exp[qi][0]
        np.testing.assert_allclose(list(g["dist"]), exp[qi][1], rtol=0, atol=0)


def test_knn_cell_ring_matches_brute(pts):
    p, tbl = pts
    got = knn_cell_ring(p, QUERIES, K, cell=200000.0, id_col="url", num_shards=3).to_pandas()
    exp = oracle_knn(tbl, QUERIES, K)
    for qi in range(len(QUERIES)):
        g = got[got["query_id"] == qi].sort_values(["dist", "url"])
        assert list(g["url"]) == exp[qi][0], qi
        np.testing.assert_allclose(list(g["dist"]), exp[qi][1], rtol=0, atol=0)


def test_knn_cell_ring_tiny_cells(pts):
    # stress the ring-expansion stopping rule with small cells
    p, tbl = pts
    got = knn_cell_ring(p, QUERIES[:2], 3, cell=30000.0, id_col="url", num_shards=2).to_pandas()
    exp = oracle_knn(tbl, QUERIES[:2], 3)
    for qi in range(2):
        g = got[got["query_id"] == qi].sort_values(["dist", "url"])
        assert list(g["url"]) == exp[qi][0]
