"""Property-based tests (hypothesis) for the geometry kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rasterflow.geom import cells as C
from rasterflow.geom.pip import points_in_polygon, points_in_ring
from rasterflow.geom.polyio import PolygonLayer, rect_layer


@settings(max_examples=200, deadline=None)
@given(
    cx=st.floats(-1000, 1000),
    cy=st.floats(-1000, 1000),
    r=st.floats(0.1, 100),
    nv=st.integers(3, 40),
    seed=st.integers(0, 2**31),
)
def test_convex_polygon_center_inside_far_outside(cx, cy, r, nv, seed):
    rng = np.random.default_rng(seed)
    # evenly spaced angles + bounded jitter: every angular gap < pi, so the
    # circle center is guaranteed inside
    ang = (np.arange(nv) + rng.uniform(0, 0.4, nv)) * (2 * np.pi / nv)
    ring = np.stack([cx + np.cos(ang) * r, cy + np.sin(ang) * r], axis=1)
    layer = PolygonLayer.from_rings("p", [[ring]])
    # centroid of a convex polygon is inside
    inside = points_in_polygon(np.array([cx]), np.array([cy]), layer.verts, layer.rings_of(0))
    assert inside[0]
    # far outside point is outside
    out = points_in_polygon(np.array([cx + 10 * r]), np.array([cy]), layer.verts, layer.rings_of(0))
    assert not out[0]


@settings(max_examples=100, deadline=None)
@given(
    px=st.floats(-5, 5),
    py=st.floats(-5, 5),
)
def test_shared_edge_exclusive_property(px, py):
    # two squares sharing edge x=0: any point is in at most one
    layer = rect_layer("pair", np.array([[-2, -2, 0, 2], [0, -2, 2, 2]]))
    a = points_in_polygon(np.array([px]), np.array([py]), layer.verts, layer.rings_of(0))
    b = points_in_polygon(np.array([px]), np.array([py]), layer.verts, layer.rings_of(1))
    assert int(a[0]) + int(b[0]) <= 1


@settings(max_examples=200, deadline=None)
@given(
    x=st.floats(-5e8, 5e8),
    y=st.floats(-5e8, 5e8),
    res=st.integers(1, 29),
    dres=st.integers(0, 10),
)
def test_cell_parent_consistency(x, y, res, dres):
    pres = max(0, res - dres)
    fine = C.encode_cells(np.array([x]), np.array([y]), res)
    par = C.parent_cells(fine, pres)
    direct = C.encode_cells(np.array([x]), np.array([y]), pres)
    assert par[0] == direct[0]


@settings(max_examples=100, deadline=None)
@given(seed=st.integers(0, 2**31), nv=st.integers(3, 25))
def test_ring_orientation_invariance(seed, nv):
    # even-odd PIP result must not depend on ring orientation (CW vs CCW)
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    rad = rng.uniform(0.5, 1.0, nv)
    ring = np.stack([np.cos(ang) * rad, np.sin(ang) * rad], axis=1)
    px = rng.uniform(-1.2, 1.2, 200)
    py = rng.uniform(-1.2, 1.2, 200)
    fwd = points_in_ring(px, py, ring)
    rev = points_in_ring(px, py, ring[::-1].copy())
    np.testing.assert_array_equal(fwd, rev)
