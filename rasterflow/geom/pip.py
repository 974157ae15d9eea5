"""Exact point-in-polygon kernel (even-odd crossing, half-open edge rule).

The rule is the classic PNPOLY even-odd test, identical across all four of the
reference's implementations (``shaders/index.glsl:47-70``,
``shaders/hybrid.glsl:57-78``, ``shaders/line-bound.frag:189-215``,
``CPUJoin/GridIndexF.cpp:383-402``): for each edge (vi, vj),

    ((vi.y > ty) != (vj.y > ty)) and (tx < (vj.x-vi.x)*(ty-vi.y)/(vj.y-vi.y)+vi.x)

flips parity.  The ``>`` / ``<`` asymmetry makes the boundary half-open so a
point on a shared border is assigned to at most one polygon deterministically
(SURVEY.md §2.7.3).  Multi-ring polygons XOR ring parities (even-odd fill).

Vectorized over *points* with a Python loop over *edges* — polygons are the
small broadcast side (tens of vertices), points come in 10^4-10^5-row batches,
so the inner ops are numpy over the long axis.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray, dtype=None) -> np.ndarray:
    """Even-odd parity of points vs one ring (closed implicitly).

    ``ring`` is (n, 2); last->first edge is implicit. ``dtype=np.float32``
    selects the conformance plane (float32 arithmetic like the reference).
    """
    if dtype is not None:
        px = np.asarray(px, dtype)
        py = np.asarray(py, dtype)
        ring = np.asarray(ring, dtype)
    else:
        px = np.asarray(px)
        py = np.asarray(py)
        ring = np.asarray(ring)
    n = len(ring)
    inside = np.zeros(px.shape, dtype=bool)
    if n < 3:
        return inside
    # broadcast edges × points: vi = ring[i], vj = ring[i-1] (same iteration
    # order/orientation as the reference's loop).  Divide-by-zero edges
    # (viy == vjy) have cond False, so the garbage xint rows are masked out;
    # errors are pre-silenced once (cheaper than a context manager per edge).
    vi = ring
    vj = np.roll(ring, 1, axis=0)
    vix = vi[:, 0:1]
    viy = vi[:, 1:2]
    vjx = vj[:, 0:1]
    vjy = vj[:, 1:2]
    old = np.seterr(divide="ignore", invalid="ignore")
    try:
        max_elems = 4_000_000
        step = max(1, max_elems // max(1, n))
        for s in range(0, len(px), step):
            pxs = px[s : s + step][None, :]
            pys = py[s : s + step][None, :]
            cond = (viy > pys) != (vjy > pys)
            xint = (vjx - vix) * (pys - viy) / (vjy - viy) + vix
            hits = cond & (pxs < xint)
            inside[s : s + step] = (hits.sum(axis=0) & 1).astype(bool)
    finally:
        np.seterr(**old)
    return inside


def points_in_polygon(
    px: np.ndarray,
    py: np.ndarray,
    verts: np.ndarray,
    ring_offsets: np.ndarray,
    dtype=None,
) -> np.ndarray:
    """Even-odd PIP for a (possibly multi-ring) polygon.

    ``verts`` is (V, 2); ``ring_offsets`` is CSR over rings (len R+1). Holes
    are expressed as additional rings — even-odd semantics XOR parities.
    """
    inside = np.zeros(np.shape(px), dtype=bool)
    for r in range(len(ring_offsets) - 1):
        ring = verts[ring_offsets[r] : ring_offsets[r + 1]]
        inside ^= points_in_ring(px, py, ring, dtype=dtype)
    return inside


def pip_pairs(
    px: np.ndarray,
    py: np.ndarray,
    pair_point: np.ndarray,
    pair_poly: np.ndarray,
    verts: np.ndarray,
    ring_offsets: np.ndarray,
    poly_ring_offsets: np.ndarray,
    dtype=None,
) -> np.ndarray:
    """Evaluate PIP for (point, polygon) candidate pairs.

    Groups the pairs by polygon id and runs the vectorized kernel once per
    distinct polygon present in the batch — the numpy analogue of the
    reference's per-point candidate-list walk (``shaders/index.glsl:186-249``).

    Returns a boolean mask aligned with the pair arrays.
    """
    out = np.zeros(len(pair_point), dtype=bool)
    if len(pair_point) == 0:
        return out
    order = np.argsort(pair_poly, kind="stable")
    sp = pair_poly[order]
    spt = pair_point[order]
    bounds = np.flatnonzero(np.diff(sp)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(sp)]))
    for s, e in zip(starts, ends):
        pid = int(sp[s])
        pts = spt[s:e]
        r0, r1 = poly_ring_offsets[pid], poly_ring_offsets[pid + 1]
        inside = points_in_polygon(
            px[pts], py[pts], verts, ring_offsets[r0 : r1 + 1], dtype=dtype
        )
        out[order[s:e]] = inside
    return out
