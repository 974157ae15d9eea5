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
    j = n - 1
    for i in range(n):
        vix, viy = ring[i, 0], ring[i, 1]
        vjx, vjy = ring[j, 0], ring[j, 1]
        cond = (viy > py) != (vjy > py)
        if np.any(cond):
            # guard the division; rows where cond is False never use the value
            denom = vjy - viy
            with np.errstate(divide="ignore", invalid="ignore"):
                xint = (vjx - vix) * (py - viy) / denom + vix
            inside ^= cond & (px < xint)
        j = i
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
