"""Polygon -> cell-mask rasterization (the CPU analogue of the reference's
GL rasterization passes, built from scratch).

Three primitives:

- :func:`segment_cells` — exact "supercover" voxelization of a segment: every
  cell the segment passes through.  This replaces the reference's conservative
  outline rasterization (``HybridJoin::drawOutline``,
  ``join/HybridJoin.cpp:197-268``, GL_CONSERVATIVE_RASTERIZATION_NV) with an
  exact grid-line-crossing sweep.
- :func:`outline_cells` — all (cell, poly) pairs on any polygon outline
  (vertex cells ∪ per-edge supercover cells).
- :func:`classify_polygon_cells` — for one polygon: outline ("boundary")
  cells + fully-inside cells + center-inside cells within its MBR cell range.
  Center-inside is the GL fill rule (a pixel is covered iff its center is
  inside the rasterized polygon), which defines the raster join's cover lists
  (SURVEY.md §2.7.4); a non-outline cell is uniformly inside or outside, so
  its center decides full containment — the same exact cell/polygon test the
  reference's CPU grid index performs (``CPUJoin/GridIndexF.cpp:426-459``) but
  organized as a raster sweep instead of per-cell case analysis.
"""

from __future__ import annotations

import numpy as np

from .cells import Grid
from .pip import points_in_polygon


def segment_cells(x0: float, y0: float, x1: float, y1: float, grid: Grid) -> np.ndarray:
    """Linear cell ids of every grid cell the segment [p0, p1] passes through.

    Walks the sorted parameter values of all grid-line crossings and takes the
    cell of each inter-crossing midpoint — exact for closed cells, no
    dependence on slope special-cases.  Cells outside the grid are clipped.
    """
    gx0 = (x0 - grid.x0) / grid.cell
    gy0 = (y0 - grid.y0) / grid.cell
    gx1 = (x1 - grid.x0) / grid.cell
    gy1 = (y1 - grid.y0) / grid.cell
    dx = gx1 - gx0
    dy = gy1 - gy0
    ts = [np.array([0.0, 1.0])]
    if dx != 0.0:
        lo, hi = (gx0, gx1) if dx > 0 else (gx1, gx0)
        ks = np.arange(np.ceil(lo), np.floor(hi) + 1.0)
        ts.append((ks - gx0) / dx)
    if dy != 0.0:
        lo, hi = (gy0, gy1) if dy > 0 else (gy1, gy0)
        ks = np.arange(np.ceil(lo), np.floor(hi) + 1.0)
        ts.append((ks - gy0) / dy)
    t = np.unique(np.clip(np.concatenate(ts), 0.0, 1.0))
    if len(t) < 2:
        t = np.array([0.0, 1.0])
    tm = (t[:-1] + t[1:]) / 2.0
    mx = gx0 + tm * dx
    my = gy0 + tm * dy
    ix = np.floor(mx).astype(np.int64)
    iy = np.floor(my).astype(np.int64)
    ok = (ix >= 0) & (ix < grid.nx) & (iy >= 0) & (iy < grid.ny)
    return np.unique(iy[ok] * np.int64(grid.nx) + ix[ok])


def ring_outline_cells(ring: np.ndarray, grid: Grid) -> np.ndarray:
    """Linear cell ids touched by a closed ring's outline."""
    out = []
    n = len(ring)
    for i in range(n):
        j = (i + 1) % n
        out.append(segment_cells(ring[i, 0], ring[i, 1], ring[j, 0], ring[j, 1], grid))
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def classify_polygon_cells(
    verts: np.ndarray,
    ring_offsets: np.ndarray,
    grid: Grid,
    dtype=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Rasterize one polygon to cell sets.

    Returns ``(outline, cover, full_inside)`` — linear cell ids:
      outline     : cells the polygon boundary passes through
      cover       : cells whose center is inside (GL fill rule; raster join)
      full_inside : cover cells that are not outline cells (fully contained)
    """
    outline = []
    for r in range(len(ring_offsets) - 1):
        ring = verts[ring_offsets[r] : ring_offsets[r + 1]]
        outline.append(ring_outline_cells(ring, grid))
    outline = (
        np.unique(np.concatenate(outline)) if outline else np.empty(0, dtype=np.int64)
    )

    # candidate cells = the polygon's MBR cell range, clipped to the grid
    vs = verts[ring_offsets[0] : ring_offsets[-1]]
    ix0 = max(0, int(np.floor((vs[:, 0].min() - grid.x0) / grid.cell)))
    ix1 = min(grid.nx - 1, int(np.floor((vs[:, 0].max() - grid.x0) / grid.cell)))
    iy0 = max(0, int(np.floor((vs[:, 1].min() - grid.y0) / grid.cell)))
    iy1 = min(grid.ny - 1, int(np.floor((vs[:, 1].max() - grid.y0) / grid.cell)))
    if ix1 < ix0 or iy1 < iy0:
        empty = np.empty(0, dtype=np.int64)
        return outline, empty, empty

    ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ixs, iys)
    lin = (gy * grid.nx + gx).ravel()
    cx = grid.x0 + (gx.ravel().astype(np.float64) + 0.5) * grid.cell
    cy = grid.y0 + (gy.ravel().astype(np.float64) + 0.5) * grid.cell
    inside = points_in_polygon(cx, cy, verts, ring_offsets, dtype=dtype)
    cover = lin[inside]
    full_inside = cover[~np.isin(cover, outline, assume_unique=False)]
    return outline, cover, full_inside


def dilate_cells(lin: np.ndarray, grid: Grid, r: int = 1) -> np.ndarray:
    """Dilate a set of linear cell ids by ``r`` cells (Chebyshev ball).

    Mirrors the reference's 3×3 ``isBorder`` neighborhood test
    (``shaders/hybrid.glsl:174-185``) applied as a mask dilation.
    """
    if len(lin) == 0:
        return lin.astype(np.int64)
    iy, ix = np.divmod(np.asarray(lin, dtype=np.int64), grid.nx)
    offs = np.arange(-r, r + 1, dtype=np.int64)
    ox, oy = np.meshgrid(offs, offs)
    nix = (ix[:, None] + ox.ravel()[None, :]).ravel()
    niy = (iy[:, None] + oy.ravel()[None, :]).ravel()
    ok = (nix >= 0) & (nix < grid.nx) & (niy >= 0) & (niy < grid.ny)
    return np.unique(niy[ok] * np.int64(grid.nx) + nix[ok])


def area_fraction_inside(
    verts: np.ndarray,
    ring_offsets: np.ndarray,
    grid: Grid,
    lin: np.ndarray,
    subsamples: int = 8,
) -> np.ndarray:
    """Approximate fraction of each cell's area inside the polygon.

    Deterministic S×S subcell-center sampling — stands in for the reference's
    exact edge-clipped area computation (``shaders/line-bound.frag:48-187``);
    used only for the *estimated* error bounds (the guaranteed bounds never
    depend on it, SURVEY.md §2.4 J4).
    """
    if len(lin) == 0:
        return np.empty(0, dtype=np.float64)
    iy, ix = np.divmod(np.asarray(lin, dtype=np.int64), grid.nx)
    s = (np.arange(subsamples, dtype=np.float64) + 0.5) / subsamples
    sx, sy = np.meshgrid(s, s)
    px = grid.x0 + (ix[:, None].astype(np.float64) + sx.ravel()[None, :]) * grid.cell
    py = grid.y0 + (iy[:, None].astype(np.float64) + sy.ravel()[None, :]) * grid.cell
    inside = points_in_polygon(px.ravel(), py.ravel(), verts, ring_offsets)
    return inside.reshape(len(lin), -1).mean(axis=1)
