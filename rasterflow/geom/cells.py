"""Hierarchical grid-cell encoding (H3/S2-style, from scratch) + local grids.

Two kinds of grids:

1. **Global hierarchical cells** — a quadtree over the whole zoom-22 world
   square ``[0, 2^30)^2``: at resolution ``res`` the world is ``2^res × 2^res``
   cells, each ``2^(30-res)`` world units wide.  A cell id packs
   ``(res << 58) | (ix << 29) | iy`` into an int64; the parent at a coarser
   resolution is a bit-shift (SURVEY.md §7.0).  This is the engine's
   tile/partitioning key (the analogue of the reference's backend hash grid,
   ``RasterJoin/db/HashGridIndex.cpp:96-111``, whose XOR-hash only existed to
   name disk partitions and has no Parquet equivalent).

2. **Local canvas grids** (:class:`Grid`) — a bounded raster over a polygon
   layer's bbox at a cell size derived from the accuracy ε, the analogue of
   the reference's FBO canvas (``RasterJoin/join/RasterJoin.cpp:51-78``):
   ``origin = layer bbox lower-left``, ``n = ceil(extent / cell)``; points
   outside the canvas are clipped, mirroring GL NDC clipping.

All vectorized numpy over Arrow-backed arrays.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .projection import WORLD_CENTER_X, WORLD_CENTER_Y

MAX_RES = 29
_RES_SHIFT = 58
_IX_SHIFT = 29
_COORD_MASK = (1 << 29) - 1
_LOG2_WORLD = 30  # WORLD_SIZE == 2**30 world units


def cell_width(res: int) -> float:
    """Width of a cell at ``res`` in world units."""
    return float(2 ** (_LOG2_WORLD - res))


def encode_cells(x: np.ndarray, y: np.ndarray, res: int, centered: bool = True) -> np.ndarray:
    """Centered world coords -> packed int64 cell ids at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if centered:
        x = x + WORLD_CENTER_X
        y = y + WORLD_CENTER_Y
    shift = _LOG2_WORLD - res
    ix = np.clip(np.floor(x).astype(np.int64) >> shift, 0, (1 << res) - 1)
    iy = np.clip(np.floor(y).astype(np.int64) >> shift, 0, (1 << res) - 1)
    return (np.int64(res) << _RES_SHIFT) | (ix << _IX_SHIFT) | iy


def decode_cells(cell_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Packed ids -> (res, ix, iy)."""
    cell_id = np.asarray(cell_id, dtype=np.int64)
    res = cell_id >> _RES_SHIFT
    ix = (cell_id >> _IX_SHIFT) & _COORD_MASK
    iy = cell_id & _COORD_MASK
    return res, ix, iy


def parent_cells(cell_id: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarser ancestor of each cell — a pure bit-shift (quadtree parent)."""
    res, ix, iy = decode_cells(cell_id)
    d = res - np.int64(parent_res)
    if np.any(d < 0):
        raise ValueError("parent_res must be coarser (smaller) than the cell res")
    return (np.int64(parent_res) << _RES_SHIFT) | ((ix >> d) << _IX_SHIFT) | (iy >> d)


def children_cells(cell_id: int) -> np.ndarray:
    """The four direct children of one cell."""
    res_a, ix_a, iy_a = decode_cells(np.asarray([cell_id]))
    res, ix, iy = int(res_a[0]), int(ix_a[0]), int(iy_a[0])
    if res >= MAX_RES:
        raise ValueError("cell already at max resolution")
    out = []
    for dx in (0, 1):
        for dy in (0, 1):
            out.append(((res + 1) << _RES_SHIFT) | (((ix << 1) | dx) << _IX_SHIFT) | ((iy << 1) | dy))
    return np.asarray(out, dtype=np.int64)


def cell_bounds(cell_id: np.ndarray, centered: bool = True) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(xmin, ymin, xmax, ymax) of each cell in (centered) world coords."""
    res, ix, iy = decode_cells(cell_id)
    w = (2.0 ** (_LOG2_WORLD - res.astype(np.float64)))
    x0 = ix.astype(np.float64) * w
    y0 = iy.astype(np.float64) * w
    if centered:
        x0 = x0 - WORLD_CENTER_X
        y0 = y0 - WORLD_CENTER_Y
    return x0, y0, x0 + w, y0 + w


@dataclass(frozen=True)
class Grid:
    """A local raster canvas: origin + square cell size + dimensions."""

    x0: float
    y0: float
    cell: float
    nx: int
    ny: int

    @classmethod
    def from_bounds(cls, xmin: float, ymin: float, xmax: float, ymax: float, cell: float) -> "Grid":
        nx = max(1, int(np.ceil((xmax - xmin) / cell)))
        ny = max(1, int(np.ceil((ymax - ymin) / cell)))
        return cls(float(xmin), float(ymin), float(cell), nx, ny)

    @property
    def ncells(self) -> int:
        return self.nx * self.ny

    def locate(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(ix, iy, valid): cell indices; valid=False for clipped points."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        fx = np.floor((x - self.x0) / self.cell)
        fy = np.floor((y - self.y0) / self.cell)
        valid = (fx >= 0) & (fx < self.nx) & (fy >= 0) & (fy < self.ny)
        ix = np.clip(fx, 0, self.nx - 1).astype(np.int64)
        iy = np.clip(fy, 0, self.ny - 1).astype(np.int64)
        return ix, iy, valid

    def linearize(self, ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
        return iy * np.int64(self.nx) + ix

    def locate_linear(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        ix, iy, valid = self.locate(x, y)
        return self.linearize(ix, iy), valid

    def centers(self, lin: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        lin = np.asarray(lin, dtype=np.int64)
        iy, ix = np.divmod(lin, self.nx)
        return (
            self.x0 + (ix.astype(np.float64) + 0.5) * self.cell,
            self.y0 + (iy.astype(np.float64) + 0.5) * self.cell,
        )

    def cell_rect(self, lin: int) -> tuple[float, float, float, float]:
        iy, ix = divmod(int(lin), self.nx)
        return (
            self.x0 + ix * self.cell,
            self.y0 + iy * self.cell,
            self.x0 + (ix + 1) * self.cell,
            self.y0 + (iy + 1) * self.cell,
        )
