"""PolygonBundle — the broadcast small side of every spatial join.

Packs, for one (layer, canvas grid) pair, everything a join actor needs:

- the layer's flat CSR vertex arrays (for exact PIP refinement),
- ``cand``   CSR: cell -> polygons whose shape intersects the cell (the exact
  CPU grid index of the reference, ``CPUJoin/GridIndexF.cpp:60-155``),
- ``cover``  CSR: cell -> polygons whose rasterization covers the cell center
  (the GL fill rule; multi-valued, preserving the reference's multi-cover
  raster semantics, SURVEY.md §2.7.4),
- ``border`` mask: any polygon outline cell, dilated by 1 cell (the 3×3
  ``isBorder`` test of ``shaders/hybrid.glsl:174-185`` /
  ``HybridJoin::drawOutline``),
- per-(border-cell, poly) area fractions, built lazily for error bounds.

The bundle is a plain dict of numpy arrays: built once on the driver (pure
function of (layer, grid) — cacheable), shipped once via ``ray.put``, pinned
per actor in ``__init__``.  CSR lookup over sparse cell keys uses
``np.searchsorted`` on the sorted unique cell-id array, so batch lookups stay
fully vectorized.
"""

from __future__ import annotations

import numpy as np

from ..geom.cells import Grid
from ..geom.polyio import PolygonLayer
from ..geom.projection import accuracy_to_cell_size
from ..geom.rasterize import area_fraction_inside, classify_polygon_cells, dilate_cells


def _pairs_to_csr(cells: np.ndarray, polys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cell, poly) pairs -> (sorted unique cells, indptr, poly_ids)."""
    if len(cells) == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.zeros(1, dtype=np.int64),
            np.empty(0, dtype=np.int32),
        )
    order = np.lexsort((polys, cells))
    cells = cells[order]
    polys = polys[order]
    ucells, counts = np.unique(cells, return_counts=True)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    return ucells, indptr.astype(np.int64), polys.astype(np.int32)


class CsrLookup:
    """Sparse cell -> polygon-list map with vectorized batch expansion."""

    __slots__ = ("keys", "indptr", "values")

    def __init__(self, keys: np.ndarray, indptr: np.ndarray, values: np.ndarray):
        self.keys = keys
        self.indptr = indptr
        self.values = values

    def expand(self, lin: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """For query cells ``lin`` (one per point) return candidate pairs
        ``(point_idx, poly_id)`` — fully vectorized."""
        if len(lin) == 0 or len(self.keys) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        pos = np.searchsorted(self.keys, lin)
        pos_c = np.clip(pos, 0, len(self.keys) - 1)
        hit = self.keys[pos_c] == lin
        starts = self.indptr[pos_c]
        counts = np.where(hit, self.indptr[pos_c + 1] - starts, 0)
        total = int(counts.sum())
        if total == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int32)
        point_idx = np.repeat(np.arange(len(lin), dtype=np.int64), counts)
        # offsets within each point's candidate run
        run_ends = np.cumsum(counts)
        run_starts = run_ends - counts
        within = np.arange(total, dtype=np.int64) - np.repeat(run_starts, counts)
        val_idx = np.repeat(starts, counts) + within
        return point_idx, self.values[val_idx]


class PolygonBundle:
    """Immutable broadcastable join state for one (layer, grid)."""

    def __init__(self, layer: PolygonLayer, grid: Grid, build_area_fractions: bool = False, pairs=None):
        self.layer_name = layer.name
        self.grid = grid
        self.npolys = layer.npolys
        self.verts = np.ascontiguousarray(layer.verts)
        self.ring_offsets = np.ascontiguousarray(layer.ring_offsets)
        self.poly_ring_offsets = np.ascontiguousarray(layer.poly_ring_offsets)

        if pairs is None:
            pairs = classify_layer_pairs(layer, grid, range(layer.npolys))
        cand_cells, cand_polys, cover_cells, cover_polys, outline_cells_all = pairs

        self.cand = CsrLookup(
            *_pairs_to_csr(
                np.concatenate(cand_cells) if cand_cells else np.empty(0, np.int64),
                np.concatenate(cand_polys) if cand_polys else np.empty(0, np.int32),
            )
        )
        self.cover = CsrLookup(
            *_pairs_to_csr(
                np.concatenate(cover_cells) if cover_cells else np.empty(0, np.int64),
                np.concatenate(cover_polys) if cover_polys else np.empty(0, np.int32),
            )
        )
        outline_all = (
            np.unique(np.concatenate(outline_cells_all))
            if len(outline_cells_all)
            else np.empty(0, dtype=np.int64)
        )
        # border = outline dilated by one cell (3×3 neighborhood), sorted
        self.border_cells = dilate_cells(outline_all, grid, r=1)
        self._outline_all = outline_all

        # unified cell table: ONE searchsorted per batch serves candidate
        # lists, cover lists and the border flag (3x fewer binary searches in
        # the join hot path)
        cells = np.union1d(self.cand.keys, self.border_cells)
        self.ucells = cells

        def _align(csr: CsrLookup):
            indptr = np.zeros(len(cells) + 1, dtype=np.int64)
            pos = np.searchsorted(cells, csr.keys)
            indptr[pos + 1] = np.diff(csr.indptr)
            np.cumsum(indptr, out=indptr)
            return indptr, csr.values

        self.ucand_indptr, self.ucand_vals = _align(self.cand)
        self.ucover_indptr, self.ucover_vals = _align(self.cover)
        self.uborder = np.zeros(len(cells), dtype=bool)
        if len(self.border_cells):
            self.uborder[np.searchsorted(cells, self.border_cells)] = True
        # direct-address lookup table cell_id -> ucell position: O(1) single
        # gather per point, built ONCE at bundle build and shipped inside the
        # (plasma-shared, zero-copy) bundle — unlike a per-worker hash index,
        # which for a 10^7-key continental bundle cost seconds to build and
        # ~300 MB of heap in EVERY worker (measured: 32 workers × 19M keys
        # ground the 16k-polygon join to a halt).  Gated by grid size; giant
        # grids fall back to the lazy per-process pandas hash index.
        ncells_grid = int(grid.nx) * int(grid.ny)
        if self.DIRECT_TABLE_MIN_KEYS <= len(cells) and ncells_grid <= self.DIRECT_TABLE_MAX_CELLS:
            table = np.full(ncells_grid, -1, dtype=np.int32)
            table[cells] = np.arange(len(cells), dtype=np.int32)
            self.ucell_table = table
        else:
            self.ucell_table = None
        self._area_frac: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        if build_area_fractions:
            self.build_area_fractions()

    #: direct table cap: 250M grid cells = 1 GB int32 (plasma-shared once per
    #: node); beyond that use the tile-sharded join or the hash fallback
    DIRECT_TABLE_MAX_CELLS = 250_000_000
    #: below this many occupied ucells a per-process khash index is
    #: milliseconds to build and cache-resident to probe — a sparse direct
    #: table would only bloat the broadcast payload and thrash caches
    #: (measured: the 260-poly layer occupies 170k of an 87M-cell grid; the
    #: table regressed its join ~25% while the 19M-key bundle gained 23x)
    DIRECT_TABLE_MIN_KEYS = 2_000_000

    def locate_ucells(self, lin: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(idx, hit) positions of query cells in the unified table.

        Direct-address gather when the table exists (the common case);
        otherwise a lazy per-process pandas khash index (~10x faster than
        binary search over millions of keys for random queries)."""
        table = getattr(self, "ucell_table", None)
        if table is not None:
            pos = table[lin]
            hit = pos >= 0
            return np.where(hit, pos, 0).astype(np.int64, copy=False), hit
        index = self.__dict__.get("_ucell_index")
        if index is None:
            import pandas as pd

            index = pd.Index(self.ucells)
            self.__dict__["_ucell_index"] = index
        pos = index.get_indexer(lin)
        hit = pos >= 0
        return np.where(hit, pos, 0), hit

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_ucell_index", None)
        return state

    # ---- border membership (sorted-array membership, vectorized) ----
    def is_border(self, lin: np.ndarray) -> np.ndarray:
        if len(self.border_cells) == 0:
            return np.zeros(len(lin), dtype=bool)
        pos = np.searchsorted(self.border_cells, lin)
        pos_c = np.clip(pos, 0, len(self.border_cells) - 1)
        return self.border_cells[pos_c] == lin

    def build_area_fractions(self, subsamples: int = 8) -> None:
        """Per polygon: its outline cells + area fraction inside (for J4)."""
        from ..geom.polyio import PolygonLayer as _PL  # noqa: F401 (doc aid)

        for p in range(self.npolys):
            ro = self.ring_offsets[self.poly_ring_offsets[p] : self.poly_ring_offsets[p + 1] + 1]
            outline, _cover, _full = classify_polygon_cells(self.verts, ro, self.grid)
            frac = area_fraction_inside(self.verts, ro, self.grid, outline, subsamples=subsamples)
            self._area_frac[p] = (outline, frac)

    @property
    def area_fractions(self) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        if not self._area_frac and self.npolys:
            self.build_area_fractions()
        return self._area_frac

    def rings_of(self, poly_id: int) -> np.ndarray:
        r0 = self.poly_ring_offsets[poly_id]
        r1 = self.poly_ring_offsets[poly_id + 1]
        return self.ring_offsets[r0 : r1 + 1]


def classify_layer_pairs(layer: PolygonLayer, grid: Grid, poly_ids):
    """Classify a set of polygons to (cand, cover, outline) pair lists.

    Pure function of (layer slice, grid) — the unit of parallelism for
    distributed bundle builds."""
    cand_cells, cand_polys = [], []
    cover_cells, cover_polys = [], []
    outline_cells_all = []
    verts = layer.verts
    for p in poly_ids:
        ro = layer.rings_of(p)
        outline, cover, _full = classify_polygon_cells(verts, ro, grid)
        # exact candidate set = every cell the polygon intersects: boundary
        # cells plus center-covered cells (non-outline covered = fully inside)
        cand = np.union1d(outline, cover)
        cand_cells.append(cand)
        cand_polys.append(np.full(len(cand), p, dtype=np.int32))
        cover_cells.append(cover)
        cover_polys.append(np.full(len(cover), p, dtype=np.int32))
        outline_cells_all.append(outline)
    return cand_cells, cand_polys, cover_cells, cover_polys, outline_cells_all


def _parallel_pairs(layer: PolygonLayer, grid: Grid, chunk: int = 256):
    """Distribute the per-polygon classification across Ray tasks (the index
    build is embarrassingly parallel; the reference builds its GPU index on
    device, ``GLFunction::createPolyIndex``)."""
    import ray

    @ray.remote
    def work(layer_ref, ids):
        return classify_layer_pairs(layer_ref, grid, ids)

    layer_ref = ray.put(layer)
    futures = [
        work.remote(layer_ref, list(range(s, min(s + chunk, layer.npolys))))
        for s in range(0, layer.npolys, chunk)
    ]
    cand_cells, cand_polys, cover_cells, cover_polys, outline = [], [], [], [], []
    for res in ray.get(futures):
        cand_cells += res[0]
        cand_polys += res[1]
        cover_cells += res[2]
        cover_polys += res[3]
        outline += res[4]
    return cand_cells, cand_polys, cover_cells, cover_polys, outline


_BUNDLE_CACHE: dict[tuple, PolygonBundle] = {}


def build_bundle(
    layer: PolygonLayer,
    accuracy_m: float | None = None,
    cell_size: float | None = None,
    max_cover_cells: int = 32_000_000,
    build_area_fractions: bool = False,
) -> PolygonBundle:
    """Build (or fetch cached) the bundle for a layer at a raster resolution.

    ``accuracy_m`` follows the reference's ε contract: cell size =
    (ε/√2)/groundRes (``GLFunction.cpp:26-30``).  Unlike the reference's dense
    FBO canvas (MAX_FBO_SIZE 8192 with tiled passes,
    ``RasterJoin.cpp:56-68``), our cell structures are *sparse* — memory scales
    with cells the polygons actually touch, not with canvas dimensions — so the
    resolution cap is on the estimated total covered cells
    (Σ polygon-MBR area / cell²), bounded by ``max_cover_cells``.
    """
    xmin, ymin, xmax, ymax = layer.bounds
    if cell_size is None:
        if accuracy_m is None:
            raise ValueError("pass accuracy_m or cell_size")
        cell_size = accuracy_to_cell_size(accuracy_m)
    m = layer.mbrs
    total_area = float(((m[:, 2] - m[:, 0]) * (m[:, 3] - m[:, 1])).sum())
    min_cell_cover = (total_area / max_cover_cells) ** 0.5 if total_area > 0 else 0.0
    # linearization safety: keep nx, ny < 2^24 so lin * npolys stays in int64
    min_cell_dim = max(xmax - xmin, ymax - ymin) / float(1 << 24)
    cell_size = max(float(cell_size), min_cell_cover, min_cell_dim)
    key = (layer.content_hash(), round(cell_size, 12), build_area_fractions)
    b = _BUNDLE_CACHE.get(key)
    if b is None:
        b = _load_disk_cache(key)
    if b is None:
        import ray

        grid = Grid.from_bounds(xmin, ymin, xmax, ymax, cell_size)
        pairs = None
        if ray.is_initialized() and layer.npolys >= 512:
            pairs = _parallel_pairs(layer, grid)
        b = PolygonBundle(layer, grid, build_area_fractions=build_area_fractions, pairs=pairs)
        _save_disk_cache(key, b)
    _BUNDLE_CACHE[key] = b
    return b


# Bundles are pure functions of (layer, grid); persist them so repeated
# processes (bench subprocesses, test sessions, resumed jobs) skip the build —
# the analogue of the reference persisting its CPU grid index to disk
# (``CPUJoin/GridIndexF.cpp:200-275``).
#
# The cache unpickles its own files, so it must live in a per-user 0700
# directory — a fixed world-writable path would let another local user plant
# a pickle at a predictable key (ADVICE r1).  Override with
# $RASTERFLOW_CACHE_DIR.


def _disk_cache_dir() -> "str":
    import os
    import tempfile

    env = os.environ.get("RASTERFLOW_CACHE_DIR")
    if env:
        return env
    uid = os.getuid() if hasattr(os, "getuid") else "na"
    return os.path.join(tempfile.gettempdir(), f"rasterflow_bundles_{uid}")


def _cache_path(key) -> "str":
    import os

    name = f"bundle_v3_{key[0]}_{key[1]}_{int(key[2])}.pkl"
    return os.path.join(_disk_cache_dir(), name)


def _dir_ok(path) -> bool:
    """Refuse to unpickle from a cache dir we don't own or that others can
    write to (defense against pre-planted pickles on shared machines)."""
    import os
    import stat

    try:
        st = os.stat(path)
    except OSError:
        return False
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        return False
    return not st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)


def _load_disk_cache(key):
    import os
    import pickle

    path = _cache_path(key)
    if not os.path.exists(path) or not _dir_ok(_disk_cache_dir()):
        return None
    try:
        with open(path, "rb") as fh:
            return pickle.load(fh)
    except Exception:  # noqa: BLE001 - corrupt cache -> rebuild
        return None


def _save_disk_cache(key, bundle) -> None:
    import os
    import pickle
    import tempfile

    d = _disk_cache_dir()
    os.makedirs(d, mode=0o700, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            pickle.dump(bundle, fh, protocol=pickle.HIGHEST_PROTOCOL)
        os.replace(tmp, _cache_path(key))
    except Exception:  # noqa: BLE001 - cache is best-effort
        if os.path.exists(tmp):
            os.unlink(tmp)
