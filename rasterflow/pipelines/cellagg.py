"""Per-cell histograms / canvas aggregation (A3: the canvas as data).

The reference's canvas is a dense per-cell ``(count, sum)`` accumulator
(``RasterJoin/join/RasterJoin.cpp:51-78``).  Here it is a two-stage
aggregation: a vectorized per-batch ``np.bincount`` partial (one row per
touched cell per batch) followed by a small ``groupby("cell_id").sum`` over
the partials — the canonical partial→final split (SURVEY.md §2.5 A3) that
avoids shuffling raw rows and neutralizes hot-cell skew (a hot cell collapses
to one partial row per batch regardless of its point count).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.cells import Grid, encode_cells


def cell_histogram_grid(points_ds, grid: Grid, value_col: str | None = None, sort: bool = True):
    """Counts (and optional sums) per local-grid cell (linearized ids)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        lin, valid = grid.locate_linear(x, y)
        lin = lin[valid]
        cells, counts = np.unique(lin, return_counts=True)
        cols = {"cell_id": cells, "n": counts.astype(np.int64)}
        if value_col is not None:
            v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)[valid]
            order = np.argsort(lin, kind="stable")
            sums = np.add.reduceat(v[order], np.concatenate(([0], np.cumsum(counts)[:-1])))
            cols["val_sum"] = sums
        return pa.table(cols)

    from ..util import coalesce_small, grouped_aggregate

    partials = coalesce_small(points_ds.map_batches(partial, batch_format="pyarrow"), 0.5)
    aggs = {"n": ("n", "sum")}
    if value_col is not None:
        aggs["val_sum"] = ("val_sum", "sum")
    out = grouped_aggregate(partials, "cell_id", aggs)
    return out.sort("cell_id") if sort else out


def extract_raster_at_points(points_ds, grid: Grid, out_col: str = "density"):
    """Raster value extraction at point locations (the GIS "sample raster at
    points" primitive): append each point's own cell count — a local-density
    feature column for downstream selection/filtering.

    The collapsed count raster (canvas-sized, the same bound as every other
    canvas structure) broadcasts once via ``ray.put`` as a dense int64
    vector; each batch gathers it at the point's linearized cell — zero
    shuffle of the points, one exchange to build the raster.  Off-canvas
    points get density 0."""
    import ray

    from .cellagg import cell_histogram_grid  # self-import safe at runtime

    hist = cell_histogram_grid(points_ds, grid, sort=False).to_pandas()
    dense = np.zeros(grid.ncells, dtype=np.int64)
    dense[hist["cell_id"].to_numpy()] = hist["n"].to_numpy()
    ref = ray.put(dense) if ray.is_initialized() else dense

    def fn(batch: pa.Table) -> pa.Table:
        d = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        lin, valid = grid.locate_linear(x, y)
        val = np.where(valid, d[np.minimum(lin, grid.ncells - 1)], 0)
        return batch.append_column(out_col, pa.array(val.astype(np.int64)))

    return points_ds.map_batches(fn, batch_format="pyarrow")


def coverage_gaps(points_ds, grid: Grid, sort: bool = True):
    """Coverage-gap mining: grid cells whose ENTIRE 3×3 neighborhood holds
    zero points — "where is there no data at all", the complement query
    behind site placement and survey-gap analysis.

    The lit-cell set collapses to a canvas-sized bitmap broadcast once via
    ``ray.put``; the canvas itself streams as ``ray.data.range`` blocks and
    each block tests its cells' neighborhoods against the bitmap with one
    vectorized gather per stencil offset — no shuffle at all after the
    histogram's own exchange.  Returns ``(cell_id,)`` sorted."""
    import ray

    hist = cell_histogram_grid(points_ds, grid, sort=False).to_pandas()
    lit = np.zeros(grid.ncells, dtype=bool)
    lit[hist["cell_id"].to_numpy()] = True
    ref = ray.put(lit) if ray.is_initialized() else lit
    nx, ny = np.int64(grid.nx), np.int64(grid.ny)

    def fn(batch: pa.Table) -> pa.Table:
        lm = ray.get(ref) if not isinstance(ref, np.ndarray) else ref
        c = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = c % nx, c // nx
        any_lit = np.zeros(len(c), dtype=bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                tx, ty = cx + dx, cy + dy
                ok = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
                idx = np.where(ok, ty * nx + tx, 0)
                any_lit |= ok & lm[idx]
        return pa.table({"cell_id": pa.array(c[~any_lit])})

    canvas = ray.data.range(grid.ncells, override_num_blocks=max(1, grid.ncells // 65536))
    out = canvas.map_batches(fn, batch_format="pyarrow")
    return out.sort("cell_id") if sort else out


def rollup_histogram(hist_ds, parent_res: int, sort: bool = True):
    """Roll a global-cell histogram up to a coarser resolution.

    Pure bit-shift parent derivation (M7 hierarchy) + re-aggregation — no
    re-scan of the points."""
    from ..geom.cells import parent_cells
    from ..util import grouped_aggregate

    def to_parent(b: pa.Table) -> pa.Table:
        p = parent_cells(b.column("cell_id").to_numpy(zero_copy_only=False), parent_res)
        return pa.table({"cell_id": pa.array(p), "n": b.column("n")})

    out = grouped_aggregate(
        hist_ds.map_batches(to_parent, batch_format="pyarrow"), "cell_id", {"n": ("n", "sum")}
    )
    return out.sort("cell_id") if sort else out


def aggregate_catalog(points_ds, catalog: dict, how: str = "hybrid", **kwargs):
    """Per-polygon aggregates for every layer of a catalog (the analogue of
    the reference's polygon-collection switching, ``DataHandler::
    setPolygonQuery``).  Returns {name: Dataset}; bundles are cached so
    repeated calls are cheap."""
    from .joins import aggregate_by_polygon

    return {name: aggregate_by_polygon(points_ds, layer, how=how, **kwargs) for name, layer in catalog.items()}


def cell_histogram_global(points_ds, res: int, x_col: str = "x", y_col: str = "y", sort: bool = True):
    """Counts per global hierarchical cell id at resolution ``res`` (M7/T5
    analogue — the engine's tile-assignment histogram)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ids = encode_cells(x, y, res)
        cells, counts = np.unique(ids, return_counts=True)
        return pa.table({"cell_id": cells, "n": counts.astype(np.int64)})

    from ..util import coalesce_small, grouped_aggregate

    out = grouped_aggregate(
        coalesce_small(points_ds.map_batches(partial, batch_format="pyarrow"), 0.5),
        "cell_id",
        {"n": ("n", "sum")},
    )
    return out.sort("cell_id") if sort else out


#: integer 3x3 stencils — integer weights keep the DuckDB oracle exact.
#: "gauss3" is the binomial (Gaussian-approximating) smoothing kernel;
#: "sum3" the uniform neighborhood sum (GIS "focal sum").
_FOCAL_KERNELS = {
    "gauss3": (1, 2, 1, 2, 4, 2, 1, 2, 1),
    "sum3": (1, 1, 1, 1, 1, 1, 1, 1, 1),
}


def focal_cell_smooth(points_ds, grid: Grid, kernel: str = "gauss3", num_partitions: int | None = None):
    """Focal (neighborhood) weighted sum over the per-cell count raster —
    GIS "focal statistics", the kernel-density-lite smoothing primitive the
    reference's dense canvas would express as a convolution pass (its canvas
    readback at ``RasterJoin/join/RasterJoin.cpp:51-78`` never smooths; this
    is the natural next step a heatmap consumer runs on it).

    Plan: :func:`cell_histogram_grid` collapses the point stream to
    canvas-sized (cell, n) rows; each cell then *scatters* ``n x w`` to its
    <=9 in-grid neighbors (row-local ~9x expansion of canvas-sized rows — a
    gather formulation would need neighbor lookups across partitions; the
    scatter needs only ONE hash exchange), and :func:`~rasterflow.util.
    grouped_aggregate` sums per target cell.  Integer stencil weights make
    the result exactly SQL-replicable.

    Output, sorted by cell id, one row per cell with nonzero focal mass:
    ``(cell_id, n, focal_n)`` — ``n`` is the cell's own count (0 for empty
    cells lit only by a neighbor), ``focal_n`` the weighted neighborhood
    sum."""
    from ..util import grouped_aggregate

    wgrid = _FOCAL_KERNELS[kernel]
    nx, ny = np.int64(grid.nx), np.int64(grid.ny)
    dxs = np.tile(np.array([-1, 0, 1], dtype=np.int64), 3)
    dys = np.repeat(np.array([-1, 0, 1], dtype=np.int64), 3)
    ws = np.array(wgrid, dtype=np.int64)

    hist = cell_histogram_grid(points_ds, grid, sort=False)

    def scatter(t: pa.Table) -> pa.Table:
        c = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = c % nx, c // nx
        tx = cx[:, None] + dxs[None, :]
        ty = cy[:, None] + dys[None, :]
        ok = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
        wn = n[:, None] * ws[None, :]
        own = np.where((dxs[None, :] == 0) & (dys[None, :] == 0), n[:, None], np.int64(0))
        tgt = (ty * nx + tx)[ok]
        return pa.table(
            {"cell_id": pa.array(tgt), "wn": pa.array(wn[ok]), "own": pa.array(own[ok])}
        )

    scattered = hist.map_batches(scatter, batch_format="pyarrow")
    out = grouped_aggregate(
        scattered,
        "cell_id",
        {"n": ("own", "sum"), "focal_n": ("wn", "sum")},
        num_partitions=num_partitions,
        weight=0.25,
    )
    return out.sort("cell_id")


def raster_gradient(points_ds, grid: Grid, num_partitions: int | None = None):
    """Sobel gradient over the per-cell count raster — edge detection on the
    heatmap (the GIS slope/aspect primitive, run on density instead of
    elevation).  Same scatter plan as :func:`focal_cell_smooth`: the point
    stream collapses to canvas-sized (cell, n) rows, each cell scatters
    ``n·wx, n·wy`` to its ≤9 in-grid neighbors, ONE hash exchange sums per
    target.  Integer stencil weights (wx = dx·(2-|dy|), wy = dy·(2-|dx|))
    keep the result exactly SQL-replicable; ``mag2 = gx² + gy²`` stays in
    int64.  Output per touched cell: ``(cell_id, n, gx, gy, mag2)``."""
    from ..util import grouped_aggregate

    nx, ny = np.int64(grid.nx), np.int64(grid.ny)
    dxs = np.tile(np.array([-1, 0, 1], dtype=np.int64), 3)
    dys = np.repeat(np.array([-1, 0, 1], dtype=np.int64), 3)
    wxs = dxs * (2 - np.abs(dys))
    wys = dys * (2 - np.abs(dxs))

    hist = cell_histogram_grid(points_ds, grid, sort=False)

    def scatter(t: pa.Table) -> pa.Table:
        c = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = c % nx, c // nx
        tx = cx[:, None] + dxs[None, :]
        ty = cy[:, None] + dys[None, :]
        ok = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
        own = np.where((dxs[None, :] == 0) & (dys[None, :] == 0), n[:, None], np.int64(0))
        return pa.table(
            {
                "cell_id": pa.array((ty * nx + tx)[ok]),
                "gx": pa.array((n[:, None] * wxs[None, :])[ok]),
                "gy": pa.array((n[:, None] * wys[None, :])[ok]),
                "own": pa.array(own[ok]),
            }
        )

    scattered = hist.map_batches(scatter, batch_format="pyarrow")
    red = grouped_aggregate(
        scattered,
        "cell_id",
        {"n": ("own", "sum"), "gx": ("gx", "sum"), "gy": ("gy", "sum")},
        num_partitions=num_partitions,
        weight=0.25,
    )

    def finalize(t: pa.Table) -> pa.Table:
        gx = t.column("gx").to_numpy(zero_copy_only=False)
        gy = t.column("gy").to_numpy(zero_copy_only=False)
        return t.append_column("mag2", pa.array(gx * gx + gy * gy))

    return red.map_batches(finalize, batch_format="pyarrow").sort("cell_id")


def hotspot_regions(points_ds, grid: Grid, min_count: int = 5, num_partitions: int | None = None):
    """Raster→vector extraction: threshold the per-cell count raster at
    ``min_count`` and vectorize the surviving cells into 4-connected regions
    (the classic GIS "raster polygonization" step, the inverse of
    ``geom/rasterize.py``'s vector→raster pass — reference analogue: the
    canvas readback at ``RasterJoin/join/RasterJoin.cpp:51-78`` stays a flat
    accumulator; the reference never vectorizes it).

    Plan: :func:`cell_histogram_grid` collapses the point stream to one row
    per touched cell (canvas-sized, NOT data-sized — materializing it is the
    same footprint the reference's dense canvas accepts).  Hot-cell adjacency
    is discovered with a neighbor-probe shuffle (each hot cell posts itself
    under its own id plus probes under its east/north neighbor ids; a
    partition-local match emits the edge — no driver set, no all-pairs), and
    components are resolved by the shared large/small-star CC
    (``dedup._cc_large_small_star``), region id = the component's minimum
    cell id.  Isolated hot cells become singleton regions via a tagged-union
    repair pass (CC only returns nodes that had edges).

    Output, sorted by region id: ``(region_id, n_cells, n_points, cx_min,
    cx_max, cy_min, cy_max)`` — the bbox in cell coordinates is the vector
    artifact (cell polygons are axis-aligned squares, so the bbox plus the
    member count fully describe extent and mass)."""
    import pandas as pd

    from .dedup import _cc_large_small_star
    from ..util import grouped_aggregate, shuffle_parts

    if num_partitions is None:
        num_partitions = shuffle_parts(0.25)
    nx = np.int64(grid.nx)

    hist = cell_histogram_grid(points_ds, grid, sort=False)

    def hot_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("n"), min_count))

    hot = hist.map_batches(hot_only, batch_format="pyarrow").materialize()
    if hot.count() == 0:
        import pandas as pd
        import ray.data

        # from_pandas keeps one 0-row block, so the schema survives
        # to_pandas (from_arrow on an empty table yields zero blocks)
        empty = pd.DataFrame(
            {
                c: np.array([], dtype=np.int64)
                for c in ("region_id", "n_cells", "n_points", "cx_min", "cx_max", "cy_min", "cy_max")
            }
        )
        return ray.data.from_pandas(empty)

    def probes(t: pa.Table) -> pa.Table:
        c = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        east = c[(c % nx) < nx - 1]
        north = c[(c // nx) < grid.ny - 1]
        key = np.concatenate([c, east + 1, north + nx])
        src = np.concatenate([c, east, north])
        pk = (key % num_partitions).astype(np.int32)
        return pa.table({"key": pa.array(key), "src": pa.array(src), "_pk": pa.array(pk)})

    def match_edges(g: pd.DataFrame) -> pd.DataFrame:
        selfs = set(g.loc[g["key"] == g["src"], "key"].tolist())
        probe = g[g["key"] != g["src"]]
        hit = probe[probe["key"].isin(selfs)]
        # probe src is always < key (east/north), so (id_a, id_b) is ordered
        return pd.DataFrame({"id_a": hit["src"].to_numpy(), "id_b": hit["key"].to_numpy()})

    edges = (
        hot.map_batches(probes, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(match_edges, batch_format="pandas")
    )
    labels = _cc_large_small_star(edges, "cell_id")

    # tagged union: hot rows carry (n, rep=-1), CC rows carry (n=0, rep);
    # per cell the region label is the CC rep when present, else the cell
    # itself (singleton).  One narrow shuffle over cell-level rows.
    def tag_hot(t: pa.Table) -> pa.Table:
        c = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cell_id": pa.array(c),
                "n": t.column("n"),
                "rep": pa.array(np.full(len(c), -1, dtype=np.int64)),
                "_pk": pa.array((c % num_partitions).astype(np.int32)),
            }
        )

    def tag_cc(t: pa.Table) -> pa.Table:
        c = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "cell_id": pa.array(c),
                "n": pa.array(np.zeros(len(c), dtype=np.int64)),
                "rep": t.column("rep_id"),
                "_pk": pa.array((c % num_partitions).astype(np.int32)),
            }
        )

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("cell_id", sort=False).agg(n=("n", "sum"), rep=("rep", "max")).reset_index()
        cells = agg["cell_id"].to_numpy()
        rep = np.where(agg["rep"].to_numpy() >= 0, agg["rep"].to_numpy(), cells)
        return pd.DataFrame(
            {
                "region_id": rep,
                "n": agg["n"].to_numpy(),
                "cx": cells % nx,
                "cy": cells // nx,
            }
        )

    resolved = (
        hot.map_batches(tag_hot, batch_format="pyarrow")
        .union(labels.map_batches(tag_cc, batch_format="pyarrow"))
        .groupby("_pk")
        .map_groups(resolve, batch_format="pandas")
    )
    out = grouped_aggregate(
        resolved,
        "region_id",
        {
            "n_cells": ("cx", "count"),
            "n_points": ("n", "sum"),
            "cx_min": ("cx", "min"),
            "cx_max": ("cx", "max"),
            "cy_min": ("cy", "min"),
            "cy_max": ("cy", "max"),
        },
        weight=0.25,
    )
    return out.sort("region_id")


def focal_majority(
    points_ds,
    grid: Grid,
    group_col: str = "lang",
    groups: tuple[str, ...] = ("de", "en", "es", "fr", "zh"),
    num_partitions: int | None = None,
    sort: bool = True,
):
    """Categorical focal MAJORITY filter: for each cell, the modal category
    over its 3×3 neighborhood (ties to the lexicographically first group) —
    the GIS majority/mode filter that denoises a categorical raster, here
    "which language dominates each area".

    Same scatter plan as :func:`focal_cell_smooth`, carried per category:
    the point stream collapses to (cell, group) counts, each row scatters to
    its ≤9 in-grid neighbors, one exchange sums per (cell, group), and a
    per-cell vectorized argmax picks the winner.  All integers + a fixed
    group order — hash-exact.  Returns ``(cell_id, lang, n_maj)``.
    """
    import pandas as pd

    from ..util import _hash_cols, coalesce_small, grouped_aggregate, shuffle_parts

    if num_partitions is None:
        num_partitions = shuffle_parts(0.5)
    gidx = {g: i for i, g in enumerate(groups)}
    nx, ny = np.int64(grid.nx), np.int64(grid.ny)
    dxs = np.tile(np.array([-1, 0, 1], dtype=np.int64), 3)
    dys = np.repeat(np.array([-1, 0, 1], dtype=np.int64), 3)
    empty = pa.schema([("cell_id", pa.int64()), ("gi", pa.int64()), ("n", pa.int64())])

    def partial(batch: pa.Table) -> pa.Table:
        lin, valid = grid.locate_linear(
            batch.column("x").to_numpy(zero_copy_only=False),
            batch.column("y").to_numpy(zero_copy_only=False),
        )
        g = batch.column(group_col).to_pandas().map(gidx)
        m = valid & g.notna().to_numpy()
        if not m.any():
            return empty.empty_table()
        df = pd.DataFrame({"cell_id": lin[m], "gi": g.to_numpy()[m].astype(np.int64)})
        out = df.groupby(["cell_id", "gi"], as_index=False, sort=False).size()
        return pa.Table.from_pandas(out.rename(columns={"size": "n"}), preserve_index=False)

    counts = grouped_aggregate(
        coalesce_small(points_ds.map_batches(partial, batch_format="pyarrow"), 0.25),
        ["cell_id", "gi"],
        {"n": ("n", "sum")},
    )

    def scatter(t: pa.Table) -> pa.Table:
        c = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        gi = t.column("gi").to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = c % nx, c // nx
        tx = cx[:, None] + dxs[None, :]
        ty = cy[:, None] + dys[None, :]
        ok = (tx >= 0) & (tx < nx) & (ty >= 0) & (ty < ny)
        tgt = (ty * nx + tx)[ok]
        gii = np.broadcast_to(gi[:, None], ok.shape)[ok]
        nn = np.broadcast_to(n[:, None], ok.shape)[ok]
        return pa.table({"cell_id": pa.array(tgt), "gi": pa.array(gii), "n": pa.array(nn)})

    nb = grouped_aggregate(
        counts.map_batches(scatter, batch_format="pyarrow"),
        ["cell_id", "gi"],
        {"n": ("n", "sum")},
        num_partitions=num_partitions,
        weight=0.25,
    )

    def addpk(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"cell_id": t.column("cell_id").to_numpy(zero_copy_only=False)})
        pk = (_hash_cols(df, ["cell_id"]) % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("_pk", pa.array(pk))

    garr = np.asarray(groups)

    def majority(gdf: pd.DataFrame) -> pd.DataFrame:
        agg = gdf.groupby(["cell_id", "gi"], as_index=False)["n"].sum()
        # winner per cell: max n, tie -> lowest gi (groups are sorted, so
        # lexicographically first)
        agg = agg.sort_values(["n", "gi"], ascending=[False, True], kind="stable")
        win = agg.groupby("cell_id", sort=False).head(1)
        return pd.DataFrame(
            {
                "cell_id": win["cell_id"].to_numpy(),
                group_col: garr[win["gi"].to_numpy()],
                "n_maj": win["n"].to_numpy(),
            }
        )

    out = (
        nb.map_batches(addpk, batch_format="pyarrow")
        .groupby("_pk")
        .map_groups(majority, batch_format="pandas")
    )
    return out.sort("cell_id") if sort else out
