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
