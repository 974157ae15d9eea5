"""Ingest layout + spatio-temporal selection (S4/S5/M5/M6 analogues).

The reference's backend index re-stores records column-wise in hash-grid
partitions (``HashGridIndex::buildIndex``, ``db/HashGridIndex.cpp:48-70``;
one payload+mapping file pair per attribute).  On Ray/Parquet the columnar
store is Parquet itself; the hash-grid partitioning becomes a *layout*:

- :func:`ingest_points` — pages -> narrow point table with a hierarchical
  ``cell_id`` column, written as Parquet partitioned by the coarse parent
  cell (``pcell``) — the partition-pruning key for later scans.
- :func:`read_points` — read the layout back with cell/time predicate
  pushdown (``filter=``), the M5 coarse 3-D range selection: only matching
  partitions/row-groups leave storage.
- :func:`count_in_box` — the M6 full-scan counting check
  (``DataHandler::executeQueryFullScan``, ``db/DataHandler.cpp:98-124``),
  used as a test oracle for the pruned read.
- :func:`radius_search` — grid-pruned distance lookup around a query point
  (the J6 primitive, ``GridIndexF::getRegionPt``,
  ``CPUJoin/GridIndexF.cpp:177-198``): scan only the cell neighborhood that
  can contain matches, then exact distance filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom.cells import decode_cells, encode_cells
from ..stages.extract import extract_text
from ..stages.geocode import PreparePoints


def ingest_points(
    pages_ds,
    out_dir: str,
    cell_res: int = 20,
    partition_res: int = 6,
    geocoder: str = "text",
):
    """pages -> points parquet partitioned by coarse cell (S4 analogue).

    ``cell_res`` is the stored fine cell id; ``partition_res`` the directory
    partitioning key (coarse parent, derivable by bit-shift).  Wide columns
    (html/text) are dropped before anything is written.
    """
    ds = pages_ds.map_batches(extract_text, batch_format="pyarrow")
    pts = ds.map_batches(
        PreparePoints(geocoder=geocoder, text_col="text2", cell_res=cell_res),
        batch_format="pyarrow",
    )

    def add_pcell(b: pa.Table) -> pa.Table:
        from ..geom.cells import parent_cells

        p = parent_cells(b.column("cell_id").to_numpy(zero_copy_only=False), partition_res)
        b = b.append_column("pcell", pa.array(p))
        # directory partitioning uses a string copy: partition_cols strips the
        # column from the files, but predicate pushdown needs `pcell` in the
        # file schema (row-group stats) — keep both
        return b.append_column("part", pa.array(p).cast(pa.string()))

    pts = pts.map_batches(add_pcell, batch_format="pyarrow")
    pts.write_parquet(out_dir, partition_cols=["part"])
    return out_dir


def _box_cells(res: int, x0: float, y0: float, x1: float, y1: float) -> np.ndarray:
    """All cell ids at ``res`` intersecting the (centered-coords) box."""
    ids = encode_cells(np.array([x0, x1]), np.array([y0, y1]), res)
    _, ix, iy = decode_cells(ids)
    xs = np.arange(ix.min(), ix.max() + 1, dtype=np.int64)
    ys = np.arange(iy.min(), iy.max() + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return (np.int64(res) << 58) | (gx.ravel() << 29) | gy.ravel()


def read_points(
    layout_dir: str,
    box: tuple[float, float, float, float] | None = None,
    t_range: tuple[int, int] | None = None,
    partition_res: int = 6,
    columns: list[str] | None = None,
):
    """Read the ingest layout with coarse cell + time predicate pushdown.

    Coarse semantics mirror the reference's index query (whole partitions are
    selected, SURVEY §2.7.1); chain an exact ``filter`` stage downstream when
    exact box semantics are required.
    """
    import ray.data

    flt = None
    if box is not None:
        cells = _box_cells(partition_res, *box)
        flt = pc.field("pcell").isin(pa.array(cells))
    if t_range is not None:
        tf = (pc.field("t") >= t_range[0]) & (pc.field("t") < t_range[1])
        flt = tf if flt is None else (flt & tf)
    kwargs = {}
    if columns is not None:
        kwargs["columns"] = columns
    return ray.data.read_parquet(layout_dir, filter=flt, **kwargs)


def count_in_box(
    points_ds, x0: float, y0: float, x1: float, y1: float, t_range: tuple[int, int] | None = None
) -> int:
    """M6 full-scan exact count inside a 3-D box (test oracle)."""

    def f(b: pa.Table) -> pa.Table:
        m = (
            pc.and_(
                pc.and_(pc.greater_equal(b.column("x"), pa.scalar(x0)), pc.less_equal(b.column("x"), pa.scalar(x1))),
                pc.and_(pc.greater_equal(b.column("y"), pa.scalar(y0)), pc.less_equal(b.column("y"), pa.scalar(y1))),
            )
        )
        if t_range is not None:
            m = pc.and_(
                m,
                pc.and_(
                    pc.greater_equal(b.column("t"), pa.scalar(t_range[0])),
                    pc.less(b.column("t"), pa.scalar(t_range[1])),
                ),
            )
        return b.filter(m)

    return points_ds.map_batches(f, batch_format="pyarrow").count()


def radius_search(
    points_ds,
    qx: float,
    qy: float,
    radius: float,
    id_col: str = "url",
    ry: float | None = None,
):
    """Points within an (optionally elliptical) radius of a query point.

    Vectorized per-batch: cheap bbox reject, then the exact elliptical
    distance test of ``GridIndexF::isWithinDist`` (dx²/rx² + dy²/ry² < 1).
    Returns a Dataset of (id, x, y, dist).
    """
    rx = float(radius)
    ry = float(ry if ry is not None else radius)

    def f(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        y = b.column("y").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        near = (np.abs(x - qx) <= rx) & (np.abs(y - qy) <= ry)
        dx = (x[near] - qx) / rx
        dy = (y[near] - qy) / ry
        inside = dx * dx + dy * dy < 1.0
        idx = np.flatnonzero(near)[inside]
        d = np.sqrt(
            (x[idx] - qx) * (x[idx] - qx) + (y[idx] - qy) * (y[idx] - qy)
        )
        return pa.table(
            {
                id_col: b.column(id_col).take(pa.array(idx)),
                "x": pa.array(x[idx]),
                "y": pa.array(y[idx]),
                "dist": pa.array(d),
            }
        )

    return points_ds.map_batches(f, batch_format="pyarrow")
