"""Attribute predicate filters + spatio-temporal range selection (M4/M5).

The reference evaluates a conjunction of ≤10 typed constraints
``attr {EQ,LT,LTE,GT,GTE} value`` per point before aggregation
(``shaders/points.vert:87-160``, constraint setup ``RasterJoin/main.cpp:82-118``)
and selects time ranges at coarse index granularity
(``db/DataHandler.cpp:86-96``).  Here both are vectorized Arrow masks inside
``map_batches`` — and, when reading Parquet, the same predicates should also be
passed to ``read_parquet(filter=...)`` for row-group pushdown.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_OPS = {
    "EQ": pc.equal,
    "LT": pc.less,
    "LTE": pc.less_equal,
    "GT": pc.greater,
    "GTE": pc.greater_equal,
}


def constraint_mask(batch: pa.Table, constraints) -> pa.Array:
    """Conjunction of (col, op, value) constraints -> boolean mask."""
    mask = None
    for col, op, val in constraints:
        m = _OPS[op.upper()](batch.column(col), pa.scalar(val))
        mask = m if mask is None else pc.and_(mask, m)
    return mask if mask is not None else pa.array([True] * len(batch))


def apply_constraints(ds, constraints):
    """Dataset filter by a constraint conjunction (vectorized tasks)."""
    if not constraints:
        return ds
    cons = list(constraints)

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(constraint_mask(batch, cons))

    return ds.map_batches(f, batch_format="pyarrow")


def time_range_filter(ds, t_col: str, start: int, end: int, coarse_bucket: int | None = None):
    """Exact [start, end) time selection; with ``coarse_bucket`` set, widens to
    bucket-aligned boundaries first — the reference's cell-granular semantics
    (10-day buckets, ``BackendIndex/main.cpp:64-65``; SURVEY.md §2.7.1)."""
    if coarse_bucket:
        start = (start // coarse_bucket) * coarse_bucket
        end = ((end + coarse_bucket - 1) // coarse_bucket) * coarse_bucket

    def f(batch: pa.Table) -> pa.Table:
        c = batch.column(t_col)
        return batch.filter(pc.and_(pc.greater_equal(c, pa.scalar(start)), pc.less(c, pa.scalar(end))))

    return ds.map_batches(f, batch_format="pyarrow")
