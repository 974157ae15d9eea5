"""Shared pipeline utilities."""

from __future__ import annotations


def coalesce_small(ds, n: int = 8):
    """Coalesce a known-small partials stream into ``n`` blocks before an
    all-to-all (groupby/sort).

    Ray's sort-based shuffle degrades badly when fed hundreds of tiny blocks
    (observed: 109 s for an 8000-row groupby over 64 blocks at 32 CPUs vs
    7 s after coalescing).  Partial-aggregate stages emit ≤(keys × batches)
    rows, so the repartition moves almost nothing and the downstream shuffle
    schedules ``n`` tasks instead of blocks × partitions.
    """
    return ds.repartition(n)
