"""Streaming micro-batch ingestion over the lineage manifest (round 3).

The reference has no streaming shapes at all (SURVEY.md §1.4) — this is
engine-hardening for the 100 TB posture: a web crawl delivers parquet files
continuously, and re-running a monolithic ingest per delivery is O(corpus)
instead of O(delta).

Model: an append-only **micro-batch log** on top of
:mod:`rasterflow.state.lineage`.  Each append call discovers the input files
not yet recorded in the manifest, groups them into new partitions whose ids
are **content-addressed** (a hash of the group's file list — unlike the
positional ids of :func:`lineage.partition_files`, appending files can never
re-key or invalidate an existing partition), and runs only those through
``run_resumable``.  Committed partitions are immutable; readers derive the
full Dataset from the manifest, and derived state (a kNN shard index, a
cell-partitioned layout's statistics) refreshes by comparing
:func:`manifest_version` — appends change the version, no-ops don't.

Scale posture: an append touches only the delta (the manifest scan is
O(#partitions), the build is O(new files)); the output stays partitioned
parquet, so a failed append resumes exactly like any lineage run.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Any, Callable

from .lineage import read_manifest, run_resumable


def _group_id(files: list[str]) -> str:
    h = hashlib.sha256("\n".join(os.path.basename(f) for f in files).encode()).hexdigest()
    return f"mb-{h[:12]}"


def recorded_inputs(out_dir: str | Path) -> set[str]:
    """All input files already committed to the micro-batch log."""
    seen: set[str] = set()
    for e in read_manifest(out_dir).values():
        ins = e.get("inputs")
        if isinstance(ins, list):
            seen.update(str(f) for f in ins)
    return seen


def manifest_version(out_dir: str | Path) -> str:
    """Stable fingerprint of the committed partition set — derived caches
    (indexes, statistics) compare this to decide whether to refresh."""
    done = read_manifest(out_dir)
    parts = sorted((pid, e.get("rows", 0)) for pid, e in done.items())
    return hashlib.sha256(repr(parts).encode()).hexdigest()[:16]


def append_micro_batch(
    out_dir: str | Path,
    files: list[str],
    build_fn: Callable[[list[str]], Any],
    group_size: int = 64,
) -> dict:
    """Append new input files as micro-batch partitions; already-committed
    files are untouched (O(delta) work per delivery).

    ``build_fn(files) -> lazy ray.data.Dataset`` — same contract as
    ``run_resumable``.  Returns the run report plus ``new_files`` and the
    post-append ``version``."""
    seen = recorded_inputs(out_dir)
    new = sorted(str(f) for f in files if str(f) not in seen)
    parts = [
        (_group_id(new[i : i + group_size]), new[i : i + group_size])
        for i in range(0, len(new), group_size)
    ]
    res = run_resumable(parts, build_fn, out_dir)
    res["new_files"] = len(new)
    res["version"] = manifest_version(out_dir)
    return res


def read_log(out_dir: str | Path, columns: list[str] | None = None, filter=None):
    """One Dataset over every committed micro-batch partition (manifest-
    verified files only — an in-flight append's temp dir is never read)."""
    import ray.data

    out = Path(out_dir)
    done = read_manifest(out)
    files = [
        str(out / f"part-{pid}" / f["name"])
        for pid, e in sorted(done.items())
        for f in e.get("files", [])
        if f["name"].endswith(".parquet")
    ]
    if not files:
        import pyarrow as pa

        return ray.data.from_arrow(pa.table({}))
    kwargs: dict = {}
    if columns is not None:
        kwargs["columns"] = columns
    if filter is not None:
        kwargs["filter"] = filter
    return ray.data.read_parquet(files, **kwargs)
