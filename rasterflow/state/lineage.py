"""Per-partition lineage manifests + resumable pipeline runs.

The reference's only persistence is the one-shot backend index and a
disk-cached polygon grid (``CPUJoin.cpp:24-27``, ``GridIndexF.cpp:200-275``);
a crashed query is simply re-run.  At 100 TB that is not acceptable — the
north rule requires checkpoint resume with per-partition lineage + metrics.

Model: a run is a list of **partitions**, each a pure function of an input
spec (typically a list of parquet fragments or an id range).  For each
partition the runner:

1. skips it if a verified manifest entry exists (output files present with
   the recorded sizes),
2. otherwise builds the partition's Dataset, writes it to a temp dir, renames
   it into place atomically, and appends a manifest line
   ``{partition_id, inputs, rows, bytes, files, wall_s, finished_at}``.

The manifest is JSONL — append-only, crash-safe (a torn last line is
detected and ignored), and doubles as the run's metrics log.  Partition ids
must be deterministic functions of the input split so a resumed run derives
the identical partition list (SURVEY.md §7.5.7).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path
from typing import Any, Callable

MANIFEST = "_manifest.jsonl"


def read_manifest(out_dir: str | Path) -> dict[str, dict]:
    """partition_id -> manifest entry (last write wins; torn lines skipped)."""
    path = Path(out_dir) / MANIFEST
    entries: dict[str, dict] = {}
    if not path.exists():
        return entries
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue  # torn tail line from a crash
        entries[e["partition_id"]] = e
    return entries


def _partition_ok(out_dir: Path, entry: dict) -> bool:
    pdir = out_dir / f"part-{entry['partition_id']}"
    if not pdir.is_dir():
        return False
    try:
        sizes = {f.name: f.stat().st_size for f in pdir.iterdir() if f.is_file()}
    except OSError:
        return False
    return sizes == {f["name"]: f["size"] for f in entry.get("files", [])}


def run_resumable(
    partitions: list[tuple[str, Any]],
    build_fn: Callable[[Any], "Any"],
    out_dir: str | Path,
) -> dict:
    """Run (or resume) a partitioned pipeline.

    ``partitions``: [(partition_id, input_spec), ...] — ids must be
    deterministic. ``build_fn(input_spec) -> ray.data.Dataset`` (lazy).
    Returns {"ran": [...], "skipped": [...], "rows": total}.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    manifest_path = out / MANIFEST
    done = read_manifest(out)
    ran, skipped = [], []
    total_rows = 0
    for pid, spec in partitions:
        entry = done.get(pid)
        # the recorded inputs must match the current spec: partition ids are
        # positional, so adding/removing input files shifts the grouping and
        # a stale output built from different files must be rebuilt, not
        # silently reused (ADVICE r1)
        spec_rec = _spec_record(spec)
        if entry is not None and entry.get("inputs") == spec_rec and _partition_ok(out, entry):
            skipped.append(pid)
            total_rows += entry["rows"]
            continue
        t0 = time.perf_counter()
        ds = build_fn(spec)
        tmp = out / f".tmp-{pid}"
        final = out / f"part-{pid}"
        if tmp.exists():
            shutil.rmtree(tmp)
        if final.exists():
            shutil.rmtree(final)  # stale partial output without manifest entry
        ds.write_parquet(str(tmp))
        files = sorted(
            ({"name": f.name, "size": f.stat().st_size} for f in tmp.iterdir() if f.is_file()),
            key=lambda d: d["name"],
        )
        rows = sum(_parquet_rows(tmp / f["name"]) for f in files)
        os.replace(tmp, final)
        rec = {
            "partition_id": pid,
            "inputs": spec_rec,
            "rows": rows,
            "bytes": sum(f["size"] for f in files),
            "files": files,
            "wall_s": round(time.perf_counter() - t0, 3),
            "finished_at": time.time(),
        }
        with manifest_path.open("a") as fh:
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        ran.append(pid)
        total_rows += rows
    return {"ran": ran, "skipped": skipped, "rows": total_rows}


def _parquet_rows(path: Path) -> int:
    import pyarrow.parquet as pq

    try:
        return pq.ParquetFile(path).metadata.num_rows
    except Exception:  # noqa: BLE001 - non-parquet sidecar files count zero
        return 0


def _jsonable(x) -> bool:
    try:
        json.dumps(x)
        return True
    except (TypeError, ValueError):
        return False


def _spec_record(spec):
    """Canonical JSON-roundtripped form of an input spec, so the recorded
    manifest value compares equal to the in-memory spec (tuples -> lists)."""
    if not _jsonable(spec):
        return str(spec)
    return json.loads(json.dumps(spec))


def partition_files(paths: list[str], group_size: int) -> list[tuple[str, list[str]]]:
    """Deterministic partition list from an input file list: sorted, grouped,
    id = index into the grouping — a resumed run with the same inputs derives
    identical ids."""
    paths = sorted(paths)
    out = []
    for i in range(0, len(paths), group_size):
        out.append((f"{i // group_size:05d}", paths[i : i + group_size]))
    return out
