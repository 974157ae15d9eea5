"""Per-stage metrics from ``ds.stats()`` (S8 analogue).

The reference appends a tab-separated timing line per run
(``GLHandler::printTimeStats``, ``join/GLHandler.cpp:214-248``; schema in
``experiments/plot-scripts/result_parser.py:5-6``).  Here the per-stage
breakdown comes from Ray Data's own stats; this parser turns the text block
into a JSON-able list for bench output and lineage manifests.
"""

from __future__ import annotations

import re

_OP_RE = re.compile(
    r"^Operator (\d+) (.+?): (?:(\d+) tasks executed, (\d+) blocks produced in ([\d.]+)s|executed in ([\d.]+)s)"
)
_UDF_RE = re.compile(r"UDF time:.*?, ([\d.]+(?:us|ms|s|m)) total")


def _to_seconds(v: str) -> float:
    if v.endswith("us"):
        return float(v[:-2]) / 1e6
    if v.endswith("ms"):
        return float(v[:-2]) / 1e3
    if v.endswith("m"):
        return float(v[:-1]) * 60.0
    return float(v[:-1])


def stage_metrics(ds_or_stats) -> list[dict]:
    """Dataset (post-execution) or stats text -> per-operator metrics."""
    text = ds_or_stats if isinstance(ds_or_stats, str) else ds_or_stats.stats()
    out: list[dict] = []
    cur: dict | None = None
    for line in text.splitlines():
        line = line.strip()
        m = _OP_RE.match(line)
        if m:
            cur = {
                "operator": m.group(2),
                "wall_s": float(m.group(5) or m.group(6)),
            }
            if m.group(3):
                cur["tasks"] = int(m.group(3))
                cur["blocks"] = int(m.group(4))
            out.append(cur)
            continue
        if cur is not None and "UDF time" in line:
            u = _UDF_RE.search(line)
            if u and "udf_total_s" not in cur:
                cur["udf_total_s"] = round(_to_seconds(u.group(1)), 4)
    return out
