"""Conformance CSV writers (S6/S7): the reference's aggregate output files.

Formats from ``RasterJoin/main.cpp:178-225``:

- ``raster_<endTime>_<accuracy>.csv``: ``polyId\\tvalue`` per line, value =
  count (int) or fixed-point-decoded avg; every polygon 0..top-1 appears,
  zeros included.
- ``err_bound_<endTime>_<accuracy>.csv``:
  ``polyId\\tlb_guar\\tub_guar\\tlb_est\\tub_est``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def _dense(df: pd.DataFrame, npolys: int, col: str) -> np.ndarray:
    out = np.zeros(npolys, dtype=np.float64)
    out[df["poly_id"].to_numpy()] = df[col].to_numpy()
    return out


def write_agg_csv(
    df: pd.DataFrame,
    out_dir: str | Path,
    npolys: int,
    end_time: int,
    accuracy: int,
    avg: bool = False,
) -> Path:
    """Write the S6 aggregate CSV; returns the file path."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"raster_{end_time}_{accuracy}.csv"
    col = "avg" if avg else "count"
    vals = _dense(df, npolys, col)
    with path.open("w") as fh:
        for i in range(npolys):
            if avg:
                fh.write(f"{i}\t{vals[i]:.10g}\n")
            else:
                fh.write(f"{i}\t{int(vals[i])}\n")
    return path


def write_bounds_csv(
    df: pd.DataFrame, out_dir: str | Path, npolys: int, end_time: int, accuracy: int
) -> Path:
    """Write the S7 error-bounds CSV (``outputErrorBounds`` format)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"err_bound_{end_time}_{accuracy}.csv"
    cols = {c: _dense(df, npolys, c) for c in ("lb_guar", "ub_guar", "lb_est", "ub_est")}
    with path.open("w") as fh:
        for i in range(npolys):
            fh.write(
                f"{i}\t{int(cols['lb_guar'][i])}\t{int(cols['ub_guar'][i])}"
                f"\t{cols['lb_est'][i]:.10g}\t{cols['ub_est'][i]:.10g}\n"
            )
    return path


def read_agg_csv(path: str | Path) -> pd.DataFrame:
    return pd.read_csv(path, sep="\t", names=["poly_id", "value"])
