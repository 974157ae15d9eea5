"""Geocoding + point-preparation stages (stateless vectorized map_batches).

Turns the wide pages table into the narrow point table the joins consume,
mirroring the reference's ingest path (projection + bbox drop + time
narrowing, ``Dataset.cpp:13-37`` / ``TaxiRecord.hpp:121-153``) and dropping
``html``/``text`` immediately so shuffles only ever move narrow columns
(SURVEY.md §7.5).

Two deterministic geocoders:

- :func:`geocode_from_text` — parse the ``geo <lat> <lon>`` tokens the
  fixture embeds in the extracted text (RE2 ``extract_regex``; pure).
- :func:`geocode_from_url` — integer-hash geocode of the row id parsed from
  the url tail (same arithmetic as the fixture generator, so both agree).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom.cells import encode_cells
from ..geom.projection import project_points
from ..sources.fixtures import geo_from_id


def geocode_from_text(text: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    ex = pc.extract_regex(pc.cast(text, pa.large_string()), r" geo (?P<lat>-?\d+\.\d+) (?P<lon>-?\d+\.\d+) ")
    lat = pc.cast(pc.struct_field(ex, "lat"), pa.float64()).to_numpy(zero_copy_only=False)
    lon = pc.cast(pc.struct_field(ex, "lon"), pa.float64()).to_numpy(zero_copy_only=False)
    return lat, lon


def geocode_from_url(url: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    ex = pc.extract_regex(pc.cast(url, pa.large_string()), r"/(?P<id>\d+)$")
    ids = pc.cast(pc.struct_field(ex, "id"), pa.int64()).to_numpy(zero_copy_only=False)
    return geo_from_id(ids)


class PreparePoints:
    """pages batch -> point batch ``(url, x, y, t, lang [, attrs...])``.

    ``x, y`` are centered world coords (float32 by default — the reference's
    storage width, ``TaxiRecord.hpp:121-133``); rows outside the US bbox are
    dropped; ``t`` is uint32 epoch seconds (``Record.hpp:14-18``).  Optionally
    also emits a global hierarchical ``cell_id`` at ``cell_res``.
    """

    def __init__(
        self,
        geocoder: str = "text",
        dtype=np.float32,
        cell_res: int | None = None,
        keep_cols: tuple[str, ...] = ("lang",),
        text_col: str = "text",
    ):
        self.geocoder = geocoder
        self.dtype = dtype
        self.cell_res = cell_res
        self.keep_cols = keep_cols
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.geocoder == "text":
            lat, lon = geocode_from_text(batch.column(self.text_col))
        elif self.geocoder == "url":
            lat, lon = geocode_from_url(batch.column("url"))
        else:
            raise ValueError(f"unknown geocoder {self.geocoder!r}")
        x, y, ok = project_points(lat, lon, dtype=self.dtype)
        ts = batch.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = (ts // 1_000_000).astype(np.uint32)

        cols: dict[str, object] = {
            "url": batch.column("url"),
            "x": pa.array(x),
            "y": pa.array(y),
            "t": pa.array(t),
        }
        for c in self.keep_cols:
            if c in batch.column_names:
                cols[c] = batch.column(c)
        if self.cell_res is not None:
            cols["cell_id"] = pa.array(encode_cells(x.astype(np.float64), y.astype(np.float64), self.cell_res))
        out = pa.table(cols)
        if not np.all(ok):
            out = out.filter(pa.array(ok))
        return out


def prepare_points(ds, **kwargs):
    """Dataset[pages] -> Dataset[points] (stateless vectorized tasks)."""
    return ds.map_batches(PreparePoints(**kwargs), batch_format="pyarrow")
