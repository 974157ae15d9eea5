"""Web-Mercator "world coordinate" projection, continental-US centered.

Reimplements the reference's coordinate plane from scratch (semantics from
``RasterJoin/common/Utils.h:9-27`` and
``RasterJoin/common/UsefulFuncs.cpp:578-632``): lat/lon is projected once, at
ingest, into Web-Mercator at fixed zoom 22, then centered on the continental-US
bounding box. Points outside the bbox are dropped. The reference narrows the
projected float64 coordinates to float32 when storing records
(``RasterJoin/db/TaxiRecord.hpp:121-133``); we expose both planes:

- engine plane  : float64 (default, used by the Ray pipelines)
- conformance plane: float32 (bit-matches the reference's stored coordinates)

All functions are vectorized numpy, suitable for zero-copy Arrow batches.
"""

from __future__ import annotations

import math

import numpy as np

WORLD_ZOOM_LEVEL = 22.0
_SCALE = 2.0**WORLD_ZOOM_LEVEL  # world units per base-tile unit
WORLD_SIZE = 256.0 * _SCALE  # world units across the globe (= 2**30)

# Continental-US bounding box (UsefulFuncs.cpp:578-597).
MIN_LAT = 24.396308
MIN_LON = -124.848974
MAX_LAT = 49.384358
MAX_LON = -66.885444

CENTER_LAT = (MIN_LAT + MAX_LAT) / 2.0
CENTER_LON = (MIN_LON + MAX_LON) / 2.0


def geo2world(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """lat/lon (deg, float64) -> absolute world coords at zoom 22.

    Note the y axis is *inverted* (north = smaller y), matching Utils.h:9-18.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    y = np.empty_like(lat)
    np.copyto(y, (np.pi - np.arctanh(np.sin(np.radians(lat)))) / np.pi * 128.0)
    y = np.where(lat == 90.0, 256.0, y)
    y = np.where(lat == -90.0, 0.0, y)
    x = (lon + 180.0) / 360.0 * 256.0
    return x * _SCALE, y * _SCALE


def world2geo(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`geo2world` (Utils.h:20-23)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - y / _SCALE / 128.0))))
    lon = x * 360.0 / _SCALE / 256.0 - 180.0
    return lat, lon


# Absolute world coordinates of the US-bbox center — the origin of the
# centered plane every stored point/polygon lives in.
WORLD_CENTER_X, WORLD_CENTER_Y = (float(v) for v in geo2world(CENTER_LAT, CENTER_LON))


def ground_resolution() -> float:
    """Meters per world unit at the bbox center (Utils.h:25-27)."""
    return math.cos(math.radians(CENTER_LAT)) * 6378137.0 * 2.0 * math.pi / 2.0 ** (8 + WORLD_ZOOM_LEVEL)


GROUND_RESOLUTION = ground_resolution()


def in_us_bbox(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Boolean mask of coordinates inside the (closed) US bbox."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    return (lat >= MIN_LAT) & (lat <= MAX_LAT) & (lon >= MIN_LON) & (lon <= MAX_LON)


def project_points(
    lat: np.ndarray, lon: np.ndarray, dtype=np.float64
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Project lat/lon to centered world coords; returns (x, y, ok).

    ``ok`` is False for rows outside the US bbox (which the reference drops at
    index-build time, ``Dataset.cpp:23-32``). Pass ``dtype=np.float32`` for the
    conformance plane.
    """
    ok = in_us_bbox(lat, lon)
    wx, wy = geo2world(lat, lon)
    x = (wx - WORLD_CENTER_X).astype(dtype)
    y = (wy - WORLD_CENTER_Y).astype(dtype)
    return x, y, ok


def unproject_points(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Centered world coords -> lat/lon (UsefulFuncs.cpp:599-610)."""
    return world2geo(np.asarray(x, np.float64) + WORLD_CENTER_X, np.asarray(y, np.float64) + WORLD_CENTER_Y)


def accuracy_to_cell_size(accuracy_m: float) -> float:
    """ε meters -> raster cell size in world units.

    cellSize = (ε/√2) / groundRes — the raster join's bounded-error contract
    (cell diagonal = ε), from ``RasterJoin/join/GLFunction.cpp:26-30``.
    """
    return (accuracy_m / math.sqrt(2.0)) / GROUND_RESOLUTION
