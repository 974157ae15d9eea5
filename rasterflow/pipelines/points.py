"""Oracle-plane point derivation: driver testdata tables -> spatial points.

The driver's correctness gate compares Ray pipelines against DuckDB SQL over
the same parquet tables (``__ray_entry__.py``).  SQL cannot reproduce the
engine's Web-Mercator trig bit-for-bit, so the oracle-facing spatial queries
run in the raw **lat/lon plane**: points are geocoded from ``doc_id`` with the
same pure integer-hash arithmetic as the pages fixture
(:mod:`rasterflow.sources.fixtures`), polygons are defined in lat/lon, and the
PIP/knn/cell arithmetic uses identical float64 expression shapes on both sides
so results hash-match.  The Mercator plane is exercised by the in-repo pytest
oracles instead (tests/test_joins.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.polyio import PolygonLayer, rect_layer
from ..sources.fixtures import CLUSTER_HALF, CLUSTER_LAT, CLUSTER_LON, geo_from_id


def add_geo(batch: pa.Table) -> pa.Table:
    """documents batch -> + (x=lon, y=lat) columns from doc_id hash."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    lat, lon = geo_from_id(ids)
    return batch.append_column("x", pa.array(lon)).append_column("y", pa.array(lat))


def documents_points(sf_dir: str, columns: tuple[str, ...] = ("doc_id", "n_chars", "lang")):
    """Dataset of oracle-plane points derived from the documents table.

    Columns are pruned at the read (SURVEY.md 'prune at the read')."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))
    return ds.map_batches(add_geo, batch_format="pyarrow")


def events_points(sf_dir: str, columns: tuple[str, ...] = ("event_id", "user_id", "ts")):
    """Oracle-plane points for the EVENTS table — event locations geocoded
    from ``event_id`` with the same integer-hash plane as the documents
    (``EVENTS_GEO_CTE`` is the SQL twin)."""
    import ray.data

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_numpy(zero_copy_only=False)
        lat, lon = geo_from_id(ids)
        return batch.append_column("x", pa.array(lon)).append_column("y", pa.array(lat))

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=list(columns))
    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Oracle polygon layers (lat/lon plane, hard-coded floats so the same literals
# appear in the generated SQL)
# ---------------------------------------------------------------------------

# Rectangles: one around each hot-spot cluster + two background boxes.
ORACLE_RECTS = [
    # (xmin=lon_min, ymin=lat_min, xmax=lon_max, ymax=lat_max)
    (-74.35, 40.35, -73.65, 41.05),   # NYC cluster
    (-118.60, 33.70, -117.90, 34.40), # LA cluster
    (-87.98, 41.53, -87.28, 42.23),   # Chicago cluster
    (-110.0, 30.0, -95.0, 45.0),      # big background box
    (-124.0, 25.0, -120.0, 49.0),     # west strip
]

# Irregular polygons (lon, lat rings) for the parity-SQL exact-PIP oracle.
ORACLE_POLYS = [
    [(-74.3, 40.4), (-73.7, 40.45), (-73.75, 41.0), (-74.2, 40.9)],          # NYC quad
    [(-118.5, 33.8), (-117.95, 34.0), (-118.1, 34.35), (-118.45, 34.3)],     # LA quad
    [(-88.0, 41.6), (-87.3, 41.7), (-87.5, 42.2), (-87.9, 42.1), (-88.05, 41.9)],  # Chicago pentagon
    [(-105.0, 32.0), (-95.0, 33.5), (-97.0, 43.0), (-107.0, 41.0)],          # big background quad
]


# Nearest-facility sites: the vertex mean of each oracle polygon, computed
# ONCE here in plain Python — the engine consumes these float64 values and the
# SQL oracle embeds their repr() literals, so both sides share identical
# constants (repr round-trips float64 exactly).
ORACLE_SITES = [
    (sum(p[0] for p in ring) / len(ring), sum(p[1] for p in ring) / len(ring))
    for ring in ORACLE_POLYS
]


def sites_values_sql() -> str:
    # "e0"-suffixed literals parse directly as DOUBLE: DuckDB's plain decimal
    # literals become DECIMAL, and its decimal->double path rounds 17-digit
    # mantissas (int/10^scale with the int already above 2^53), which would
    # shift min_d2 by ~1 ulp vs the engine's float64 arithmetic.
    rows = ",\n    ".join(
        f"({i}, {sx!r}e0, {sy!r}e0)" for i, (sx, sy) in enumerate(ORACLE_SITES)
    )
    return f"sites(site_id, sx, sy) AS (VALUES\n    {rows}\n)"


def poly_edges_double_sql() -> str:
    """ORACLE_POLYS edges with derived (dx, dy, l2) for the point-to-segment
    distance oracle.  "e0" literals force DOUBLE parse (see sites_values_sql)
    so every derived quantity is the same float64 value the engine computes
    from the layer's vertex array."""
    rows = []
    for ring in ORACLE_POLYS:
        n = len(ring)
        j = n - 1
        for i in range(n):
            vix, viy = ring[i]
            vjx, vjy = ring[j]
            rows.append(f"({vix!r}e0, {viy!r}e0, {vjx!r}e0, {vjy!r}e0)")
            j = i
    raw = "edges_raw(ax, ay, bx, by) AS (VALUES\n    " + ",\n    ".join(rows) + "\n)"
    return (
        raw
        + """,
edges_d AS (
  SELECT ax, ay, (bx - ax) AS dx, (by - ay) AS dy,
         (bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS l2
  FROM edges_raw
)"""
    )


def poly_edges_dist_sql(name: str = "pedges") -> str:
    """ORACLE_POLYS edges WITH poly ids and Python-precomputed (dx, dy, l2)
    as e0-DOUBLE literals — the per-polygon distance oracle plane.  Embedding
    the derived float64 values directly (instead of deriving them in SQL)
    guarantees bit-identity with the engine's ``zonal.poly_edges`` arrays."""
    rows = []
    for pid, ring in enumerate(ORACLE_POLYS):
        n = len(ring)
        j = n - 1
        for i in range(n):
            ax, ay = float(ring[i][0]), float(ring[i][1])
            bx, by = float(ring[j][0]), float(ring[j][1])
            dx, dy = bx - ax, by - ay
            l2 = dx * dx + dy * dy
            rows.append(f"({pid}, {ax!r}e0, {ay!r}e0, {dx!r}e0, {dy!r}e0, {l2!r}e0)")
            j = i
    return (
        f"{name}(poly_id, ax, ay, dx, dy, l2) AS (VALUES\n    " + ",\n    ".join(rows) + "\n)"
    )


def rect_edges_values_sql(name: str = "redges") -> str:
    """ORACLE_RECTS as PIP edge rows in the engine's ring construction
    (CCW from the lower-left corner, edge i joins vertex i to its
    predecessor — :func:`rasterflow.geom.polyio.rect_layer`), same shape as
    :func:`poly_edges_values_sql` so the crossing float expressions match."""
    rows = []
    for pid, (xmin, ymin, xmax, ymax) in enumerate(ORACLE_RECTS):
        ring = [(xmin, ymin), (xmax, ymin), (xmax, ymax), (xmin, ymax)]
        j = 3
        for i in range(4):
            vix, viy = ring[i]
            vjx, vjy = ring[j]
            rows.append(f"({pid}, {vix!r}, {viy!r}, {vjx!r}, {vjy!r})")
            j = i
    return f"{name}(poly_id, vix, viy, vjx, vjy) AS (VALUES\n    " + ",\n    ".join(rows) + "\n)"


def oracle_rect_layer() -> PolygonLayer:
    return rect_layer("oracle_rects", np.asarray(ORACLE_RECTS, dtype=np.float64))


def oracle_poly_layer() -> PolygonLayer:
    return PolygonLayer.from_rings(
        "oracle_polys",
        [[np.asarray(p, dtype=np.float64)] for p in ORACLE_POLYS],
    )


# ---------------------------------------------------------------------------
# SQL fragments shared by the oracle queries
# ---------------------------------------------------------------------------

# geocode CTE: bit-identical to fixtures.geo_from_id (pure int/float64 ops)
GEO_CTE = """
geo AS (
  SELECT doc_id, n_chars, lang,
    CASE WHEN h1 % 100 < 80 THEN
      (CASE h2 % 3 WHEN 0 THEN 40.7 WHEN 1 THEN 34.05 ELSE 41.88 END)
        + ((((h1 // 256) % 1048576) / 1048576.0) - 0.5) * 0.7
    ELSE 24.4 + 24.9 * (((h1 // 256) % 1048576) / 1048576.0) END AS lat,
    CASE WHEN h1 % 100 < 80 THEN
      (CASE h2 % 3 WHEN 0 THEN -74.0 WHEN 1 THEN -118.25 ELSE -87.63 END)
        + ((((h2 // 256) % 1048576) / 1048576.0) - 0.5) * 0.7
    ELSE -124.8 + 57.9 * (((h2 // 256) % 1048576) / 1048576.0) END AS lon
  FROM (
    SELECT doc_id, n_chars, lang,
           (doc_id * 2654435761) % 4294967296 AS h1,
           (doc_id * 2246822519 + 3266489917) % 4294967296 AS h2
    FROM documents
  )
)
"""


EVENTS_GEO_CTE = """
egeo AS (
  SELECT event_id, user_id, ts,
    CASE WHEN h1 % 100 < 80 THEN
      (CASE h2 % 3 WHEN 0 THEN 40.7 WHEN 1 THEN 34.05 ELSE 41.88 END)
        + ((((h1 // 256) % 1048576) / 1048576.0) - 0.5) * 0.7
    ELSE 24.4 + 24.9 * (((h1 // 256) % 1048576) / 1048576.0) END AS lat,
    CASE WHEN h1 % 100 < 80 THEN
      (CASE h2 % 3 WHEN 0 THEN -74.0 WHEN 1 THEN -118.25 ELSE -87.63 END)
        + ((((h2 // 256) % 1048576) / 1048576.0) - 0.5) * 0.7
    ELSE -124.8 + 57.9 * (((h2 // 256) % 1048576) / 1048576.0) END AS lon
  FROM (
    SELECT event_id, user_id, ts,
           (event_id * 2654435761) % 4294967296 AS h1,
           (event_id * 2246822519 + 3266489917) % 4294967296 AS h2
    FROM events
  )
)
"""


def rects_values_sql() -> str:
    rows = ",\n    ".join(
        f"({i}, {xmin!r}, {ymin!r}, {xmax!r}, {ymax!r})"
        for i, (xmin, ymin, xmax, ymax) in enumerate(ORACLE_RECTS)
    )
    return f"rects(poly_id, xmin, ymin, xmax, ymax) AS (VALUES\n    {rows}\n)"


def poly_edges_values_sql() -> str:
    """Edges of ORACLE_POLYS in the engine's PIP iteration order/orientation
    (i from 0..n-1, j = previous), so the float expressions match exactly."""
    rows = []
    for pid, ring in enumerate(ORACLE_POLYS):
        n = len(ring)
        j = n - 1
        for i in range(n):
            vix, viy = ring[i]
            vjx, vjy = ring[j]
            rows.append(f"({pid}, {vix!r}, {viy!r}, {vjx!r}, {vjy!r})")
            j = i
    return "edges(poly_id, vix, viy, vjx, vjy) AS (VALUES\n    " + ",\n    ".join(rows) + "\n)"


# the PIP crossing condition with the same expression shape as geom/pip.py
PIP_JOIN_SQL = """
  SELECT g.doc_id, e.poly_id, g.n_chars
  FROM geo g JOIN edges e
    ON ((e.viy > g.lat) <> (e.vjy > g.lat))
   AND (g.lon < (e.vjx - e.vix) / (e.vjy - e.viy) * (g.lat - e.viy) + e.vix)
  GROUP BY g.doc_id, e.poly_id, g.n_chars
  HAVING (count(*) % 2) = 1
"""
