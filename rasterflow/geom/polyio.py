"""Polygon layer model + loaders (reference text format and numpy-native).

The layer is stored as flat CSR arrays — the same derived layout the reference
builds after load (flat vertex array + start-offset index,
``RasterJoin/db/PolyHandler.hpp:48-49`` / ``PolyHandler.cpp:49-80``) — because
that is exactly the shape a broadcast small side wants: a handful of numpy
arrays placed once in the Ray object store and gathered zero-copy by join
actors.

Text format (``PolyHandler::readPolygons``, ``db/PolyHandler.cpp:133-188``):
``tot`` polygons; per polygon ``np`` rings; per ring ``n`` then ``n`` ``x y``
float pairs.  Consecutive duplicate vertices and a repeated closing vertex are
dropped on load.  A catalog file maps ``name,relative_file`` per line
(``PolyHandler.cpp:20-40``).  Polygon ids are positional (load order), which is
the output key space (SURVEY.md §2.7.6).
"""

from __future__ import annotations

import hashlib
import io
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from .projection import project_points


@dataclass
class PolygonLayer:
    """A named, immutable set of polygons in CSR layout.

    verts            : (V, 2) float64 vertex coordinates
    ring_offsets     : (R+1,) int64 CSR over rings -> verts
    poly_ring_offsets: (P+1,) int64 CSR over polygons -> rings
    """

    name: str
    verts: np.ndarray
    ring_offsets: np.ndarray
    poly_ring_offsets: np.ndarray
    _mbrs: np.ndarray | None = field(default=None, repr=False)

    @property
    def npolys(self) -> int:
        return len(self.poly_ring_offsets) - 1

    def rings_of(self, poly_id: int) -> np.ndarray:
        """Absolute ring-offset slice for one polygon (for the PIP kernel)."""
        r0 = self.poly_ring_offsets[poly_id]
        r1 = self.poly_ring_offsets[poly_id + 1]
        return self.ring_offsets[r0 : r1 + 1]

    @property
    def mbrs(self) -> np.ndarray:
        """(P, 4) per-polygon (xmin, ymin, xmax, ymax)."""
        if self._mbrs is None:
            P = self.npolys
            m = np.empty((P, 4), dtype=np.float64)
            for p in range(P):
                v0 = self.ring_offsets[self.poly_ring_offsets[p]]
                v1 = self.ring_offsets[self.poly_ring_offsets[p + 1]]
                vs = self.verts[v0:v1]
                m[p, 0] = vs[:, 0].min()
                m[p, 1] = vs[:, 1].min()
                m[p, 2] = vs[:, 0].max()
                m[p, 3] = vs[:, 1].max()
            object.__setattr__(self, "_mbrs", m)
        return self._mbrs

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        if self.npolys == 0:
            return (0.0, 0.0, 1.0, 1.0)
        m = self.mbrs
        return (
            float(m[:, 0].min()),
            float(m[:, 1].min()),
            float(m[:, 2].max()),
            float(m[:, 3].max()),
        )

    def content_hash(self) -> str:
        h = hashlib.sha256()
        h.update(np.ascontiguousarray(self.verts).tobytes())
        h.update(np.ascontiguousarray(self.ring_offsets).tobytes())
        h.update(np.ascontiguousarray(self.poly_ring_offsets).tobytes())
        return h.hexdigest()[:16]

    @classmethod
    def from_rings(cls, name: str, polygons: list[list[np.ndarray]]) -> "PolygonLayer":
        """Build from a list of polygons, each a list of (n,2) rings."""
        verts, ring_offsets, poly_ring_offsets = [], [0], [0]
        for rings in polygons:
            for ring in rings:
                ring = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
                verts.append(ring)
                ring_offsets.append(ring_offsets[-1] + len(ring))
            poly_ring_offsets.append(poly_ring_offsets[-1] + len(rings))
        v = np.concatenate(verts, axis=0) if verts else np.empty((0, 2))
        return cls(
            name,
            v,
            np.asarray(ring_offsets, dtype=np.int64),
            np.asarray(poly_ring_offsets, dtype=np.int64),
        )


def _dedupe_ring(ring: np.ndarray) -> np.ndarray:
    """Drop consecutive duplicates and a repeated closing vertex
    (PolyHandler.cpp:148-166 behavior)."""
    if len(ring) == 0:
        return ring
    keep = np.ones(len(ring), dtype=bool)
    keep[1:] = np.any(ring[1:] != ring[:-1], axis=1)
    ring = ring[keep]
    if len(ring) > 1 and np.all(ring[0] == ring[-1]):
        ring = ring[:-1]
    return ring


def read_polygons_text(
    path_or_buf, name: str = "layer", project: bool = False
) -> PolygonLayer:
    """Parse the reference's polygon text format.

    With ``project=True`` the vertices are lat/lon pairs (lat first, matching
    ``transformPolygon``) projected to centered world coords; polygons with any
    vertex outside the US bbox are dropped entirely
    (``UsefulFuncs.cpp:612-623``, ``PolyHandler.cpp:168-175``).
    """
    if isinstance(path_or_buf, (str, Path)):
        text = Path(path_or_buf).read_text()
    else:
        text = path_or_buf.read()
    toks = iter(text.split())

    def nxt() -> str:
        return next(toks)

    tot = int(nxt())
    polygons: list[list[np.ndarray]] = []
    for _ in range(tot):
        nrings = int(nxt())
        rings = []
        dropped = False
        for _ in range(nrings):
            n = int(nxt())
            flat = np.fromiter((float(nxt()) for _ in range(2 * n)), dtype=np.float64, count=2 * n)
            ring = flat.reshape(-1, 2)
            if project:
                x, y, ok = project_points(ring[:, 0], ring[:, 1])
                if not np.all(ok):
                    dropped = True
                ring = np.stack([x, y], axis=1)
            ring = _dedupe_ring(ring)
            rings.append(ring)
        if dropped:
            continue
        rings = [r for r in rings if len(r) >= 3]
        if rings:
            polygons.append(rings)
    return PolygonLayer.from_rings(name, polygons)


def write_polygons_text(layer: PolygonLayer, path: str | Path) -> None:
    """Serialize a layer back to the reference text format (for fixtures)."""
    buf = io.StringIO()
    buf.write(f"{layer.npolys}\n")
    for p in range(layer.npolys):
        r0, r1 = layer.poly_ring_offsets[p], layer.poly_ring_offsets[p + 1]
        buf.write(f"{r1 - r0}\n")
        for r in range(r0, r1):
            ring = layer.verts[layer.ring_offsets[r] : layer.ring_offsets[r + 1]]
            buf.write(f"{len(ring)}\n")
            for vx, vy in ring:
                buf.write(f"{vx!r} {vy!r}\n")
    Path(path).write_text(buf.getvalue())


def read_catalog(path: str | Path, project: bool = False) -> dict[str, PolygonLayer]:
    """Catalog file: ``name,relative_file`` per line (PolyHandler.cpp:20-40)."""
    path = Path(path)
    out: dict[str, PolygonLayer] = {}
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or "," not in line:
            continue
        name, rel = (s.strip() for s in line.split(",", 1))
        out[name] = read_polygons_text(path.parent / rel, name=name, project=project)
    return out


def read_geojson(path_or_obj, name: str = "layer", project: bool = False) -> PolygonLayer:
    """GeoJSON convenience loader (FeatureCollection / Feature / [Multi]Polygon).

    GeoJSON coordinates are (lon, lat).  With ``project=True`` vertices are
    projected to centered world coords (polygons with any vertex outside the
    US bbox are dropped, matching the text loader); otherwise the layer stays
    in the raw (x=lon, y=lat) plane.  MultiPolygon parts become additional
    rings of one polygon id — even-odd semantics handle disjoint parts.
    Polygon ids are positional (feature order), as everywhere else.
    """
    import json

    if isinstance(path_or_obj, (str, Path)):
        obj = json.loads(Path(path_or_obj).read_text())
    elif isinstance(path_or_obj, dict):
        obj = path_or_obj
    else:
        obj = json.load(path_or_obj)

    def geoms(o):
        t = o.get("type")
        if t == "FeatureCollection":
            for f in o.get("features", []):
                yield f.get("geometry") or {}
        elif t == "Feature":
            yield o.get("geometry") or {}
        else:
            yield o

    polygons: list[list[np.ndarray]] = []
    for g in geoms(obj):
        t = g.get("type")
        if t == "Polygon":
            parts = [g.get("coordinates", [])]
        elif t == "MultiPolygon":
            parts = g.get("coordinates", [])
        else:
            continue
        rings = []
        dropped = False
        for part in parts:
            for ring_coords in part:
                ring = np.asarray(ring_coords, dtype=np.float64).reshape(-1, 2)
                if project:
                    x, y, ok = project_points(ring[:, 1], ring[:, 0])
                    if not np.all(ok):
                        dropped = True
                    ring = np.stack([x, y], axis=1)
                ring = _dedupe_ring(ring)
                if len(ring) >= 3:
                    rings.append(ring)
        if rings and not dropped:
            polygons.append(rings)
    return PolygonLayer.from_rings(name, polygons)


def rect_layer(name: str, rects: np.ndarray) -> PolygonLayer:
    """Convenience: axis-aligned rectangles (N,4) (xmin,ymin,xmax,ymax) -> layer.

    Vertices ordered CCW starting at the lower-left corner.
    """
    rects = np.asarray(rects, dtype=np.float64).reshape(-1, 4)
    polys = []
    for xmin, ymin, xmax, ymax in rects:
        polys.append([np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]])])
    return PolygonLayer.from_rings(name, polys)
