"""Deterministic synthetic fixtures (FIXTURES.md): the Common-Crawl-style
``pages`` table and seeded polygon layers.

Everything is a pure function of the row id ``i`` — no RNG state, no external
data — so the same row is byte-identical regardless of which worker, batch, or
run generates it (the per-url byte-identity invariant in BASELINE.json depends
on this).  The geocode uses pure integer hash arithmetic (Knuth multiplicative
constants) so the identical values are expressible in ANSI SQL for the DuckDB
oracle (see ``__ray_entry__.py``).

The hot-spot mixture (80% of points in 3 city-sized uniform boxes) exercises
skewed cells, per FIXTURES.md §1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# 64-word vocabulary for the deterministic lorem generator.
WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "eu fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
    "sunt culpa qui officia deserunt mollit anim id est laborum vero"
).split()
assert len(WORDS) == 64

LANGS = ("en", "es", "de", "fr")

# Hash constants (Knuth / xxhash-style multiplicative mixing), int64-safe for
# row ids < 2^31.
H1_MUL = 2654435761
H2_MUL = 2246822519
H2_ADD = 3266489917
M32 = 2**32
U_BITS = 1048576  # 2^20

# Hot-spot cluster centers (lat, lon) — NYC / LA / Chicago-ish, all with a
# 0.35-degree half-width box fully inside the US bbox.
CLUSTER_LAT = (40.7, 34.05, 41.88)
CLUSTER_LON = (-74.0, -118.25, -87.63)
CLUSTER_HALF = 0.35
HOT_PCT = 80

EPOCH_2013 = 1356998400  # 2013-01-01T00:00:00Z
TS_SPAN = 4 * 365 * 86400


def _h1(i: np.ndarray) -> np.ndarray:
    return (np.asarray(i, dtype=np.int64) * H1_MUL) % M32


def _h2(i: np.ndarray) -> np.ndarray:
    return (np.asarray(i, dtype=np.int64) * H2_MUL + H2_ADD) % M32


def geo_from_id(i: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic geocode of row id -> (lat, lon), hot-spot mixture.

    Pure integer/rational arithmetic — reproducible bit-for-bit in SQL:
        u1 = ((h1 >> 8) % 2^20) / 2^20,  u2 = ((h2 >> 8) % 2^20) / 2^20
        hot iff h1 % 100 < 80; cluster = h2 % 3.
    """
    h1 = _h1(i)
    h2 = _h2(i)
    u1 = ((h1 >> 8) % U_BITS).astype(np.float64) / U_BITS
    u2 = ((h2 >> 8) % U_BITS).astype(np.float64) / U_BITS
    hot = (h1 % 100) < HOT_PCT
    c = (h2 % 3).astype(np.int64)
    clat = np.asarray(CLUSTER_LAT)[c]
    clon = np.asarray(CLUSTER_LON)[c]
    lat_hot = clat + (u1 - 0.5) * (2 * CLUSTER_HALF)
    lon_hot = clon + (u2 - 0.5) * (2 * CLUSTER_HALF)
    lat_bg = 24.4 + 24.9 * u1
    lon_bg = -124.8 + 57.9 * u2
    return np.where(hot, lat_hot, lat_bg), np.where(hot, lon_hot, lon_bg)


def urls_for_ids(i: np.ndarray) -> list[str]:
    return [f"https://site{int(v) % 1000}.example/{int(v):08d}" for v in i]


def ids_from_urls(urls) -> np.ndarray:
    """Inverse of :func:`urls_for_ids`: parse the 8-digit row id tail."""
    return np.asarray([int(str(u).rsplit("/", 1)[-1]) for u in urls], dtype=np.int64)


def lorem(i: int, h1: int, h2: int) -> str:
    nw = 8 + h1 % 25
    idx = (h2 + np.arange(nw, dtype=np.int64) * H1_MUL + i) % 64
    return " ".join(WORDS[int(j)] for j in idx)


def pages_batch(ids: np.ndarray) -> pa.Table:
    """Generate the pages table rows for the given row ids (pure, vectorized
    where possible; string assembly is per-row but runs inside distributed
    map_batches tasks)."""
    ids = np.asarray(ids, dtype=np.int64)
    lat, lon = geo_from_id(ids)
    h1 = _h1(ids)
    h2 = _h2(ids)
    ts = EPOCH_2013 + (ids * 137) % TS_SPAN
    urls = urls_for_ids(ids)
    texts = [
        f"doc {int(i)} geo {la:.6f} {lo:.6f} {lorem(int(i), int(a), int(b))}"
        for i, la, lo, a, b in zip(ids, lat, lon, h1, h2)
    ]
    htmls = [
        b"<html><head><title>doc %d</title></head><body>" % int(i)
        + t.encode("utf-8")
        + b"</body></html>"
        for i, t in zip(ids, texts)
    ]
    langs = [LANGS[int(i) % 4] for i in ids]
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts * 1_000_000, type=pa.int64()).cast(pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


# Predicate fixture columns (FIXTURES.md §5): numeric attributes mirroring the
# reference's hardcoded taxi constraints (RasterJoin/main.cpp:82-118).
def attrs_for_ids(ids: np.ndarray) -> dict[str, np.ndarray]:
    ids = np.asarray(ids, dtype=np.int64)
    h1 = _h1(ids)
    h2 = _h2(ids)
    return {
        "passengers": ((h1 >> 2) % 6 + 1).astype(np.uint32),
        "fare": ((h2 >> 3) % 5000).astype(np.uint32),
        "miles": (((h1 >> 5) % 3000).astype(np.float32) / 100.0).astype(np.float32),
        "duration": ((h2 >> 7) % 120).astype(np.uint32),
    }


def pages_dataset(n: int, with_attrs: bool = False, override_num_blocks: int | None = None):
    """Distributed deterministic pages dataset of ``n`` rows."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        t = pages_batch(ids)
        if with_attrs:
            for k, v in attrs_for_ids(ids).items():
                t = t.append_column(k, pa.array(v))
        return t

    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.range(n, **kwargs).map_batches(gen, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Polygon layer fixtures (FIXTURES.md §2)
# ---------------------------------------------------------------------------


def tiny2_layer():
    """The reference's hand-checkable 2-square case
    (RasterJoin/test/baseline.hpp:139-217)."""
    from ..geom.polyio import rect_layer

    return rect_layer("tiny2", np.array([[5.1, 5.1, 5.2, 5.2], [4.9, 4.9, 5.1, 5.1]]))


def _star_ring(rng: np.random.Generator, cx: float, cy: float, rmin: float, rmax: float, nv: int) -> np.ndarray:
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    rad = rng.uniform(rmin, rmax, nv)
    return np.stack([cx + np.cos(ang) * rad, cy + np.sin(ang) * rad], axis=1)


def neigh_like_layer(n: int = 260, seed: int = 42, project: bool = True, nv_range: tuple[int, int] = (8, 41)):
    """~260 random star polygons over the hot-spot clusters (lat/lon plane),
    mirroring the NYC-neighborhoods workload; optionally projected to world
    coords."""
    from ..geom.polyio import PolygonLayer
    from ..geom.projection import project_points

    rng = np.random.default_rng(seed)
    polys = []
    for k in range(n):
        c = k % 3
        cy = CLUSTER_LAT[c] + rng.uniform(-CLUSTER_HALF, CLUSTER_HALF)
        cx = CLUSTER_LON[c] + rng.uniform(-CLUSTER_HALF, CLUSTER_HALF)
        nv = int(rng.integers(*nv_range))
        r = rng.uniform(0.01, 0.06)
        ring = _star_ring(rng, cx, cy, 0.3 * r, r, nv)  # (lon, lat) order = (x, y)
        polys.append([ring])
    layer = PolygonLayer.from_rings(f"neigh{n}", polys)
    if project:
        lat = layer.verts[:, 1]
        lon = layer.verts[:, 0]
        x, y, ok = project_points(lat, lon)
        assert ok.all(), "fixture polygons must stay inside the US bbox"
        layer = PolygonLayer(layer.name, np.stack([x, y], axis=1), layer.ring_offsets, layer.poly_ring_offsets)
    return layer


def synthetic_layer(n: int, seed: int = 7, project: bool = True):
    """N uniform small star polygons over the whole US bbox (mirrors the
    reference's synthetic polygon-count scaling, hybrid-polygons.ps1:21)."""
    from ..geom.polyio import PolygonLayer
    from ..geom.projection import project_points

    rng = np.random.default_rng(seed)
    polys = []
    for _ in range(n):
        cy = rng.uniform(25.5, 48.5)
        cx = rng.uniform(-123.5, -68.0)
        nv = int(rng.integers(6, 16))
        r = rng.uniform(0.02, 0.2)
        polys.append([_star_ring(rng, cx, cy, 0.4 * r, r, nv)])
    layer = PolygonLayer.from_rings(f"synthetic{n}", polys)
    if project:
        x, y, ok = project_points(layer.verts[:, 1], layer.verts[:, 0])
        assert ok.all()
        layer = PolygonLayer(layer.name, np.stack([x, y], axis=1), layer.ring_offsets, layer.poly_ring_offsets)
    return layer


def holes_layer():
    from ..geom.polyio import PolygonLayer

    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    inner = np.array([[3, 3], [7, 3], [7, 7], [3, 7]], dtype=float)
    return PolygonLayer.from_rings("holes", [[outer, inner]])


def payload_batch(ids: np.ndarray, nbytes: int = 256, salt: int = 0) -> pa.Array:
    """Deterministic opaque binary payloads per id (fake image/audio blobs
    for the multimodal stages — no image libs in this container, FIXTURES.md).

    splitmix64 counter stream keyed by (id, word index): vectorized, stable
    across runs and parallelism.  Returns a fixed_size_binary(nbytes) array."""
    from ..stages.texthash import mix64

    ids = np.asarray(ids, dtype=np.int64).astype(np.uint64)
    words = nbytes // 8
    ctr = ids[:, None] * np.uint64(words * 2 + 1) + np.arange(words, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        m = mix64(ctr + np.uint64(salt) * np.uint64(0x9E3779B97F4A7C15))
    return pa.Array.from_buffers(
        pa.binary(nbytes), len(ids), [None, pa.py_buffer(np.ascontiguousarray(m).tobytes())]
    )
