"""rasterflow — Ray-Data-native raster spatial aggregation engine.

A from-scratch reimplementation of the query capabilities of
VIDA-NYU/raster-join (VLDB'18 "GPU Rasterization for Real-Time Spatial
Aggregation over Arbitrary Polygons") as ``ray.data`` pipelines, plus the
training-data operators a 100 TB web-corpus pipeline needs.  See SURVEY.md
for the full blueprint and reference file:line citations.

Public API
----------
Spatial:
  - :func:`rasterflow.pipelines.joins.aggregate_by_polygon` (raster/index/hybrid)
  - :func:`rasterflow.pipelines.joins.spatial_join` (materialized join rows)
  - :func:`rasterflow.pipelines.joins.aggregate_with_bounds` (error bounds)
  - :func:`rasterflow.pipelines.knn.knn_brute` / ``knn_cell_ring``
  - :func:`rasterflow.pipelines.ingest.ingest_points` / ``read_points`` /
    ``count_in_box`` / ``radius_search``
  - :func:`rasterflow.pipelines.cellagg.cell_histogram_grid` / ``_global``
Text / training-data:
  - :mod:`rasterflow.pipelines.dedup` (exact, MinHash-LSH, SimHash, n-gram)
  - :mod:`rasterflow.pipelines.similarity` (cosine top-k, IVF, near-dup)
  - :mod:`rasterflow.pipelines.textstats` (tokens, quality, lang-id, fingerprint)
  - :mod:`rasterflow.pipelines.windows` (tumbling windows, sessions)
  - :mod:`rasterflow.pipelines.multimodal` (binary payload stages, stubbed decode)
State / infrastructure:
  - :mod:`rasterflow.state.bundle` (broadcast polygon bundles)
  - :mod:`rasterflow.state.lineage` (per-partition manifests, resume)
  - :mod:`rasterflow.util` (``grouped_aggregate``, ``coalesce_small``)

Extension surface (SURVEY.md §2.8 analogue)
-------------------------------------------
- New point schemas: any pages-like Dataset works; provide a geocoder
  (pure ``batch -> (lat, lon)``) to :class:`rasterflow.stages.geocode.PreparePoints`.
- New polygon sets: :mod:`rasterflow.geom.polyio` text/catalog loaders or
  ``PolygonLayer.from_rings``.
- New join strategies: subclass :class:`rasterflow.pipelines.joins.SpatialJoinAgg`
  and override ``_match_pairs`` (the ``GLFunction`` analogue).

Library code never calls ``ray.init``; only CLI entry points and tests own a
Ray session.
"""

__version__ = "0.1.0"

import logging as _logging

# Ray 2.49's schema-unification dedup tries set(schemas); PandasBlockSchema
# is a NamedTuple holding lists, so EVERY pandas-block pipeline logs
# "Failed to hash the schemas (for deduplication)" per reduce task (VERDICT
# r2 #8 — pure log spam, upstream cosmetic bug).  That module logs nothing
# else below ERROR, so raising its level is surgical.  Runs in every worker
# because workers import rasterflow when unpickling our stage functions.
_logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").setLevel(_logging.ERROR)
