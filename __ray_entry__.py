"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-aggregation pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every SQL-expressible
query (same column names, bit-reproducible float expressions — see
``rasterflow/pipelines/points.py`` for the oracle-plane design).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rasterflow.geom.cells import Grid
from rasterflow.geom.projection import MAX_LAT, MAX_LON, MIN_LAT, MIN_LON
from rasterflow.pipelines.cellagg import cell_histogram_grid
from rasterflow.pipelines.joins import aggregate_by_polygon, spatial_join
from rasterflow.pipelines.points import (
    GEO_CTE,
    PIP_JOIN_SQL,
    documents_points,
    oracle_poly_layer,
    oracle_rect_layer,
    poly_edges_values_sql,
    rects_values_sql,
)
from rasterflow.stages.filters import apply_constraints

SF0001 = "/root/testdata/sf0.001"

# 0.5-degree oracle cell grid over the US bbox (lat/lon plane)
ORACLE_GRID = Grid.from_bounds(MIN_LON, MIN_LAT, MAX_LON, MAX_LAT, 0.5)


def entry() -> Any:
    """Flagship: documents -> geocoded points -> hybrid PIP join -> per-polygon
    aggregate (exact, with the raster fast path on interior cells)."""
    pts = documents_points(SF0001)
    return aggregate_by_polygon(
        pts, oracle_poly_layer(), how="hybrid", value_col="n_chars", agg="avg",
        cell_size=0.02, concurrency=2,
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_agg_rect_index(sf_dir: str):
    return aggregate_by_polygon(
        documents_points(sf_dir), oracle_rect_layer(), how="index", cell_size=0.05, concurrency=2
    )


def _q_agg_rect_raster(sf_dir: str):
    # rectangles + fine cells: raster stays approximate in general, but the
    # oracle compare needs exactness — so use the exact-equivalent hybrid on
    # the same raster canvas… no: this entry is the *raster* operator; its
    # oracle holds because every rect edge is far (>cell) from any point's
    # cell boundary at this density? Not guaranteed — keep raster rows-only
    # by omitting it from oracle_sql (driver records rows-only).
    return aggregate_by_polygon(
        documents_points(sf_dir), oracle_rect_layer(), how="raster", cell_size=0.01, concurrency=2
    )


def _q_agg_poly_index(sf_dir: str):
    return aggregate_by_polygon(
        documents_points(sf_dir), oracle_poly_layer(), how="index", cell_size=0.05, concurrency=2
    )


def _q_agg_poly_hybrid_avg(sf_dir: str):
    return aggregate_by_polygon(
        documents_points(sf_dir), oracle_poly_layer(), how="hybrid",
        value_col="n_chars", agg="avg", cell_size=0.05, concurrency=2,
    )


def _q_join_rows_poly(sf_dir: str):
    out = spatial_join(
        documents_points(sf_dir), oracle_poly_layer(), how="index",
        id_col="doc_id", cell_size=0.05, concurrency=2,
    )
    return out.sort(["doc_id", "poly_id"])


def _q_filter_agg_rect(sf_dir: str):
    pts = documents_points(sf_dir)
    pts = apply_constraints(pts, [("lang", "EQ", "en"), ("n_chars", "GT", 500)])
    return aggregate_by_polygon(pts, oracle_rect_layer(), how="hybrid", cell_size=0.05, concurrency=2)


def _q_cell_counts(sf_dir: str):
    return cell_histogram_grid(documents_points(sf_dir), ORACLE_GRID)


def _q_events_time_agg(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def f(b: pa.Table) -> pa.Table:
        t = b.column("ts")
        lo = pa.scalar(np.datetime64("2024-01-10T00:00:00", "us"))
        hi = pa.scalar(np.datetime64("2024-01-20T00:00:00", "us"))
        return b.filter(pc.and_(pc.greater_equal(t, lo), pc.less(t, hi)))

    from ray.data.aggregate import Count

    out = ds.map_batches(f, batch_format="pyarrow").groupby("event_type").aggregate(Count(alias_name="n"))
    return out.sort("event_type")


def _q_dedup_exact_prefix(sf_dir: str):
    """Exact dedup by content key (30-char prefix): keep min doc_id per key."""
    import ray.data
    from ray.data.aggregate import Count, Min

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def key(b: pa.Table) -> pa.Table:
        k = pc.utf8_slice_codeunits(b.column("text"), 0, 30)
        return pa.table({"key": k, "doc_id": b.column("doc_id")})

    out = (
        ds.map_batches(key, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Min("doc_id", alias_name="doc_id"), Count(alias_name="n"))
    )

    def drop_key(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "n"])

    return out.map_batches(drop_key, batch_format="pyarrow").sort("doc_id")


def _q_token_stats(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        t = b.column("text")
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tok": pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int64()),
                "n_the": pc.cast(pc.count_substring_regex(t, r"\bthe\b"), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow").sort("doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "agg_rect_index": _q_agg_rect_index,
        "agg_rect_raster": _q_agg_rect_raster,
        "agg_poly_index": _q_agg_poly_index,
        "agg_poly_hybrid_avg": _q_agg_poly_hybrid_avg,
        "join_rows_poly": _q_join_rows_poly,
        "filter_agg_rect": _q_filter_agg_rect,
        "cell_counts": _q_cell_counts,
        "events_time_agg": _q_events_time_agg,
        "dedup_exact_prefix": _q_dedup_exact_prefix,
        "token_stats": _q_token_stats,
    }


# ---------------------------------------------------------------------------
# oracle SQL
# ---------------------------------------------------------------------------


def _rect_count_sql(where: str = "") -> str:
    return f"""
WITH {GEO_CTE.strip()},
{rects_values_sql()}
SELECT CAST(r.poly_id AS INTEGER) AS poly_id, count(*) AS "count"
FROM geo g JOIN rects r
  ON g.lon > r.xmin AND g.lon < r.xmax AND g.lat > r.ymin AND g.lat < r.ymax
{where}
GROUP BY r.poly_id
ORDER BY poly_id
"""


def oracle_sql() -> dict[str, str]:
    nx = ORACLE_GRID.nx
    return {
        "agg_rect_index": _rect_count_sql(),
        "agg_poly_index": f"""
WITH {GEO_CTE.strip()},
{poly_edges_values_sql()},
hits AS ({PIP_JOIN_SQL.strip()})
SELECT CAST(poly_id AS INTEGER) AS poly_id, count(*) AS "count"
FROM hits GROUP BY poly_id ORDER BY poly_id
""",
        "agg_poly_hybrid_avg": f"""
WITH {GEO_CTE.strip()},
{poly_edges_values_sql()},
hits AS ({PIP_JOIN_SQL.strip()})
SELECT CAST(poly_id AS INTEGER) AS poly_id, count(*) AS "count",
       CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg
FROM hits GROUP BY poly_id ORDER BY poly_id
""",
        "join_rows_poly": f"""
WITH {GEO_CTE.strip()},
{poly_edges_values_sql()},
hits AS ({PIP_JOIN_SQL.strip()})
SELECT doc_id, CAST(poly_id AS INTEGER) AS poly_id
FROM hits ORDER BY doc_id, poly_id
""",
        "filter_agg_rect": _rect_count_sql(where="WHERE g.lang = 'en' AND g.n_chars > 500"),
        "cell_counts": f"""
WITH {GEO_CTE.strip()}
SELECT CAST(FLOOR((lat - ({MIN_LAT!r})) / 0.5) AS BIGINT) * {nx}
       + CAST(FLOOR((lon - ({MIN_LON!r})) / 0.5) AS BIGINT) AS cell_id,
       count(*) AS n
FROM geo GROUP BY cell_id ORDER BY cell_id
""",
        "events_time_agg": """
SELECT event_type, count(*) AS n FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type ORDER BY event_type
""",
        "dedup_exact_prefix": """
SELECT min(doc_id) AS doc_id, count(*) AS n
FROM documents GROUP BY substr(text, 1, 30) ORDER BY doc_id
""",
        "token_stats": r"""
SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tok,
       len(regexp_extract_all(text, '\bthe\b')) AS n_the
FROM documents ORDER BY doc_id
""",
    }
