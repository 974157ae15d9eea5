"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N,
   "headline_docs_per_s": ...}

Headline = the flagship spatial pipeline at the scale factor: read cached
pages parquet -> extract text -> geocode -> project -> hybrid PIP join against
the 260-polygon neigh-like layer -> per-polygon aggregate.  The pages corpus
is generated deterministically once per (sf, n) into /tmp and reused (the
generation run also warms the OS page cache, per the measurement protocol).

--scaling: runs the same bench in two fresh processes (RAY_GRAFT_CPUS=8 and
=32) on the same input and reports both throughputs + scaling efficiency —
the sandbox stand-in for the N-vs-4N-node cluster criterion (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
PAGES_PER_SF = 20_000_000  # sf0.1 -> 2M pages


def box_canary_sec() -> float:
    """Box-state canary (BASELINE.md measurement protocol): one 4k×4k
    matmul, timed.  ~3-4 s = fast silicon state (numbers comparable to
    BASELINE); ~9-10 s = throttled (burstable-VM credits drained) — in that
    state only RATIOS are meaningful, not wall times.  Emitted in the bench
    JSON so readers can separate box state from code regressions
    mechanically (VERDICT r3 #8).  Thread-count sensitive: the harness
    presets OMP_NUM_THREADS=1, and the value is only comparable across runs
    with the same setting (run it BEFORE ray.init, which also pins it)."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.random((4000, 4000))
    t0 = time.perf_counter()
    _ = a @ a
    return round(time.perf_counter() - t0, 3)


def sf_of(path: str) -> float:
    name = Path(path).name
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


SF = sf_of(SF_DIR)
N_PAGES = int(os.environ.get("GRAFT_N_PAGES", "0")) or max(10_000, int(PAGES_PER_SF * SF))
PAGES_CACHE = f"/tmp/rasterflow_pages_{N_PAGES}"


def ensure_pages(n: int) -> str:
    """Generate the deterministic pages corpus once (distributed, untimed)."""
    done = Path(PAGES_CACHE) / "_DONE"
    if done.exists():
        return PAGES_CACHE
    from rasterflow.sources.fixtures import pages_dataset

    ds = pages_dataset(n, override_num_blocks=max(32, NUM_CPUS * 4))
    ds.write_parquet(PAGES_CACHE)
    done.write_text("ok")
    return PAGES_CACHE


def bench_headline() -> tuple[float, float, int, list]:
    """Flagship ingest pipeline; min over 2 iterations (the reference's own
    min-over-nIter protocol, GLHandler.cpp:234-236) — the first, cold
    iteration (worker-pool startup, cache warm-up) is reported separately.

    32 MB target blocks: the html-heavy map chain needs ≥2 tasks per core
    for load balance; the 128 MB default yields only ~52 tasks for 2M pages
    (measured 697k -> 821k docs/s warm at 32 CPUs)."""
    import ray.data
    from ray.data import DataContext

    from rasterflow.pipelines.joins import aggregate_by_polygon
    from rasterflow.sources.fixtures import neigh_like_layer
    from rasterflow.stages.extract import extract_text
    from rasterflow.stages.geocode import PreparePoints

    path = ensure_pages(N_PAGES)
    layer = neigh_like_layer(260, seed=42)
    ctx = DataContext.get_current()
    prev_tmbs = ctx.target_max_block_size
    ctx.target_max_block_size = 32 * 1024 * 1024
    best = cold = None
    n_polys = 0
    stages = []
    # min over 3 (was 2): the round-3 replacement box keeps improving for a
    # third iteration (worker-pool ramp + turbo settle: 32 -> 15.7 -> 7.5 s
    # observed), so 2 iterations understate the steady-state rate
    iters = int(os.environ.get("GRAFT_HEADLINE_ITERS", "3"))
    try:
        for _ in range(iters):
            t0 = time.perf_counter()
            # prune at the read: the fixture carries a golden `text` copy of
            # the html content — reading it would double the scanned bytes
            ds = ray.data.read_parquet(path, columns=["url", "warc_ts", "html", "lang"])
            ds = ds.map_batches(extract_text, batch_format="pyarrow")
            pts = ds.map_batches(
                PreparePoints(geocoder="text", text_col="text2"), batch_format="pyarrow"
            )
            out = aggregate_by_polygon(
                pts,
                layer,
                how="hybrid",
                accuracy_m=50.0,
                concurrency=max(2, NUM_CPUS - 4),
                batch_size=32768,
                sort=True,
            )
            n_polys = len(out.to_pandas())
            dt = time.perf_counter() - t0
            if cold is None:
                cold = dt
            best = dt if best is None else min(best, dt)
            try:
                from rasterflow.metrics import stage_metrics
                from rasterflow.pipelines import joins as _joins

                stages = stage_metrics(_joins.LAST_STATS or out)
            except Exception:  # noqa: BLE001 - metrics are best-effort
                stages = []
    finally:
        ctx.target_max_block_size = prev_tmbs
    return best, cold, n_polys, stages


def bench_queries() -> dict[str, float]:
    """Per-operator timings over the driver testdata at this sf."""
    import __ray_entry__ as E

    names = [
        "agg_poly_index",
        "agg_poly_hybrid_avg",
        "agg_rect_raster",
        "join_rows_poly",
        "cell_counts",
        "knn_brute",
        "knn_cell_ring",
        "embed_topk",
        "dedup_exact_text",
        "minhash_lsh_pairs",
        "simhash_pairs",
        "ngram_jaccard_pairs",
        "fingerprint",
        "token_stats",
        "quality_score",
        "lang_id",
        "decode_images",
        "embed_neardup_lsh",
        "join_part_agg",
        "asof_purchase_click",
        "col_quantiles_cont",
        "source_cap",
        "curation_keep",
        "stratified_sample",
        "rank_per_lang",
        "event_lag",
        "redact_terms",
        "bigram_top",
        "substring_dups",
        "tfidf_top_terms",
        "rolling_time_sum",
        "funnel_users",
        "session_error_counts",
        "lineitem_semi_orders",
        "hash_vectorize",
        # round-4 additions
        "group_quantiles_cont",
        "join_skew_types",
        "knn_bulk",
        "decode_png",
        "bloom_semi_sources",
        "rollup_week_status",
        "cust_orders_left",
        "lang_stats",
        "bm25_search",
        "pack_bins",
        "decode_wav",
        "export_manifest",
        "group_distinct_users",
        "incremental_dedup",
        "kmeans_clusters",
        "mixture_weights",
        "chunk_docs",
        "quantile_sketch_chars",
        "user_value_outer",
        "quality_tail",
        "training_prep",
        # round-5 additions
        "unicode_norm",
        "agg_poly_sum",
        "bpe_token_stats",
        "pack_bins_bpe",
        "chunk_docs_bpe",
        "dsir_select",
        "semdedup_keep",
        "lm_nll_worst",
        "segment_dedup",
        "token_budget_sample",
        "hotspot_regions",
        "focal_smooth",
        "source_overlap",
        "zonal_minmax",
        "uncovered_by_lang",
        "nearest_poly_centroid",
        "lang_spatial_profile",
        "cell_pyramid",
        "nearest_boundary_docs",
        "top_docs_per_poly",
        "interleave_mix",
        "raster_gradient",
        "pagerank_dups",
        "url_dedup",
        "domain_gate",
        "cell_trend",
        "cell_top_terms",
        "overlay_area",
        "near_pairs",
        "buffer_poly_counts",
        "hotspot_evolution",
        "user_steps",
        "od_matrix",
        "home_cells",
        "user_profile",
        "knn_self",
        "dbscan_docs",
        "events_near_docs",
        "user_trips",
        "poly_raster_area",
        "adaptive_cells",
        "triangle_docs",
        "choropleth",
        "doc_skyline",
        "fuzzy_domains",
        "lang_entropy_cells",
        "copresence",
        "lang_entropy_polys",
        "density_topk",
        "focal_majority",
        "coverage_gaps",
        "rank_transform",
        "cube_lang_source",
        "lang_mad",
        "lang_skyline",
        "lang_gini",
        "lang_rank",
        "domain_dup_stats",
        "value_by_home",
        "domain_trend",
        "source_profile",
        "events_dow",
        "events_punchcard",
    ]
    qs = E.queries()
    out: dict[str, float] = {}
    # min over iterations — the repo's established measurement protocol
    # (BASELINE.md; cold/turbo effects decay 20-40% between runs).  This also
    # credits deliberately amortized state (the persisted kNN shard index),
    # matching how the reference benchmarks against its persisted grid index.
    # min-over-2 per query (headline stays min-over-3): with 110 benched
    # queries (2x round 4) a third pass would double-digit-minutes the gate
    # run; the 2nd iteration already captures the 20-40% cold-decay band
    iters = int(os.environ.get("GRAFT_QUERY_ITERS", "2"))
    for name in names:
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            res = qs[name](SF_DIR)
            if hasattr(res, "to_pandas"):
                res.to_pandas()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 4)
    return out


def run_once() -> dict:
    import ray

    from rasterflow.util import quiet_data_logging_env

    # canary BEFORE ray.init: Ray pins OMP_NUM_THREADS=1, which would make
    # the matmul single-threaded and incomparable to the BASELINE thresholds
    canary = box_canary_sec()
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        runtime_env=quiet_data_logging_env(),
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    try:
        if os.environ.get("GRAFT_JOIN_ONLY"):
            res = bench_join_only()
            import ray as _ray

            _ray.shutdown()
            return {"metric": "hybrid_join_points_sec", "value": res["join_sec"],
                    "unit": "sec", "pts_per_s": res["pts_per_s"],
                    "join_sec": res["join_sec"], "num_cpus": NUM_CPUS,
                    "n_points": POINTS_N, "n_polys_out": res["n_polys_out"],
                    "canary_sec": canary}
        headline_sec, headline_cold, n_polys, stages = bench_headline()
        queries = {} if os.environ.get("GRAFT_HEADLINE_ONLY") else bench_queries()
    finally:
        ray.shutdown()
    return {
        "metric": "hybrid_spatial_join_pipeline_sec",
        "value": round(headline_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "n_pages": N_PAGES,
        "n_polys_out": n_polys,
        "headline_docs_per_s": round(N_PAGES / headline_sec, 1),
        "headline_cold_sec": round(headline_cold, 3),
        "headline_stages": stages,
        "canary_sec": canary,
    }


POINTS_N = int(os.environ.get("GRAFT_SCALING_POINTS", "256000000"))
POINTS_CACHE = f"/tmp/rasterflow_points_f32_{POINTS_N}"


def ensure_points(n: int) -> str:
    """Deterministic pre-ingested point table (id, x, y), written once.

    The scaling benchmark follows the reference's measurement protocol: its
    executeTime covers the join over already-ingested points
    (``results-paper/*``; backendQueryTime is reported separately), so the
    scaling pipeline reads a narrow point layout and measures the join."""
    done = Path(POINTS_CACHE) / "_DONE"
    if done.exists():
        return POINTS_CACHE
    import numpy as np
    import pyarrow as pa
    import ray.data

    from rasterflow.geom.projection import project_points
    from rasterflow.sources.fixtures import geo_from_id

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        lat, lon = geo_from_id(ids)
        # float32 storage matches the reference's record width
        # (TaxiRecord.hpp:121-133)
        x, y, _ = project_points(lat, lon, dtype=np.float32)
        return pa.table({"id": ids, "x": x, "y": y})

    ray.data.range(n, override_num_blocks=max(64, NUM_CPUS * 8)).map_batches(
        gen, batch_format="pyarrow"
    ).write_parquet(POINTS_CACHE)
    done.write_text("ok")
    return POINTS_CACHE


def bench_join_only() -> dict:
    """Reference-protocol join benchmark: hybrid join over pre-ingested points.

    GRAFT_JOIN_NPOLYS=16384 selects the uniform synthetic many-small-polygons
    regime (mirrors `taxi-ooc-polygons.ps1`); default is the 260-polygon
    neighborhood-like layer."""
    import ray.data

    from rasterflow.pipelines.joins import aggregate_by_polygon
    from rasterflow.sources.fixtures import neigh_like_layer, synthetic_layer

    path = ensure_points(POINTS_N)
    npolys = int(os.environ.get("GRAFT_JOIN_NPOLYS", "260"))
    if npolys == 260:
        # realistic polygon complexity: real city/neighborhood polygons carry
        # 60-150 vertices (the fixture default of 8-40 understates PIP work)
        layer = neigh_like_layer(260, seed=42, nv_range=(60, 151))
    else:
        layer = synthetic_layer(npolys, seed=7)
    # build/warm the bundle outside the timed section (it is a per-cluster
    # one-time artifact, cached on disk)
    from rasterflow.state.bundle import build_bundle

    build_bundle(layer, accuracy_m=300.0)
    # min over iterations — the reference's measurement protocol (min over
    # --nIter runs, GLHandler.cpp:234-236)
    iters = int(os.environ.get("GRAFT_JOIN_ITERS", "3"))
    # GRAFT_JOIN_DTYPE=f32 selects the reference-conformant float32 kernel
    # plane (the reference's own arithmetic width) — halves PIP memory
    # traffic; f64 (default) is the oracle plane
    import numpy as np

    dtype = np.float32 if os.environ.get("GRAFT_JOIN_DTYPE") == "f32" else np.float64
    best = None
    n_rows = 0
    for _ in range(iters):
        t0 = time.perf_counter()
        pts = ray.data.read_parquet(path, columns=["x", "y"])
        out = aggregate_by_polygon(
            pts, layer, how="hybrid", accuracy_m=300.0, batch_size=None, sort=False, dtype=dtype
        )
        n_rows = len(out.to_pandas())
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return {"join_sec": round(best, 3), "pts_per_s": round(POINTS_N / best, 1), "n_polys_out": n_rows}


def run_scaling() -> dict:
    # N vs 4N parallelism levels (driver protocol: "e.g. 8 and 32, or N and
    # 4N CPUs").  Default 4 vs 16: this box is a single 32-core socket whose
    # memory bandwidth saturates above ~16 cores, so 8->32 understates what
    # added NODES (each with its own memory system) would deliver; 4->16
    # keeps both levels inside the bandwidth envelope.  Both pairs are
    # reported in BASELINE.md.
    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi_n = int(os.environ.get("GRAFT_SCALE_HI", "16"))

    def sub(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_JOIN_ONLY="1")
        out = subprocess.run(
            [sys.executable, __file__], env=env, capture_output=True, text=True, check=True
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # warm the points cache + OS page cache with one untimed run
    sub(lo_n)
    lo = sub(lo_n)
    hi = sub(hi_n)
    thr_lo = lo["pts_per_s"]
    thr_hi = hi["pts_per_s"]
    eff = (thr_hi / thr_lo) / (hi_n / lo_n)
    return {
        "canary_sec_lo": lo.get("canary_sec"),
        "canary_sec_hi": hi.get("canary_sec"),
        "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        f"join_sec_{lo_n}cpu": lo["join_sec"],
        f"join_sec_{hi_n}cpu": hi["join_sec"],
        f"pts_per_s_{lo_n}cpu": thr_lo,
        f"pts_per_s_{hi_n}cpu": thr_hi,
        "n_points": POINTS_N,
        "protocol": "hybrid join over pre-ingested points, min of 3 iterations (reference executeTime protocol)",
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
