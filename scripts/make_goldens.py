"""Generate the frozen golden conformance fixtures (FIXTURES.md §3).

Run ONCE (outputs are committed); tests/test_golden.py replays the pipelines
and asserts byte/value identity. Regenerating goldens is a semantic change
and must be deliberate.
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden"
N = 5000


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rasterflow.pipelines.joins import aggregate_by_polygon, spatial_join
    from rasterflow.pipelines.knn import knn_brute
    from rasterflow.sources.csvout import write_agg_csv
    from rasterflow.sources.fixtures import neigh_like_layer, pages_dataset
    from rasterflow.stages.geocode import prepare_points

    GOLDEN.mkdir(parents=True, exist_ok=True)
    ds = pages_dataset(N, override_num_blocks=8)
    pts = prepare_points(ds, geocoder="url", dtype=np.float64)
    layer = neigh_like_layer(40, seed=42)

    # per-url text sha256 (byte-identity invariant)
    pdf = ds.to_pandas()[["url", "text"]]
    pdf["sha256"] = [hashlib.sha256(t.encode()).hexdigest() for t in pdf["text"]]
    pdf[["url", "sha256"]].sort_values("url").to_parquet(GOLDEN / "text_sha256.parquet", index=False)

    # exact + raster agg CSVs (accuracy-protocol artifact shape)
    exact = aggregate_by_polygon(pts, layer, how="index").to_pandas()
    write_agg_csv(exact, GOLDEN, layer.npolys, 1341128000, 0)
    for eps in (400, 100):
        r = aggregate_by_polygon(pts, layer, how="raster", accuracy_m=float(eps)).to_pandas()
        write_agg_csv(r, GOLDEN, layer.npolys, 1341128000, eps)

    # exact join rows
    rows = spatial_join(pts, layer, how="index", id_col="url").to_pandas()
    rows.sort_values(["poly_id", "url"]).reset_index(drop=True).to_parquet(
        GOLDEN / "join_rows_neigh40.parquet", index=False
    )

    # knn oracle
    q = np.array([[0.0, 0.0], [1e6, -2e6], [-3e6, 1e6]])
    knn = knn_brute(pts, q, 7, id_col="url").to_pandas()
    knn.reset_index(drop=True).to_parquet(GOLDEN / "knn_neigh.parquet", index=False)

    ray.shutdown()
    print("goldens written to", GOLDEN)


if __name__ == "__main__":
    main()
