"""Skew and scale-behavior tests (single-node evidence for SCALE.md claims)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rasterflow.geom.cells import Grid
from rasterflow.pipelines.cellagg import cell_histogram_grid
from rasterflow.pipelines.joins import aggregate_by_polygon
from rasterflow.sources.fixtures import tiny2_layer
from rasterflow.util import grouped_aggregate


def test_hot_cell_histogram(ray_session):
    """90% of points in ONE cell: partials stay bounded, counts exact."""
    import ray.data

    rng = np.random.default_rng(1)
    n = 200_000
    hot = rng.random(n) < 0.9
    x = np.where(hot, 0.5, rng.uniform(0, 100, n))
    y = np.where(hot, 0.5, rng.uniform(0, 100, n))
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y})).repartition(16)
    grid = Grid(0.0, 0.0, 1.0, 100, 100)
    out = cell_histogram_grid(ds, grid).to_pandas()
    # exact totals despite the hot key
    assert out["n"].sum() == n
    assert out.set_index("cell_id").loc[0, "n"] == ((x < 1) & (y < 1)).sum()


def test_hot_key_grouped_aggregate(ray_session):
    import ray.data

    rng = np.random.default_rng(2)
    n = 300_000
    keys = np.where(rng.random(n) < 0.95, 7, rng.integers(0, 1000, n))
    df = pd.DataFrame({"k": keys, "v": np.ones(n, dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(16)
    out = grouped_aggregate(ds, "k", {"n": ("v", "sum")}).to_pandas()
    assert out[out["k"] == 7]["n"].iloc[0] == (keys == 7).sum()
    assert out["n"].sum() == n


def test_join_partials_bounded_with_hot_cell(ray_session):
    """All points inside one polygon cell: join still exact, partial rows per
    batch ≤ npolys (the salting argument of SCALE.md §2)."""
    import ray.data

    layer = tiny2_layer()
    n = 100_000
    pts = pa.table(
        {
            "url": [f"u{i}" for i in range(n)],
            "x": np.full(n, 5.15),
            "y": np.full(n, 5.15),
        }
    )
    ds = ray.data.from_arrow(pts).repartition(8)
    out = aggregate_by_polygon(ds, layer, how="hybrid", cell_size=0.01).to_pandas()
    assert dict(zip(out["poly_id"], out["count"])) == {0: n}


def test_rollup_histogram(ray_session):
    import ray.data

    from rasterflow.pipelines.cellagg import cell_histogram_global, rollup_histogram
    from rasterflow.geom.cells import encode_cells
    from rasterflow.sources.fixtures import geo_from_id
    from rasterflow.geom.projection import project_points

    ids = np.arange(20000)
    lat, lon = geo_from_id(ids)
    x, y, _ = project_points(lat, lon)
    ds = ray.data.from_arrow(pa.table({"x": x, "y": y})).repartition(4)
    fine = cell_histogram_global(ds, res=12)
    coarse_direct = cell_histogram_global(ds, res=8).to_pandas()
    rolled = rollup_histogram(fine, 8).to_pandas()
    m = rolled.merge(coarse_direct, on="cell_id", suffixes=("_r", "_d"))
    assert len(m) == len(coarse_direct) == len(rolled)
    assert (m["n_r"] == m["n_d"]).all()


def test_aggregate_catalog(ray_session):
    import ray.data

    from rasterflow.pipelines.cellagg import aggregate_catalog
    from rasterflow.sources.fixtures import tiny2_layer
    from rasterflow.geom.polyio import rect_layer

    pts = pa.table({"x": np.array([5.15, 5.0, 5.0]), "y": np.array([5.15, 5.0, 5.0])})
    ds = ray.data.from_arrow(pts)
    catalog = {"tiny2": tiny2_layer(), "one": rect_layer("one", np.array([[4.0, 4.0, 6.0, 6.0]]))}
    out = aggregate_catalog(ds, catalog, how="index", cell_size=0.05)
    t2 = out["tiny2"].to_pandas()
    assert dict(zip(t2["poly_id"], t2["count"])) == {0: 1, 1: 2}
    one = out["one"].to_pandas()
    assert dict(zip(one["poly_id"], one["count"])) == {0: 3}


def test_pipeline_survives_task_failures(ray_session, tmp_path):
    """A crashed worker mid-pipeline is retried by Ray and the aggregate
    stays exact (SURVEY §4: stragglers/retries are free with idempotent
    partials)."""
    import ray.data

    from rasterflow.sources.fixtures import tiny2_layer
    from rasterflow.state.bundle import build_bundle
    from rasterflow.pipelines.joins import SpatialJoinAgg
    from rasterflow.util import grouped_aggregate

    flag = tmp_path / "failed_once"
    bundle = build_bundle(tiny2_layer(), cell_size=0.05)
    import ray as _ray

    ref = _ray.put(bundle)
    flag_path = str(flag)

    def flaky(batch):
        import os

        if not os.path.exists(flag_path):
            try:
                fd = os.open(flag_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                # simulate a node/worker crash (Ray retries system failures;
                # user exceptions are surfaced, not retried)
                os._exit(1)
            except FileExistsError:
                pass
        return SpatialJoinAgg(ref, "hybrid")(batch)

    n = 30000
    pts = pa.table({"x": np.full(n, 5.15), "y": np.full(n, 5.15)})
    ds = ray.data.from_arrow(pts).repartition(6)
    partials = ds.map_batches(flaky, batch_format="pyarrow")
    out = grouped_aggregate(partials, "poly_id", {"count": ("count", "sum")}).to_pandas()
    assert flag.exists()  # the failure really happened
    assert dict(zip(out["poly_id"], out["count"])) == {0: n}


def test_stage_metrics_parse(ray_session):
    import ray.data

    from rasterflow.metrics import stage_metrics

    ds = ray.data.range(10000).map_batches(lambda b: b, batch_format="pyarrow")
    ds.to_pandas()
    m = stage_metrics(ds)
    assert len(m) >= 1
    assert all("operator" in e and "wall_s" in e for e in m)


def test_streaming_group_sum_unit(ray_session):
    """Dense streaming reduce: multi-batch growth, int/float cols, ordering."""
    import ray.data

    from rasterflow.util import streaming_group_sum

    t1 = pa.table({"poly_id": pa.array([3, 1], type=pa.int32()),
                   "count": pa.array([2, 5], type=pa.int64()),
                   "sum": pa.array([1.5, 2.5])})
    t2 = pa.table({"poly_id": pa.array([100, 3], type=pa.int32()),
                   "count": pa.array([7, 1], type=pa.int64()),
                   "sum": pa.array([0.25, 4.0])})
    ds = ray.data.from_arrow([t1, t2])
    df, _ = streaming_group_sum(ds, "poly_id", ["count", "sum"], int_cols={"count"})
    assert df["poly_id"].tolist() == [1, 3, 100]
    assert df["count"].tolist() == [5, 3, 7]
    assert df["count"].dtype == np.int64
    np.testing.assert_allclose(df["sum"].to_numpy(), [2.5, 5.5, 0.25])


def test_large_layer_streaming_reduce(ray_session):
    """16384-polygon layer through the default (streaming driver) reduce:
    result identical to the distributed groupby reduce, driver memory O(npolys)
    (VERDICT r1 item 1 done-condition)."""
    import ray.data

    from rasterflow.geom.projection import project_points
    from rasterflow.sources.fixtures import geo_from_id, synthetic_layer
    from rasterflow.state.bundle import build_bundle

    layer = synthetic_layer(16384, seed=7)
    bundle = build_bundle(layer, accuracy_m=300.0)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        lat, lon = geo_from_id(ids)
        x, y, _ = project_points(lat, lon)
        return pa.table({"x": x, "y": y})

    pts = ray.data.range(60_000, override_num_blocks=16).map_batches(gen, batch_format="pyarrow")
    a = aggregate_by_polygon(pts, bundle, how="hybrid", batch_size=4096).to_pandas()
    b = (
        aggregate_by_polygon(pts, bundle, how="hybrid", batch_size=4096, reduce="distributed")
        .to_pandas()
        .sort_values("poly_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a.astype({"poly_id": "int64", "count": "int64"}),
        b.astype({"poly_id": "int64", "count": "int64"}),
        check_dtype=False,
    )


def test_worker_memo_and_put_cache(ray_session):
    """Per-worker memo returns the same object for the same key; driver-side
    ray.put memo reuses one plasma ref per bundle object."""
    import ray

    from rasterflow.pipelines import joins as J
    from rasterflow.sources.fixtures import tiny2_layer
    from rasterflow.state.bundle import build_bundle

    calls = []
    a = J._memo(("t", 1), lambda: calls.append(1) or object())
    b = J._memo(("t", 1), lambda: calls.append(1) or object())
    assert a is b and len(calls) == 1
    bundle = build_bundle(tiny2_layer(), cell_size=0.05)
    r1 = J._bundle_ref(bundle, None, None, 0)
    r2 = J._bundle_ref(bundle, None, None, 0)
    assert isinstance(r1, ray.ObjectRef) and r1 == r2
