"""Distributed k-means (Lloyd's algorithm) over an embedding column — the
iterative-workload representative: every iteration is ONE streaming pass
(broadcast centroids in, bounded partial statistics out), so the full
dataset never materializes and the per-iteration exchange is
``batches × k × d`` floats regardless of row count.

Shape per iteration:
- centroids ship once via ``ray.put`` (the broadcast-small-side rule);
- each batch computes its assignment with one matmul and collapses to a
  single row carrying (k, d) per-cluster vector sums + counts + inertia
  (the grouped-HLL/register pattern: fixed-size partials, not raw rows);
- the driver folds the tiny partial stream and recomputes centroids —
  an O(batches × k × d) reduce, the documented driver-side bound.

Deterministic: hash-uniform init sample (layout-independent, the IVF
sampling rule) + fixed iteration count.  Euclidean Lloyd's on the raw
vectors (use ``similarity`` ops for cosine-space work).

Approximate/iterative by design — no SQL oracle; pinned in pytest against
a driver-side numpy Lloyd's from the same init (assignments equal, inertia
monotone non-increasing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .similarity import _emb_matrix


def _init_centroids(ds, emb_col: str, id_col: str, k: int, sample_size: int, seed: int) -> np.ndarray:
    """Hash-threshold uniform sample (layout-independent), then pick the k
    sample rows with the smallest hash — deterministic under any
    partitioning."""
    from ..stages.texthash import mulrot_hash64

    def samp(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = mulrot_hash64(ids.astype(np.uint64) + np.uint64(seed))
        m = _emb_matrix(b, emb_col)
        order = np.argsort(h, kind="stable")[: min(sample_size, len(ids))]
        flat = m[order].astype(np.float32)
        # m is (0, d) even for an empty batch: the list size MUST stay d so
        # every block emits the same fixed_size_list<float, d> schema (a
        # size-0 list on empty blocks made the downstream sort fail)
        return pa.table(
            {
                "h": pa.array(h[order]),
                "vec": pa.FixedSizeListArray.from_arrays(pa.array(flat.ravel()), flat.shape[1]),
            }
        )

    t = ds.map_batches(samp, batch_format="pyarrow").sort("h").limit(sample_size).to_pandas()
    vecs = np.stack(t["vec"].to_numpy()) if len(t) else np.zeros((0, 0), dtype=np.float32)
    if len(vecs) < k:
        raise ValueError(f"need at least k={k} rows to init, got {len(vecs)}")
    # farthest-point traversal over the sample (deterministic k-means++-style
    # seeding): plain take-first-k seeds regularly drop a whole cluster into
    # a local optimum when two seeds land in one blob
    x = vecs.astype(np.float64)
    chosen = [0]  # the smallest-hash sample row
    d2 = ((x - x[0]) ** 2).sum(1)
    for _ in range(1, k):
        nxt = int(d2.argmax())
        chosen.append(nxt)
        d2 = np.minimum(d2, ((x - x[nxt]) ** 2).sum(1))
    return x[chosen]


def kmeans_fit(
    ds,
    k: int,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 10,
    sample_size: int = 4096,
    seed: int = 0,
) -> tuple[np.ndarray, float]:
    """Fit k centroids; returns (centroids (k, d) float64, final inertia)."""
    cent = _init_centroids(ds, emb_col, id_col, k, sample_size, seed)
    d = cent.shape[1]
    inertia = float("inf")
    for _ in range(iters):
        ref = ray.put(cent)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(ref)
            x = _emb_matrix(b, emb_col).astype(np.float64)
            # ||x-c||^2 argmin via the expanded form: one matmul per batch
            d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
            a = d2.argmin(axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "sums": pa.array([sums.ravel().tobytes()], type=pa.binary(k * d * 8)),
                    "cnt": pa.array([cnt.tobytes()], type=pa.binary(k * 8)),
                    "inertia": pa.array([float(d2[np.arange(len(a)), a].sum())], type=pa.float64()),
                }
            )

        sums = np.zeros((k, d))
        cnt = np.zeros(k, dtype=np.int64)
        inertia = 0.0
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            for s_blob, c_blob, ine in zip(
                b.column("sums").to_pylist(), b.column("cnt").to_pylist(), b.column("inertia").to_pylist()
            ):
                sums += np.frombuffer(s_blob, dtype=np.float64).reshape(k, d)
                cnt += np.frombuffer(c_blob, dtype=np.int64)
                inertia += ine
        nonempty = cnt > 0
        cent = np.where(nonempty[:, None], sums / np.maximum(cnt, 1)[:, None], cent)
    return cent, float(inertia)


def kmeans_assign(ds, centroids: np.ndarray, emb_col: str = "embedding", id_col: str = "vec_id"):
    """Assign every row to its nearest centroid: (id, cluster, dist2)."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = _emb_matrix(b, emb_col).astype(np.float64)
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        a = d2.argmin(axis=1)
        return pa.table(
            {
                id_col: b.column(id_col),
                "cluster": pa.array(a.astype(np.int32)),
                "dist2": pa.array(d2[np.arange(len(a)), a]),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def kmeans_cluster_sizes(ds, k: int, emb_col: str = "embedding", id_col: str = "vec_id", iters: int = 10, seed: int = 0):
    """Fit + per-cluster sizes: (cluster, n), sorted — the driver-query
    wrapper (rows-only: iterative/approximate by design)."""
    from ..util import grouped_aggregate

    cent, _ = kmeans_fit(ds, k, emb_col=emb_col, id_col=id_col, iters=iters, seed=seed)
    asg = kmeans_assign(ds, cent, emb_col=emb_col, id_col=id_col)

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["cluster"]).append_column("one", pa.array(np.ones(len(t), dtype=np.int64)))

    return grouped_aggregate(
        asg.map_batches(slim, batch_format="pyarrow"), "cluster", {"n": ("one", "sum")}, weight=0.125
    ).sort("cluster")
