"""k-nearest-neighbour search over point datasets (J6 analogue).

The reference ships the cell-ring-expansion primitive
(``GridIndexF::getRegionPt``, ``CPUJoin/GridIndexF.cpp:177-198``: scan a
(2cx+1)x(2cy+1) cell neighborhood of the query) but never wires it to a CLI;
the north rule asks for kNN via cell-ring expansion as a first-class operator.

Two implementations:

- :func:`knn_brute` — fully streaming Ray Data pipeline: each batch computes
  distances to the (broadcast) query set, keeps a per-batch top-k partial, and
  a tiny ``groupby(query_id).map_groups`` reduce merges partials.  Scales to
  arbitrary point counts (nothing materializes beyond Q×k rows per batch).
- :func:`knn_cell_ring` — sharded stateful index: the point set is split
  across ``num_shards`` grid-index actors (``@ray.remote``; the Dataset API
  cannot express a reusable point index, SURVEY.md §2.4 J6).  Each shard
  answers queries by expanding Chebyshev cell rings r=0,1,2,… until the kth
  distance is ≤ r·cell (so no unvisited cell can contain a closer point);
  shard partials are merged on the driver.  At cluster scale the shards hold
  disjoint spatial partitions (partition key: coarse cell id) so each query
  touches only nearby shards.

Distance = Euclidean in the point plane, computed as
``sqrt(dx*dx + dy*dy)`` (same expression shape as the SQL oracle).
Ties break deterministically by (dist, id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def _topk_partial(qx, qy, x, y, ids, k):
    """Per-batch top-k rows for each query; returns (query_id, id, dist)."""
    out_q, out_i, out_d = [], [], []
    for qi in range(len(qx)):
        dx = x - qx[qi]
        dy = y - qy[qi]
        d = np.sqrt(dx * dx + dy * dy)
        if len(d) > k:
            idx = np.argpartition(d, k)[:k]
        else:
            idx = np.arange(len(d))
        out_q.append(np.full(len(idx), qi, dtype=np.int32))
        out_i.append(ids[idx])
        out_d.append(d[idx])
    return (
        np.concatenate(out_q) if out_q else np.empty(0, np.int32),
        np.concatenate(out_i) if out_i else np.empty(0, np.int64),
        np.concatenate(out_d) if out_d else np.empty(0, np.float64),
    )


def knn_brute(points_ds, queries_xy: np.ndarray, k: int, id_col: str = "doc_id"):
    """Streaming exact kNN: per-batch partial top-k + per-query merge.

    ``queries_xy``: (Q, 2) array.  Output: ``(query_id, {id_col}, dist)``,
    k rows per query, sorted by (query_id, dist, id).
    """
    q = np.ascontiguousarray(np.asarray(queries_xy, dtype=np.float64))

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        y = batch.column("y").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        qi, ii, dd = _topk_partial(q[:, 0], q[:, 1], x, y, ids, k)
        return pa.table({"query_id": qi, id_col: ii, "dist": dd})

    from ..util import coalesce_small

    partials = coalesce_small(points_ds.map_batches(partial, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dist", id_col]).head(k)
        return g

    out = partials.groupby("query_id").map_groups(merge, batch_format="pandas")
    return out.sort(["query_id", "dist", id_col])


@ray.remote
class KnnShardActor:
    """One spatial shard: a grid index over its points + ring-expansion kNN."""

    def __init__(self, blocks: list, id_col: str, cell: float):
        if blocks and isinstance(blocks[0], ray.ObjectRef):
            blocks = ray.get(list(blocks))
        tables = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b]) for b in blocks]
        t = pa.concat_tables(tables) if tables else None
        if t is None or len(t) == 0:
            self.n = 0
            return
        self.x = t.column("x").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        self.y = t.column("y").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        self.ids = t.column(id_col).to_numpy(zero_copy_only=False)
        self.n = len(self.x)
        self.cell = float(cell)
        ix = np.floor(self.x / self.cell).astype(np.int64)
        iy = np.floor(self.y / self.cell).astype(np.int64)
        # normalize to a compact local grid
        self.ix0 = int(ix.min())
        self.iy0 = int(iy.min())
        ix -= self.ix0
        iy -= self.iy0
        self.nx = int(ix.max()) + 1
        self.ny = int(iy.max()) + 1
        lin = iy * self.nx + ix
        order = np.argsort(lin, kind="stable")
        self.order = order
        slin = lin[order]
        self.cells, starts = np.unique(slin, return_index=True)
        self.starts = starts
        self.ends = np.concatenate((starts[1:], [self.n]))

    def _cell_points(self, cix: np.ndarray, ciy: np.ndarray) -> np.ndarray:
        ok = (cix >= 0) & (cix < self.nx) & (ciy >= 0) & (ciy < self.ny)
        lin = ciy[ok] * self.nx + cix[ok]
        pos = np.searchsorted(self.cells, lin)
        pos = np.clip(pos, 0, len(self.cells) - 1)
        hit = self.cells[pos] == lin
        segs = [
            self.order[self.starts[p] : self.ends[p]] for p in pos[hit]
        ]
        return np.concatenate(segs) if segs else np.empty(0, dtype=np.int64)

    def query(self, qxy: np.ndarray, k: int):
        """Ring-expansion kNN within this shard; returns per-query
        (ids, dists) arrays of ≤k candidates."""
        res_ids, res_d = [], []
        if self.n == 0:
            for _ in range(len(qxy)):
                res_ids.append(np.empty(0, dtype=np.int64))
                res_d.append(np.empty(0, dtype=np.float64))
            return res_ids, res_d
        for qx, qy in qxy:
            cqx = int(np.floor(qx / self.cell)) - self.ix0
            cqy = int(np.floor(qy / self.cell)) - self.iy0
            # rings below the Chebyshev distance to the grid rect are empty;
            # rings beyond the far corner cover everything
            dx_lo = max(0 - cqx, cqx - (self.nx - 1), 0)
            dy_lo = max(0 - cqy, cqy - (self.ny - 1), 0)
            first_ring = max(dx_lo, dy_lo)
            max_ring = max(abs(cqx), abs(cqx - (self.nx - 1))) + max(
                abs(cqy), abs(cqy - (self.ny - 1))
            )
            got_idx: list[np.ndarray] = []
            best_d = np.empty(0, dtype=np.float64)
            best_i = np.empty(0, dtype=np.int64)
            found_all = False
            r = first_ring
            while r <= max_ring + 1 and not found_all:
                # cells at Chebyshev distance exactly r
                if r == 0:
                    cix = np.array([cqx])
                    ciy = np.array([cqy])
                else:
                    side = np.arange(-r, r + 1)
                    top = np.stack([side, np.full_like(side, r)], axis=1)
                    bot = np.stack([side, np.full_like(side, -r)], axis=1)
                    mid = np.arange(-r + 1, r)
                    left = np.stack([np.full_like(mid, -r), mid], axis=1)
                    right = np.stack([np.full_like(mid, r), mid], axis=1)
                    ring = np.concatenate([top, bot, left, right])
                    cix = cqx + ring[:, 0]
                    ciy = cqy + ring[:, 1]
                idx = self._cell_points(cix, ciy)
                if len(idx):
                    got_idx.append(idx)
                    allidx = np.concatenate(got_idx)
                    dx = self.x[allidx] - qx
                    dy = self.y[allidx] - qy
                    d = np.sqrt(dx * dx + dy * dy)
                    order = np.lexsort((self.ids[allidx], d))[:k]
                    best_d = d[order]
                    best_i = self.ids[allidx][order]
                    found_all = len(allidx) >= self.n
                # stopping rule: any cell at ring r+1 is at distance ≥ r*cell
                if len(best_d) >= min(k, self.n) and (
                    len(best_d) >= k and best_d[k - 1] <= r * self.cell or found_all
                ):
                    break
                r += 1
            res_ids.append(best_i)
            res_d.append(best_d)
        return res_ids, res_d


def knn_cell_ring(
    points_ds,
    queries_xy: np.ndarray,
    k: int,
    cell: float,
    id_col: str = "doc_id",
    num_shards: int = 4,
):
    """Exact kNN via sharded grid-index actors with cell-ring expansion.

    Materializes only the narrow (id, x, y) columns into the shard actors —
    the index-build step (the analogue of the reference's persisted CPU grid
    index, ``GridIndexF.cpp:200-275``).  Results match :func:`knn_brute`
    exactly (same distance expression and tie-break).
    """
    q = np.ascontiguousarray(np.asarray(queries_xy, dtype=np.float64))
    narrow = points_ds.select_columns([id_col, "x", "y"])
    refs = narrow.to_arrow_refs()
    groups: list[list] = [[] for _ in range(num_shards)]
    for i, r in enumerate(refs):
        groups[i % num_shards].append(r)
    actors = [
        KnnShardActor.remote([b for b in grp], id_col, cell) if grp else None
        for grp in groups
    ]
    futures = [a.query.remote(q, k) for a in actors if a is not None]
    results = ray.get(futures)
    rows_q, rows_i, rows_d = [], [], []
    for qi in range(len(q)):
        all_i = np.concatenate([res[0][qi] for res in results])
        all_d = np.concatenate([res[1][qi] for res in results])
        order = np.lexsort((all_i, all_d))[:k]
        rows_q.append(np.full(len(order), qi, dtype=np.int32))
        rows_i.append(all_i[order])
        rows_d.append(all_d[order])
    return pa.table(
        {
            "query_id": np.concatenate(rows_q),
            id_col: np.concatenate(rows_i),
            "dist": np.concatenate(rows_d),
        }
    )
