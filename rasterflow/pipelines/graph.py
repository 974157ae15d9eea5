"""Graph analytics over the duplicate graph — fixed-point PageRank.

The near-dup pair ops (``dedup.ngram_jaccard_pairs`` etc.) emit an edge list;
``neardup_clusters`` already runs distributed connected components over it.
PageRank is the next classic graph pass a curation pipeline runs on that
graph (score documents by dup-cluster centrality, e.g. to pick the canonical
representative).

**Fixed-point arithmetic makes the iteration bit-exact and SQL-replicable** —
the novelty here versus a textbook float PageRank.  All quantities are int64:

    N        = #nodes,  pr_0(v) = scale // N
    base     = ((damp_den - damp_num) * (scale // N)) // damp_den
    pr_{i+1}(v) = base + (damp_num * Σ_{u→v} (pr_i(u) // deg(u))) // damp_den

Integer sums are order-independent, so the result is identical under any
partitioning, block size, or worker count — and an unrolled DuckDB CTE chain
reproduces it hash-exactly (float PageRank would be neither).

Scale plan (per iteration): the pr vector is a driver/broadcast array over
the GRAPH's nodes — the dup graph is output-sized (pairs above threshold),
orders of magnitude smaller than the corpus; this is the same
node-table-fits-a-node posture as ``neardup_clusters``'s star rounds and is
asserted (``max_nodes``).  Edges are materialized ONCE and never reshuffled:
each edge block computes its local per-target contribution sums
(sort+reduceat), and only those collapsed (node, contrib) partials — ≤ nodes
per block — cross the one hash exchange per iteration.  Beyond ~10^8 nodes,
switch to a co-partitioned pr⋈edges hash join per iteration (the standard
Pregel layout); not implemented because the node table would first have to
exceed cluster DRAM.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..util import coalesce_small, grouped_aggregate


def pagerank_fixed(
    edges_ds,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iters: int = 5,
    scale: int = 10**9,
    damp_num: int = 85,
    damp_den: int = 100,
    directed: bool = False,
    max_nodes: int = 50_000_000,
):
    """Fixed-point PageRank over an edge-list Dataset.

    Returns a Dataset ``(doc_id, pr)`` (int64, sorted by doc_id) after
    ``iters`` synchronous iterations.  ``directed=False`` symmetrizes the
    input pairs first (the dup graph is undirected).
    """
    import ray
    import ray.data

    # materialize the edge list once — the iteration re-reads it `iters`
    # times and must not re-execute the upstream pair pipeline each pass
    edges = edges_ds.select_columns([id_a, id_b]).materialize()

    def syms(b: pa.Table) -> pa.Table:
        u = b.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        v = b.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        if directed:
            return pa.table({"u": u, "v": v})
        return pa.table({"u": np.concatenate([u, v]), "v": np.concatenate([v, u])})

    ed = edges.map_batches(syms, batch_format="pyarrow").materialize()
    if ed.count() == 0:
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "pr": pa.array([], pa.int64())})
        )

    # node table + out-degree (one exchange of per-block collapsed partials);
    # target endpoints are emitted with d=0 so directed sinks stay in the
    # node table (they receive rank but never contribute)
    def deg_partial(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        uu, cc = np.unique(u, return_counts=True)
        vv = np.unique(v)
        return pa.table(
            {
                "u": np.concatenate([uu, vv]),
                "d": np.concatenate([cc.astype(np.int64), np.zeros(len(vv), np.int64)]),
            }
        )

    deg_df = (
        grouped_aggregate(
            coalesce_small(ed.map_batches(deg_partial, batch_format="pyarrow"), 0.25),
            "u",
            {"d": ("d", "sum")},
        )
        .sort("u")
        .to_pandas()
    )
    nodes = deg_df["u"].to_numpy().astype(np.int64)
    deg = deg_df["d"].to_numpy().astype(np.int64)
    n = len(nodes)
    if n > max_nodes:
        raise ValueError(
            f"dup graph has {n} nodes > max_nodes={max_nodes}; use a "
            "co-partitioned pr-join formulation beyond broadcast scale"
        )
    base = ((damp_den - damp_num) * (scale // n)) // damp_den
    pr = np.full(n, scale // n, dtype=np.int64)

    for _ in range(iters):
        # broadcast (nodes, share) once per iteration; share = pr // deg
        # (sinks have deg 0 and are never looked up on the u side — their
        # share is forced to 0 so the division stays defined)
        share = np.where(deg > 0, pr // np.maximum(deg, 1), 0)
        share_ref = ray.put((nodes, share))

        def contrib(b: pa.Table, _ref=share_ref) -> pa.Table:
            nd, sh = ray.get(_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            c = sh[np.searchsorted(nd, u)]
            order = np.argsort(v, kind="stable")
            vs, cs = v[order], c[order]
            uniq, starts = np.unique(vs, return_index=True)
            sums = np.add.reduceat(cs, starts) if len(vs) else np.empty(0, np.int64)
            return pa.table({"v": uniq, "c": sums.astype(np.int64)})

        red = (
            grouped_aggregate(
                coalesce_small(ed.map_batches(contrib, batch_format="pyarrow"), 0.25),
                "v",
                {"c": ("c", "sum")},
            )
            .sort("v")
            .to_pandas()
        )
        csum = np.zeros(n, dtype=np.int64)
        csum[np.searchsorted(nodes, red["v"].to_numpy())] = red["c"].to_numpy()
        pr = base + (damp_num * csum) // damp_den

    return ray.data.from_arrow(pa.table({"doc_id": nodes, "pr": pr}))


def triangle_counts(pairs_ds, id_a: str = "id_a", id_b: str = "id_b", sort: bool = True):
    """Per-node triangle counts over an undirected edge list — the local
    clustering signal of graph analytics (dense dup cliques / co-location
    triangles score high).

    The standard two-join plan, composed entirely from the repo's relational
    operators: canonicalize edges to ``lo < hi``; wedge-join ``(a,b) ⋈ (b,c)``
    on the shared middle (each triangle ``a<b<c`` is built exactly once); then
    a Bloom-broadcast SEMI join of the wedge's ``(a,c)`` closing key against
    the edge set (exact verify pass).  Each confirmed triangle scatters one
    count to each corner; per-node totals collapse in one exchange.  No step
    materializes on the driver; wedge volume is Σ_b deg²(b) — the usual
    skew caveat, mitigated upstream by whatever bucketing produced the pairs.

    Returns ``(doc_id, n_tri)`` for nodes in ≥1 triangle.
    """
    import pyarrow as pa

    from ..util import coalesce_small, grouped_aggregate
    from .relational import bloom_semi_join, hash_join

    K = np.int64(1) << np.int64(32)

    def canon(t: pa.Table) -> pa.Table:
        a = t.column(id_a).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = t.column(id_b).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table({"lo": pa.array(lo), "hi": pa.array(hi), "ek": pa.array(lo * K + hi)})

    # four downstream consumers (two wedge maps + Bloom build + exact-verify
    # distinct) — materialize once or the upstream pair shuffle re-runs 4x
    edges = pairs_ds.map_batches(canon, batch_format="pyarrow").materialize()
    left = edges.map_batches(
        lambda t: pa.table({"a": t.column("lo"), "m": t.column("hi")}), batch_format="pyarrow"
    )
    right = edges.map_batches(
        lambda t: pa.table({"m": t.column("lo"), "c": t.column("hi")}), batch_format="pyarrow"
    )
    wedges = hash_join(left, right, on="m", left_cols=["a"], right_cols=["c"])

    def closing_key(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        return t.append_column("ek", pa.array(a * K + c))

    keyed = wedges.map_batches(closing_key, batch_format="pyarrow")
    tris = bloom_semi_join(keyed, edges, on="ek", left_cols=["a", "m", "c"], exact=True)

    def corners(t: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [t.column(c).to_numpy(zero_copy_only=False) for c in ("a", "m", "c")]
        ) if len(t) else np.empty(0, np.int64)
        uniq, counts = np.unique(ids, return_counts=True)
        return pa.table({"doc_id": pa.array(uniq.astype(np.int64)), "n_tri": pa.array(counts.astype(np.int64))})

    partials = coalesce_small(tris.map_batches(corners, batch_format="pyarrow"), 0.25)
    out = grouped_aggregate(partials, "doc_id", {"n_tri": ("n_tri", "sum")})
    return out.sort("doc_id") if sort else out
