"""Incremental exact dedup against a PERSISTED hash index — the
continuous-crawl shape: the corpus's content hashes live in a
hash-partitioned parquet layout built once and appended per delivery;
each new delta is checked against (and then added to) the index without
ever rereading corpus text.

Scale posture: the index stores two independent 64-bit content hashes per
document (the polynomial ``content_hash64`` and a keyed siphash via
``pandas.util.hash_array``) — 128 collision bits, so no text verify pass
is needed at query time (collision odds ~2^-128; the batch-mode
``exact_dedup(verify=True)`` remains the belt-and-braces variant).  A
delta probe broadcasts the DELTA's hash set (deliveries are small next to
the corpus), scans only the index partitions those hashes land in, and
ships back only the matched hashes — O(|delta|) exchange against a
corpus-sized index.

Reference analogue: the reference's persisted backend grid index
(GridIndexF.cpp:200-275) — build once, probe deltas — transposed from
spatial cells to content-hash buckets.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..util import coalesce_small, grouped_aggregate, shuffle_parts

_H2_KEY = "6543210987654321"


def _content_hashes(col) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit content hashes (stored as int64 bit patterns)."""
    from .dedup import content_hash64

    h1 = content_hash64(col).astype(np.int64)
    s = col.to_numpy(zero_copy_only=False) if isinstance(col, (pa.Array, pa.ChunkedArray)) else np.asarray(col, dtype=object)
    h2 = pd.util.hash_array(s, hash_key=_H2_KEY).astype(np.int64)
    return h1, h2


def _parts_of(h1: np.ndarray, num_parts: int) -> np.ndarray:
    return (h1.astype(np.uint64) % np.uint64(num_parts)).astype(np.int64)


def dedup_index_ingest(
    ds,
    index_dir: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int | None = None,
):
    """Build (or append a delivery to) the persisted content-hash index:
    ``index_dir/part=K/*.parquet`` with rows (h1, h2, id).  Appends add new
    uniquely-named fragments to the same partitions; ``num_parts`` is fixed
    by the first ingest (sidecar ``_meta.json``)."""
    meta_path = os.path.join(index_dir, "_meta.json")
    if os.path.exists(meta_path):
        num_parts = json.load(open(meta_path))["num_parts"]
    elif num_parts is None:
        num_parts = shuffle_parts(1.0)

    def hashes(b: pa.Table) -> pa.Table:
        h1, h2 = _content_hashes(b.column(content_col))
        return pa.table(
            {
                "h1": pa.array(h1),
                "h2": pa.array(h2),
                id_col: b.column(id_col),
                "part": pa.array(_parts_of(h1, num_parts).astype("U")),
            }
        )

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(hashes, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["part"]
    )
    if not os.path.exists(meta_path):
        json.dump({"num_parts": int(num_parts)}, open(meta_path, "w"))
    return index_dir


def incremental_dedup(
    new_ds,
    index_dir: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
):
    """Documents of ``new_ds`` that are new to the corpus: not in the
    persisted index, and the minimum id among any copies WITHIN the delta.
    Returns the surviving rows of ``new_ds`` (all its columns).  With
    ``append=True`` the survivors' hashes are added to the index, so the
    next delivery sees them."""
    num_parts = json.load(open(os.path.join(index_dir, "_meta.json")))["num_parts"]

    def hashes(b: pa.Table) -> pa.Table:
        h1, h2 = _content_hashes(b.column(content_col))
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2), id_col: b.column(id_col)})

    hashed = new_ds.map_batches(hashes, batch_format="pyarrow")
    # delta dedup: min id per (h1, h2) — deliveries are delta-sized
    delta = grouped_aggregate(
        coalesce_small(hashed, 0.25), ["h1", "h2"], {id_col: (id_col, "min")}, weight=0.25
    ).to_pandas()
    if delta.empty:  # empty delivery (Ray drops columns from all-empty results)
        return new_ds.sort(id_col)

    # broadcast the delta hash set; scan ONLY the partitions it lands in
    parts = sorted(set(_parts_of(delta["h1"].to_numpy(), num_parts)))
    paths = [
        f
        for x in parts
        for f in sorted(glob.glob(os.path.join(index_dir, f"part={x}", "*.parquet")))
    ]
    matched = pd.DataFrame({"h1": pd.Series(dtype=np.int64), "h2": pd.Series(dtype=np.int64)})
    if paths:
        # broadcast the delta's (h1, h2) frame once; each index batch joins
        # against it with one vectorized pandas merge (no per-row loop)
        probe = ray.put(delta[["h1", "h2"]])

        def probe_batch(t: pa.Table) -> pa.Table:
            want = ray.get(probe)
            m = t.to_pandas().merge(want, on=["h1", "h2"], how="inner")
            return pa.Table.from_pandas(m[["h1", "h2"]], preserve_index=False)

        idx = ray.data.read_parquet(paths, columns=["h1", "h2"])
        got = idx.map_batches(probe_batch, batch_format="pyarrow").to_pandas()
        if len(got):  # all-empty datasets come back column-less from Ray
            matched = got

    surv = delta.merge(matched.drop_duplicates(), on=["h1", "h2"], how="left", indicator=True)
    surv = surv[surv["_merge"] == "left_only"].drop(columns="_merge")
    keep_ids = ray.put(np.sort(surv[id_col].to_numpy()))

    def filter_new(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        mask = np.isin(ids, ray.get(keep_ids))
        return b.filter(pa.array(mask))

    out = new_ds.map_batches(filter_new, batch_format="pyarrow")
    if append and len(surv):
        import ray.data as rd

        add = rd.from_pandas(surv.assign(part=_parts_of(surv["h1"].to_numpy(), num_parts).astype("U")))
        add.write_parquet(index_dir, partition_cols=["part"])
    return out.sort(id_col)
