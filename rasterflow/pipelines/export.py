"""Training-data export: deterministic hash-sharded parquet layout.

The last step of a curation pipeline — ship the kept documents as N
balanced shards whose assignment AND within-shard order are pure functions
of the row id (``mulrot_hash64``, the SQL-replicable mixer shared with
``sampling.split_assign``):

- ``shard = hash(id) % N`` balances shards regardless of how the input was
  clustered (crawl order, domain order), because the hash decorrelates ids.
- within a shard, rows are ordered by ``(hash, id)`` — a deterministic
  global shuffle, so a training loader reading a shard sequentially sees
  decorrelated documents without a runtime shuffle buffer.
- every shard is an independent ``shard=K`` hive directory, and the whole
  layout is a pure function of the input — a rerun after a failure is
  IDEMPOTENT (same bytes, so consumers can restart per shard), though this
  one-pass writer itself re-sorts everything; input-partitioned resumable
  writes (skip finished work units) are the ``state/lineage.py`` +
  ``run_job`` flow.

One all-to-all (the sort) — the irreducible cost of a global shuffle; the
payload columns ride the sort once and are never driver-materialized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _shard_cols(ids: np.ndarray, num_shards: int) -> tuple[np.ndarray, np.ndarray]:
    """Integer ids use the SQL-replicable mulrot mixer (the oracle plane);
    string ids (urls) hash through pandas' keyed 64-bit string hash."""
    if np.issubdtype(ids.dtype, np.integer):
        from ..stages.texthash import mulrot_hash64

        with np.errstate(over="ignore"):
            h = mulrot_hash64(ids.astype(np.uint64))
    else:
        h = pd.util.hash_array(ids, hash_key="0123456789123456")
    return (h % np.uint64(num_shards)).astype(np.int64), h


def export_shards(
    ds,
    out_dir: str,
    num_shards: int,
    id_col: str = "doc_id",
):
    """Write ``ds`` as ``out_dir/shard=K/*.parquet`` in deterministic
    ``(hash, id)`` order within each shard.  Returns ``out_dir``."""

    def assign(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        shard, h = _shard_cols(ids, num_shards)
        return b.append_column("shard", pa.array(shard)).append_column(
            "h", pa.array(h, type=pa.uint64())
        )

    (
        ds.map_batches(assign, batch_format="pyarrow")
        .sort(["shard", "h", id_col])
        .write_parquet(out_dir, partition_cols=["shard"])
    )
    return out_dir


def shard_manifest(
    ds,
    num_shards: int,
    id_col: str = "doc_id",
    sum_col: str | None = None,
):
    """The export's verification manifest WITHOUT writing files:
    per shard -> (shard, n_docs[, sum_<sum_col>], first_doc, last_doc) where
    first/last are the ids at the (hash, id) order endpoints.

    Only (id, hash[, sum_col]) travel; the reduce is manifest-sized (one
    row per shard).  ``export_shards`` + ``shard_manifest`` over the same
    input agree by construction (same hash, same order rule)."""

    sum_out = f"sum_{sum_col}" if sum_col else None

    def slim(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        shard, h = _shard_cols(ids, num_shards)
        cols = {
            "shard": pa.array(shard),
            id_col: b.column(id_col),
            "h": pa.array(h, type=pa.uint64()),
        }
        if sum_col:
            cols[sum_col] = b.column(sum_col)
        return pa.table(cols)

    def manifest_row(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col], kind="stable")
        row = {
            "shard": [int(g["shard"].iloc[0])],
            "n_docs": [len(g)],
            "first_doc": [g[id_col].iloc[0]],
            "last_doc": [g[id_col].iloc[-1]],
        }
        if sum_col:
            row[sum_out] = [int(g[sum_col].sum())]
        order = ["shard", "n_docs"] + ([sum_out] if sum_col else []) + ["first_doc", "last_doc"]
        return pd.DataFrame(row)[order]

    slimmed = ds.map_batches(slim, batch_format="pyarrow")
    return slimmed.groupby("shard").map_groups(manifest_row, batch_format="pandas").sort("shard")
