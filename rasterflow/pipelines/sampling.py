"""Deterministic sampling / split assignment and exact column quantiles.

Training-data pipeline primitives:

- :func:`split_assign` — stable train/val/test assignment as a pure function
  of the row id (hash-bucket, not RNG): identical across runs, cluster sizes
  and repartitioning, which is the property a dataset split must have.  The
  mixer is :func:`rasterflow.stages.texthash.mulrot_hash64`, chosen because
  every step is ANSI-SQL-expressible, so the driver oracle verifies the
  assignment bit-for-bit.
- :func:`column_quantiles` — EXACT quantiles of a discrete/integer column via
  a value histogram: per-batch ``value_counts`` partials (only distinct
  values cross the shuffle), grouped sum, then an O(#distinct) driver
  cumulative.  Scale assumption: the column's distinct-value count is
  bounded (lengths, counts, scores in fixed ranges) — for unbounded
  continuous columns pre-bucket first.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import coalesce_small, grouped_aggregate


def split_assign(
    ds,
    id_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
    seed: int = 0,
):
    """Adds a ``split`` column: test if bucket < test_pct, val if bucket <
    test_pct+val_pct, else train, with bucket = mulrot_hash64(id + seed) % 100.

    Ids are assumed non-negative (the SQL oracle replica computes the hash on
    HUGEINT, which matches uint64 wraparound only for non-negative inputs).
    """
    from ..stages.texthash import mulrot_hash64

    def f(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            bucket = (mulrot_hash64(ids.astype(np.uint64) + np.uint64(seed)) % np.uint64(100)).astype(
                np.int64
            )
        split = np.where(
            bucket < test_pct, "test", np.where(bucket < test_pct + val_pct, "val", "train")
        )
        return pa.table(
            {
                id_col: b.column(id_col),
                "bucket": pa.array(bucket),
                "split": pa.array(split.tolist(), type=pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def column_quantiles(ds, col: str, qs: tuple[float, ...] = (0.1, 0.5, 0.9, 0.99)):
    """Exact quantiles: smallest v with cumulative count ≥ ceil(q·n).

    Output ``(q, value)`` sorted by q — the explicit-rank definition both
    this and the SQL oracle compute, so no quantile-convention ambiguity.
    """

    def partial(b: pa.Table) -> pa.Table:
        vc = b.column(col).combine_chunks().value_counts() if isinstance(
            b.column(col), pa.ChunkedArray
        ) else b.column(col).value_counts()
        return pa.table(
            {"v": vc.field("values"), "cnt": pc.cast(vc.field("counts"), pa.int64())}
        )

    red = grouped_aggregate(
        coalesce_small(ds.map_batches(partial, batch_format="pyarrow"), 4),
        "v",
        {"cnt": ("cnt", "sum")},
    )
    pdf = red.to_pandas().sort_values("v").reset_index(drop=True)
    cum = pdf["cnt"].cumsum().to_numpy()
    vals = pdf["v"].to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, math.ceil(q * float(n)))
        i = int(np.searchsorted(cum, rank))
        out_q.append(float(q))
        out_v.append(vals[min(i, len(vals) - 1)] if len(vals) else None)
    import ray.data

    return ray.data.from_arrow(
        pa.table({"q": pa.array(out_q, type=pa.float64()), "value": pa.array(out_v)})
    )


def top_k_per_group(ds, group_col: str, score_col: str, k: int, id_col: str = "doc_id"):
    """Per-group top-k rows by score — the data-curation "keep the best N
    documents per language/source" selection.

    ``groupby(group).map_groups`` with a vectorized per-group sort; ties
    break deterministically by (score desc, id asc) so the result is stable
    under any partitioning and matches the SQL window oracle.  Scale note:
    one group must fit one task (standard for bounded group counts like
    language or source); per-group partial top-k + re-merge is the upgrade
    for giant groups.
    """
    import pandas as pd

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([score_col, id_col], ascending=[False, True]).head(k)
        return g[[group_col, id_col, score_col]]

    return ds.groupby(group_col).map_groups(per_group, batch_format="pandas").sort(
        [group_col, id_col]
    )
