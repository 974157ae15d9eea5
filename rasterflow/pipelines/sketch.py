"""Mergeable sketches for cardinality and frequency at scale.

:func:`approx_count_distinct` — HyperLogLog (Flajolet et al. 2007, public
algorithm) expressed Ray-Data-natively: each batch collapses to ONE row
carrying its 2^p register array (a fixed-size binary blob), so the shuffle
volume is ``#batches × 2^p bytes`` regardless of input size; registers merge
by element-wise max (associative/commutative — any merge tree is correct);
the driver folds the tiny partial stream with ``iter_batches``.

Approximate by design (σ ≈ 1.04/√2^p ⇒ ~1.6% at p=12), so the driver records
a rows-only check; accuracy is pinned against the exact distinct count in
pytest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def bit_length64(v: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (0 -> 0): 6 halving steps."""
    bl = np.zeros(v.shape, dtype=np.int64)
    x = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    return bl + (x > 0)


def _rho(w: np.ndarray, bits: int) -> np.ndarray:
    """Position of the leftmost 1-bit within the low ``bits`` bits (1-based);
    all-zero suffix -> bits + 1 (the HLL rho function)."""
    mask = np.uint64((1 << bits) - 1) if bits < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
    suffix = w & mask
    return (bits - bit_length64(suffix) + 1).astype(np.int64)


class HllState:
    """p-bit HyperLogLog register bank with numpy merge/estimate."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rho = _rho(h, 64 - self.p).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge_registers(self, regs: np.ndarray) -> None:
        np.maximum(self.registers, regs, out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # linear counting, small range
        return float(e)


def approx_count_distinct(ds, col: str, p: int = 12):
    """HLL distinct estimate of ``col``.  Returns a 1-row Dataset
    ``(n_distinct_est,)`` (float64)."""
    # full-avalanche splitmix64: HLL's rho statistic needs every BIT
    # unbiased (the SQL-replicable mul-rot mixer's low bits are too
    # correlated for dense integer keys); this sketch is rows-only at the
    # driver, so SQL-replicability is not required
    from ..stages.texthash import mix64

    def partial(b: pa.Table) -> pa.Table:
        st = HllState(p)
        arr = b.column(col)
        if pa.types.is_integer(arr.type):
            vals = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
            h = mix64(vals)
        else:
            from ..pipelines.dedup import content_hash64

            h = content_hash64(arr)
        st.add_hashes(h)
        return pa.table(
            {"regs": pa.array([st.registers.tobytes()], type=pa.binary(st.m))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    final = HllState(p)
    for b in partials.iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in b.column("regs").to_pylist():
            final.merge_registers(np.frombuffer(blob, dtype=np.uint8))
    import ray.data

    return ray.data.from_arrow(
        pa.table({"n_distinct_est": pa.array([final.estimate()], type=pa.float64())})
    )


def heavy_hitters_sketch(
    ds,
    text_col: str = "text",
    k: int = 200,
    top: int = 20,
):
    """Misra-Gries heavy hitters over tokens (Misra & Gries 1982, public
    algorithm): top tokens with BOUNDED state — each batch compresses to at
    most ``k`` (token, weight) counters, so the shuffle carries
    ``k × batches`` rows no matter how many distinct tokens exist.  The
    scale path beside :func:`~rasterflow.pipelines.textstats.top_tokens`,
    whose exchange is corpus-vocabulary-sized (fine for word vocabularies,
    not for, e.g., trillion-distinct URL or n-gram keys).

    Per batch: one Arrow tokenize + ``value_counts``, then the MG decrement
    (subtract the (k+1)-th largest count from the survivors — the vectorized
    equivalent of the counter-eviction loop).  Summaries merge by grouped
    SUM, which preserves the MG guarantee additively: for every token,
    ``est <= true <= est + n/k`` where n is the total token count — so every
    token with true frequency above ``n/k`` is IN the result (no false
    negatives above the threshold; error bound returned with the result).

    Output: one row per reported token — ``(token, est, err_bound)`` — the
    ``top`` largest estimates, plus the bound so consumers can see the
    uncertainty.  Approximate by design: rows-only driver check; the
    guarantee is pinned in pytest against exact counts.
    """
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(b.column(text_col)))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        tok = vc.field("values").to_numpy(zero_copy_only=False)
        cnt = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.int64(len(toks))
        if len(cnt) > k:
            order = np.argsort(-cnt, kind="stable")[: k + 1]
            dec = cnt[order[-1]]
            keep = order[:k]
            tok, cnt = tok[keep], cnt[keep] - dec
            m = cnt > 0
            tok, cnt = tok[m], cnt[m]
        # one sentinel row per batch (empty token) carries the batch's token
        # total, so the global n for the error bound merges by the same sum
        return pa.table(
            {
                "token": pa.concat_arrays([pa.array(tok, type=pa.string()), pa.array([""])]),
                "est": pa.array(np.concatenate([cnt, [0]])),
                "n": pa.array(np.concatenate([np.zeros(len(tok), dtype=np.int64), [n]])),
            }
        )

    from ..util import coalesce_small, grouped_aggregate

    partials = coalesce_small(ds.map_batches(partial, batch_format="pyarrow"), 0.125)
    red = grouped_aggregate(partials, "token", {"est": ("est", "sum"), "n": ("n", "sum")})
    pdf = red.to_pandas()
    n_total = int(pdf["n"].sum())
    pdf = pdf[pdf["token"] != ""].sort_values(
        ["est", "token"], ascending=[False, True], kind="stable"
    ).head(top)
    err = n_total // k
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "token": pa.array(pdf["token"].to_numpy(), type=pa.string()),
                "est": pa.array(pdf["est"].to_numpy().astype(np.int64)),
                "err_bound": pa.array(np.full(len(pdf), err, dtype=np.int64)),
            }
        )
    )


def approx_count_distinct_grouped(ds, col: str, group_col: str, p: int = 10):
    """Per-group HLL distinct estimate — "distinct users per domain" at web
    scale, where an exact grouped nunique would shuffle every (group, value)
    pair.  Here each batch collapses to one 2^p-byte register row PER GROUP
    PRESENT IN THE BATCH, so the exchange is ``groups × batches × 2^p``
    bytes, independent of value cardinality; register banks merge by
    element-wise max inside one grouped pass.

    Output: (group, n_distinct_est float64), sorted by group.  Approximate
    by design (σ ≈ 1.04/√2^p ⇒ ~3.3% at p=10): rows-only at the driver,
    error pinned per group in pytest.
    """
    import pandas as pd

    from ..stages.texthash import mix64

    m = 1 << p

    def partial(b: pa.Table) -> pa.Table:
        arr = b.column(col)
        if pa.types.is_integer(arr.type):
            h = mix64(arr.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            from ..pipelines.dedup import content_hash64

            h = content_hash64(arr)
        codes, uniq = pd.factorize(
            pd.Series(b.column(group_col).to_numpy(zero_copy_only=False)), sort=False
        )
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rho = _rho(h, 64 - p).astype(np.uint8)
        regs = np.zeros(len(uniq) * m, dtype=np.uint8)
        np.maximum.at(regs, codes * m + idx, rho)
        regs = regs.reshape(len(uniq), m)
        return pa.table(
            {
                group_col: pa.array(list(uniq)),
                "regs": pa.array([r.tobytes() for r in regs], type=pa.binary(m)),
            }
        )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        st = HllState(p)
        banks = np.frombuffer(b"".join(g["regs"]), dtype=np.uint8).reshape(len(g), m)
        st.registers = banks.max(axis=0)
        return pd.DataFrame(
            {group_col: [g[group_col].iloc[0]], "n_distinct_est": [st.estimate()]}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return (
        partials.groupby(group_col)
        .map_groups(merge_group, batch_format="pandas")
        .sort(group_col)
    )


def _compress_cdf(values: np.ndarray, weights: np.ndarray, c: int) -> tuple[np.ndarray, np.ndarray]:
    """Compress a weighted empirical CDF to ≤ c+2 support points: keep exact
    min/max, take the remaining points at evenly spaced cumulative-weight
    ranks.  One sort; rank error introduced per compression ≤ W/c."""
    order = np.argsort(values, kind="stable")
    v, w = values[order], weights[order]
    cw = np.cumsum(w)
    total = cw[-1]
    if len(v) <= c + 2:
        return v, w
    targets = (np.arange(1, c + 1) / (c + 1)) * total
    idx = np.unique(np.searchsorted(cw, targets, side="left"))
    idx = idx[(idx > 0) & (idx < len(v) - 1)]
    keep = np.concatenate(([0], idx, [len(v) - 1]))
    # weight of each kept point = mass of its cumulative segment
    seg_cw = cw[keep]
    new_w = np.diff(np.concatenate(([0.0], seg_cw)))
    return v[keep], new_w


def quantile_sketch(ds, col: str, qs: tuple[float, ...] = (0.1, 0.5, 0.9, 0.99), compression: int = 512):
    """Mergeable one-pass approximate quantiles — the sketch-path sibling of
    the EXACT ``sampling.column_quantiles_select`` (O(log) passes): each
    batch compresses its values to ≤ compression+2 (value, weight) CDF
    points (min/max exact), the driver folds the bounded partial stream and
    re-compresses once, then reads quantiles off the merged CDF.

    Two compression levels ⇒ rank error ≈ 2/compression (≈0.4% at the 512
    default); approximate by design — rows-only at the driver, error pinned
    in pytest across distributions.  Returns (q, value) rows.
    """

    def partial(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        if len(v) == 0:
            return pa.table({"v": pa.array([], pa.float64()), "w": pa.array([], pa.float64())})
        cv, cw = _compress_cdf(v, np.ones(len(v)), compression)
        return pa.table({"v": pa.array(cv), "w": pa.array(cw)})

    vs, ws = [], []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        vs.append(b.column("v").to_numpy(zero_copy_only=False))
        ws.append(b.column("w").to_numpy(zero_copy_only=False))
    v = np.concatenate(vs) if vs else np.array([])
    w = np.concatenate(ws) if ws else np.array([])
    if len(v) == 0:
        raise ValueError("quantile_sketch over an empty column")
    v, w = _compress_cdf(v, w, 4 * compression)  # final merge keeps more points
    cw = np.cumsum(w)
    total = cw[-1]
    out_q, out_v = [], []
    for q in qs:
        i = int(np.searchsorted(cw, q * total, side="left"))
        out_q.append(float(q))
        out_v.append(float(v[min(i, len(v) - 1)]))
    import ray.data

    return ray.data.from_arrow(pa.table({"q": pa.array(out_q), "value": pa.array(out_v)}))
