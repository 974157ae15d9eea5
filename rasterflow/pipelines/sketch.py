"""Mergeable sketches for cardinality at scale.

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
