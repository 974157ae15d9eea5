"""Vectorized text-hashing primitives shared by the dedup / textstats kernels.

Everything operates on the **flat UTF-8 buffer** of an Arrow string column —
one numpy pass over all bytes of the batch, zero Python per-row loops (the
round-1 per-doc loops were the slowest operators on the bench).

The workhorse is a mod-2^64 polynomial (Rabin–Karp) prefix hash.  With an odd
base P, P is invertible mod 2^64, so the hash of ANY byte range ``[s, e)`` of
the flat buffer,

    H(s, e) = sum_{t=s..e-1} b_t * P^(e-1-t)
            = P^(e-1) * (C[e] - C[s]),   C[i] = sum_{t<i} b_t * P^(-t)

falls out of two cumulative arrays — O(1) per window / token / document after
one vectorized pass.  uint64 wraparound does all modular arithmetic for free.

Derived vectorized kernels:

- :meth:`PrefixHash.range_hashes` — substring hashes for arbitrary ranges.
- :func:`doc_hashes` — whole-document content hash (length-aware: the FNV
  offset seed times P^n is added, so strings differing only by trailing NULs
  still separate).  Shared by ``fingerprint`` and ``exact_dedup``.
- :func:`window_hashes` — all char-k-gram (shingle) hashes per document
  (MinHash input); docs shorter than k contribute their whole-doc hash.
- :func:`token_hashes` — whitespace-token hashes + token→doc assignment
  (SimHash / word-n-gram input); tokenization matches ``str.split()``.
- :func:`ngram_hashes` — per-doc **sorted unique** word-n-gram hashes.

np.seterr: numpy warns on uint64 overflow in some paths; all wraparound here
is intentional, so the kernels run under ``np.errstate(over="ignore")``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

P = np.uint64(1099511628211)  # FNV-1a 64 prime
PINV = np.uint64(pow(1099511628211, -1, 1 << 64))
OFFSET = np.uint64(14695981039346656037)  # FNV-1a 64 offset basis

#: ASCII whitespace byte values — matches ``str.split()`` for ASCII text
#: (non-ASCII UTF-8 bytes all have the high bit set, so they never collide)
_WS = (9, 10, 11, 12, 13, 32)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constant set): full-avalanche bit
    mix for uses where individual BIT statistics matter (SimHash ±1 votes).
    The raw polynomial hash is linear in its input — fine for equality-based
    uses (dedup keys, LSH bucket ids), but its low bits are correlated across
    related strings, which systematically compresses Hamming distances."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


#: odd 64-bit constants (splitmix64's public-domain multipliers)
_MR_C1 = np.uint64(0x9E3779B97F4A7C15)
_MR_C2 = np.uint64(0xBF58476D1CE4E5B9)
_MR_C3 = np.uint64(0x94D049BB133111EB)


def mulrot_hash64(x: np.ndarray) -> np.ndarray:
    """mul-rotate-mul 64-bit mixer using ONLY {multiply mod 2^64, rotate} —
    every step is expressible in ANSI SQL over HUGEINT (rotl(z,32) =
    (z*2^32 mod 2^64) + z//2^32, the two parts occupying disjoint bits), so
    deterministic splits/samples computed with it can be oracle-verified
    bit-for-bit.  Weaker avalanche than splitmix64 (no xor), ample for
    bucketing."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) * _MR_C1
        z = (z << np.uint64(32)) | (z >> np.uint64(32))
        z = z * _MR_C2
        z = (z << np.uint64(32)) | (z >> np.uint64(32))
        z = z * _MR_C3
    return z


def flat_utf8(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string column -> (flat uint8 byte buffer, int64 offsets).

    Zero-copy views of the Arrow buffers (after a cast to large_string for
    uniform 64-bit offsets)."""
    arr = pc.cast(col, pa.large_string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, dtype=np.uint8)
    if offs[0] != 0:
        data = data[offs[0] : offs[-1]]
        offs = offs - offs[0]
    else:
        data = data[: offs[-1]]
    return data, offs


def flat_bytes(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Arrow string OR binary column -> (flat uint8 buffer, int64 offsets).

    Like :func:`flat_utf8` but casts to large_binary, so it also accepts
    binary columns whose values are NOT valid UTF-8 (byte-offset text
    snippets sliced mid-codepoint)."""
    arr = pc.cast(col, pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, dtype=np.uint8)
    if offs[0] != 0:
        data = data[offs[0] : offs[-1]]
        offs = offs - offs[0]
    else:
        data = data[: offs[-1]]
    return data, offs


_PB = 1 << 16
_POW_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _powers(base: np.uint64, n: int) -> np.ndarray:
    """``[base^0 .. base^(n-1)] mod 2^64`` via block decomposition:
    ``base^i = small[i mod 2^16] * big[i div 2^16]``, written as ONE output
    allocation + two streaming broadcast passes (a block-view copy of the
    cached small table, then an in-place row multiply by the big strides).
    Replaces an O(n) SEQUENTIAL cumprod whose loop-carried dependency ran at
    ~25M elem/s and dominated PrefixHash construction (round-3 profiling of
    ``fingerprint``); allocations matter as much as the op on this path, so
    no index/temporary arrays are materialized."""
    key = int(base)
    small, big = _POW_CACHE.get(key, (None, None))
    with np.errstate(over="ignore"):
        if small is None:
            small = np.empty(_PB, dtype=np.uint64)
            small[0] = 1
            np.cumprod(np.full(_PB - 1, base, dtype=np.uint64), out=small[1:])
        nbig = (max(n, 1) - 1) // _PB + 1
        if big is None or len(big) < nbig:
            step = small[-1] * base  # base^_PB
            big = np.empty(max(nbig, 64), dtype=np.uint64)
            big[0] = 1
            np.cumprod(np.full(len(big) - 1, step, dtype=np.uint64), out=big[1:])
        _POW_CACHE[key] = (small, big)
        out = np.empty(n, dtype=np.uint64)
        nb = n // _PB
        if nb:
            v = out[: nb * _PB].reshape(nb, _PB)
            v[:] = small
            v *= big[:nb, None]
        rem = n - nb * _PB
        if rem:
            np.multiply(small[:rem], big[nb], out=out[nb * _PB :])
    return out


_BASE_INV: dict[int, np.uint64] = {int(P): PINV}


class PrefixHash:
    """Cumulative polynomial-hash state over one flat byte buffer.

    ``base`` defaults to the FNV prime; any ODD base works (odd => invertible
    mod 2^64).  Base 31 is the SQL-replicable choice: 31·z stays < 2^69, so a
    DuckDB HUGEINT replica needs no 32-bit limb splitting per step."""

    def __init__(self, data: np.ndarray, base: np.uint64 = P):
        n = len(data)
        binv = _BASE_INV.get(int(base))
        if binv is None:
            binv = np.uint64(pow(int(base), -1, 1 << 64))
            _BASE_INV[int(base)] = binv
        with np.errstate(over="ignore"):
            pw = _powers(base, n + 1)
            c = np.zeros(n + 1, dtype=np.uint64)
            if n:
                piw = _powers(binv, n)
                np.cumsum(data.astype(np.uint64) * piw, out=c[1:])
        self.pw = pw  # pw[i] = base^i
        self.c = c  # c[i] = sum_{t<i} b_t * base^-t
        self.n = n

    def range_hashes(self, s: np.ndarray, e: np.ndarray) -> np.ndarray:
        """H(s, e) for arrays of ranges (vectorized; empty ranges hash to 0)."""
        with np.errstate(over="ignore"):
            out = self.pw[np.maximum(e, 1) - 1] * (self.c[e] - self.c[s])
        return np.where(e > s, out, np.uint64(0))


def doc_hashes(data: np.ndarray, offs: np.ndarray, ph: PrefixHash | None = None) -> np.ndarray:
    """Whole-document content hash: ``OFFSET * P^len + H(doc)`` (mod 2^64).

    This is the ``fingerprint`` operator's exact formula (rolling polynomial
    with the FNV offset seed), reused as the exact-dedup content key."""
    if ph is None:
        ph = PrefixHash(data)
    s = offs[:-1]
    e = offs[1:]
    with np.errstate(over="ignore"):
        return OFFSET * ph.pw[e - s] + ph.range_hashes(s, e)


def window_hashes(
    data: np.ndarray, offs: np.ndarray, k: int, ph: PrefixHash | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """All char-k-gram hashes per doc -> (flat hashes, per-doc indptr).

    Docs with fewer than k bytes contribute exactly one hash (their whole-doc
    hash), so every doc owns ≥1 shingle and ``np.minimum.reduceat`` over the
    indptr is always well-defined."""
    if ph is None:
        ph = PrefixHash(data)
    s = offs[:-1].astype(np.int64)
    e = offs[1:].astype(np.int64)
    lens = e - s
    nwin = np.where(lens >= k, lens - k + 1, 1)
    indptr = np.concatenate(([0], np.cumsum(nwin)))
    # flat window start positions: for long docs t in [s, e-k]; short docs t=s
    starts = np.repeat(s, nwin) + (np.arange(indptr[-1]) - np.repeat(indptr[:-1], nwin))
    ends = np.minimum(starts + k, np.repeat(e, nwin))
    return ph.range_hashes(starts, ends), indptr


def token_spans(data: np.ndarray, offs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whitespace-token byte spans -> (starts, ends, token->doc indptr).

    Tokens never cross document boundaries; empty/whitespace-only docs own
    zero tokens.  Token order is document order."""
    n_docs = len(offs) - 1
    if len(data) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, np.zeros(n_docs + 1, dtype=np.int64)
    is_ws = np.zeros(len(data), dtype=bool)
    for w in _WS:
        is_ws |= data == w
    prev_ws = np.empty(len(data), dtype=bool)
    prev_ws[0] = True
    prev_ws[1:] = is_ws[:-1]
    next_ws = np.empty(len(data), dtype=bool)
    next_ws[-1] = True
    next_ws[:-1] = is_ws[1:]
    # force token breaks at document boundaries
    inner = offs[1:-1]
    prev_ws[inner[inner < len(data)]] = True
    ends_at = inner - 1
    next_ws[ends_at[ends_at >= 0]] = True
    starts = np.flatnonzero(~is_ws & prev_ws)
    ends = np.flatnonzero(~is_ws & next_ws) + 1
    tok_doc = np.searchsorted(offs, starts, side="right") - 1
    indptr = np.searchsorted(tok_doc, np.arange(n_docs + 1))
    return starts, ends, indptr


def token_hashes(
    data: np.ndarray, offs: np.ndarray, ph: PrefixHash | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-token hashes -> (flat token hashes, token->doc indptr)."""
    if ph is None:
        ph = PrefixHash(data)
    starts, ends, indptr = token_spans(data, offs)
    return ph.range_hashes(starts, ends), indptr


def ngram_hashes(
    tok_h: np.ndarray, tok_indptr: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc **sorted unique** word-n-gram hashes from token hashes.

    A doc with fewer than n tokens (but ≥1) contributes the single gram of
    all its tokens — the same convention as ``{tuple(toks[i:i+n])}`` with the
    short-doc fallback.  Zero-token docs contribute zero grams.
    Returns (flat unique gram hashes, per-doc indptr)."""
    n_docs = len(tok_indptr) - 1
    ntok = np.diff(tok_indptr)
    ngrams = np.where(ntok >= n, ntok - n + 1, np.where(ntok > 0, 1, 0))
    T = len(tok_h)
    with np.errstate(over="ignore"):
        if T >= n:
            # full-width grams: Horner over n consecutive token hashes
            full = tok_h[: T - n + 1].copy()
            for j in range(1, n):
                full = full * P + tok_h[j : T - n + 1 + j]
        else:
            full = np.empty(0, dtype=np.uint64)
    out_indptr = np.concatenate(([0], np.cumsum(ngrams)))
    flat = np.empty(out_indptr[-1], dtype=np.uint64)
    gdoc = np.repeat(np.arange(n_docs), ngrams)
    long_docs = ntok >= n
    # vectorized gather of the full-width grams (per-doc contiguous slices of
    # `full`, starting at that doc's first token index)
    ng_long = ngrams[long_docs]
    total_long = int(ng_long.sum())
    within = np.arange(total_long) - np.repeat(np.concatenate(([0], np.cumsum(ng_long)))[:-1], ng_long)
    src = np.repeat(tok_indptr[:-1][long_docs], ng_long) + within
    dst = np.flatnonzero(np.repeat(long_docs, ngrams))
    flat[dst] = full[src]
    # short docs (rare): single gram = Horner over all their tokens
    short = np.flatnonzero((ntok > 0) & (ntok < n))
    with np.errstate(over="ignore"):
        for d in short:
            h = np.uint64(0)
            for t in range(tok_indptr[d], tok_indptr[d + 1]):
                h = h * P + tok_h[t]
            flat[out_indptr[d]] = h
    # per-doc unique: lexsort by (doc, hash), drop equal neighbours in-doc
    order = np.lexsort((flat, gdoc))
    sflat = flat[order]
    sdoc = gdoc[order]
    keep = np.empty(len(sflat), dtype=bool)
    keep[:1] = True
    keep[1:] = (sflat[1:] != sflat[:-1]) | (sdoc[1:] != sdoc[:-1])
    uflat = sflat[keep]
    udoc = sdoc[keep]
    uindptr = np.searchsorted(udoc, np.arange(n_docs + 1))
    return uflat, uindptr
