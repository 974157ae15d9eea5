"""Importance-weighted data selection (DSIR).

Implements the hashed-n-gram importance-resampling selector from the
public DSIR algorithm (Xie et al., "Data Selection for Language Models
via Importance Resampling", NeurIPS 2023): fit bucketed unigram(/bigram)
distributions for a TARGET slice and for the RAW corpus, score every raw
document by its log importance ratio under the two distributions, and
keep the top-k most target-like documents.  No reference-repo analogue —
this is one of the training-data assembly operators the engine adds
beyond parity (builder brief).

Scale posture (100 TB): two streaming passes over the corpus — one to fit
the two dim-bucket count vectors (per-batch partials, each batch collapses
to ONE (2·dim)-int row; the driver folds only #coalesced-blocks rows), one
to score (embarrassingly parallel, per-block partial top-k so the final
merge sees ≤ k·blocks rows in ONE block — no global sort AllToAll).  The
model that ships to pass 2 is a dim-length float64 vector (≤ a few KB),
closed over directly (smaller than any broadcast machinery).

Float reproducibility: the per-document weight is a LEFT-TO-RIGHT fold
over the FIXED dim buckets (``w = ((c0·lr0 + c1·lr1) + c2·lr2) …``), the
same technique that makes ``bm25_topk``'s scores bit-reproducible — the
DuckDB oracle replicates the identical chain with explicit parentheses,
so weights hash-match exactly (never a variable-arity float SUM).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import coalesce_small

#: SQL-replicable hashing plane (hash_fn="mulrot31" of hashing_vectorize):
#: base-31 byte polynomial + mul-rotate mixer — see stages/texthash.py.
_BASE31 = np.uint64(31)


def _token_buckets(b: pa.Table, text_col: str, dim: int, ngrams: int):
    """Flat (bucket, gram->doc index, unigram token counts) for one batch
    under the mulrot31 hash.  ``ngrams=2`` appends bigram buckets (hash of
    the two mixed unigram hashes re-folded: ``mulrot(h_i·31 + h_j)``) after
    the unigram buckets of each doc — occurrence counts, not distinct
    grams (DSIR fits occurrence distributions)."""
    from ..stages.texthash import (
        PrefixHash,
        flat_utf8,
        mulrot_hash64,
        token_spans,
    )

    data, offs = flat_utf8(b.column(text_col))
    starts, ends, indptr = token_spans(data, offs)
    ph = PrefixHash(data, base=_BASE31)
    th = mulrot_hash64(ph.range_hashes(starts, ends))
    n = len(b)
    ntok = np.diff(indptr).astype(np.int64)
    tok_doc = np.repeat(np.arange(n, dtype=np.int64), ntok)
    if ngrams == 1:
        bucket = (th % np.uint64(dim)).astype(np.int64)
        return bucket, tok_doc, ntok
    # bigrams: adjacent token pairs within one doc
    same = tok_doc[1:] == tok_doc[:-1] if len(th) > 1 else np.zeros(0, bool)
    with np.errstate(over="ignore"):
        bg = mulrot_hash64(th[:-1][same] * _BASE31 + th[1:][same])
    bucket = np.concatenate(
        [(th % np.uint64(dim)).astype(np.int64), (bg % np.uint64(dim)).astype(np.int64)]
    )
    grams_doc = np.concatenate([tok_doc, tok_doc[:-1][same]])
    order = np.argsort(grams_doc, kind="stable")
    return bucket[order], grams_doc[order], ntok


def fit_log_ratios(
    ds,
    *,
    text_col: str = "text",
    target_col: str = "lang",
    target_val: str = "en",
    dim: int = 64,
    alpha: float = 0.5,
    ngrams: int = 1,
) -> np.ndarray:
    """One streaming pass fitting BOTH hashed distributions: raw counts
    over every document, target counts over the ``target_col ==
    target_val`` slice.  Returns the dim-length float64 log-ratio vector

        lr[b] = ln((ct[b]+α) / (Σct+α·dim)) − ln((cr[b]+α) / (Σcr+α·dim))

    computed once on the driver from integer counts (identical doubles in
    any replica: integer+0.5 and the division are exact/correctly-rounded,
    ln is the shared libm).  Partials are one (2·dim)-int64 row per batch,
    coalesced then folded — driver traffic is O(blocks·dim), independent
    of corpus size."""

    def partial(b: pa.Table) -> pa.Table:
        bucket, gram_doc, _ntok = _token_buckets(b, text_col, dim, ngrams)
        cr = np.bincount(bucket, minlength=dim).astype(np.int64)
        is_t = pc.equal(b.column(target_col), pa.scalar(target_val))
        tmask = is_t.to_numpy(zero_copy_only=False)
        tmask = np.asarray(tmask, dtype=bool)
        ct = np.bincount(bucket[tmask[gram_doc]], minlength=dim).astype(np.int64)
        return pa.table(
            {
                "cr": pa.FixedSizeListArray.from_arrays(pa.array(cr), dim),
                "ct": pa.FixedSizeListArray.from_arrays(pa.array(ct), dim),
            }
        )

    def reduce_block(t: pa.Table) -> pa.Table:
        cr = t.column("cr").combine_chunks().flatten().to_numpy().reshape(-1, dim)
        ct = t.column("ct").combine_chunks().flatten().to_numpy().reshape(-1, dim)
        return pa.table(
            {
                "cr": pa.FixedSizeListArray.from_arrays(
                    pa.array(cr.sum(axis=0, dtype=np.int64)), dim
                ),
                "ct": pa.FixedSizeListArray.from_arrays(
                    pa.array(ct.sum(axis=0, dtype=np.int64)), dim
                ),
            }
        )

    parts = coalesce_small(ds.map_batches(partial, batch_format="pyarrow"), 0.125)
    pdf = parts.map_batches(reduce_block, batch_format="pyarrow").to_pandas()
    cr = np.sum(np.stack(pdf["cr"].to_numpy()), axis=0, dtype=np.int64) if len(pdf) else np.zeros(dim, np.int64)
    ct = np.sum(np.stack(pdf["ct"].to_numpy()), axis=0, dtype=np.int64) if len(pdf) else np.zeros(dim, np.int64)
    # scalar math.log (glibc libm) — numpy's SIMD np.log can differ from
    # DuckDB's ln by 1 ulp per bucket, which accumulates across the fold
    import math

    tt = float(ct.sum()) + alpha * dim
    tr = float(cr.sum()) + alpha * dim
    return np.array(
        [
            math.log((int(ct[b]) + alpha) / tt) - math.log((int(cr[b]) + alpha) / tr)
            for b in range(dim)
        ],
        dtype=np.float64,
    )


def dsir_select(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "lang",
    target_val: str = "en",
    dim: int = 64,
    k: int = 100,
    alpha: float = 0.5,
    ngrams: int = 1,
    log_ratios: np.ndarray | None = None,
):
    """Top-k most target-like documents by DSIR importance weight.

    Pass 1 (:func:`fit_log_ratios`) fits the two hashed distributions;
    pass 2 scores every doc — per-doc bucket counts via one ``bincount``,
    weight via the left-to-right fixed-dim fold — and keeps each block's
    top-k, so the single-block merge orders ≤ k·blocks rows.  Ties break
    by (weight desc, id asc) at both stages: stable under any
    partitioning, exactly the SQL window-oracle order.

    Output: ``(id_col, n_tok, weight)``, the selected rows.  Zero-token
    documents weigh exactly 0.0 and participate normally (the oracle's
    COALESCE path reproduces them)."""
    lr = (
        fit_log_ratios(
            ds,
            text_col=text_col,
            target_col=target_col,
            target_val=target_val,
            dim=dim,
            alpha=alpha,
            ngrams=ngrams,
        )
        if log_ratios is None
        else np.asarray(log_ratios, dtype=np.float64)
    )

    def score_topk(b: pa.Table) -> pa.Table:
        bucket, gram_doc, ntok = _token_buckets(b, text_col, dim, ngrams)
        n = len(b)
        cnt = np.bincount(gram_doc * dim + bucket, minlength=n * dim).reshape(n, dim)
        w = np.zeros(n, dtype=np.float64)
        for j in range(dim):  # fixed-order fold: bit-identical to the SQL chain
            w += cnt[:, j] * lr[j]
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -w))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "n_tok": pa.array(ntok[order]),
                "weight": pa.array(w[order], type=pa.float64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        w = t.column("weight").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -w))[:k]
        return t.take(pa.array(order))

    return (
        ds.map_batches(score_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )


def fit_log_probs(
    ds,
    *,
    text_col: str = "text",
    target_col: str | None = None,
    target_val: str = "",
    dim: int = 64,
    alpha: float = 0.5,
    ngrams: int = 1,
) -> np.ndarray:
    """Hashed-unigram language model: the add-α-smoothed log probability of
    each bucket, fit over the ``target_col == target_val`` slice (or the
    whole corpus when ``target_col`` is None).  Same one-pass partial plan
    as :func:`fit_log_ratios`; scalar libm logs for cross-engine bit
    identity."""
    import math

    def partial(b: pa.Table) -> pa.Table:
        bucket, gram_doc, _ntok = _token_buckets(b, text_col, dim, ngrams)
        if target_col is not None:
            tmask = np.asarray(
                pc.equal(b.column(target_col), pa.scalar(target_val)).to_numpy(
                    zero_copy_only=False
                ),
                dtype=bool,
            )
            bucket = bucket[tmask[gram_doc]]
        c = np.bincount(bucket, minlength=dim).astype(np.int64)
        return pa.table({"c": pa.FixedSizeListArray.from_arrays(pa.array(c), dim)})

    def reduce_block(t: pa.Table) -> pa.Table:
        c = t.column("c").combine_chunks().flatten().to_numpy().reshape(-1, dim)
        return pa.table(
            {
                "c": pa.FixedSizeListArray.from_arrays(
                    pa.array(c.sum(axis=0, dtype=np.int64)), dim
                )
            }
        )

    parts = coalesce_small(ds.map_batches(partial, batch_format="pyarrow"), 0.125)
    pdf = parts.map_batches(reduce_block, batch_format="pyarrow").to_pandas()
    c = (
        np.sum(np.stack(pdf["c"].to_numpy()), axis=0, dtype=np.int64)
        if len(pdf)
        else np.zeros(dim, np.int64)
    )
    tot = float(c.sum()) + alpha * dim
    return np.array(
        [math.log((int(c[b]) + alpha) / tot) for b in range(dim)], dtype=np.float64
    )


def lm_nll_topk(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str | None = "lang",
    target_val: str = "en",
    dim: int = 64,
    k: int = 100,
    alpha: float = 0.5,
    ngrams: int = 1,
    worst: bool = True,
):
    """Perplexity-style quality scoring (the CCNet/Gopher recipe's LM
    filter, public): fit a hashed-unigram LM on the target slice
    (:func:`fit_log_probs`), score every document by its mean negative
    log-likelihood, and keep the k highest-NLL (``worst=True``, the
    filter-out candidates) or lowest-NLL documents.

    Same two-pass, per-block-partial-top-k plan and the same
    bit-reproducible fixed-dim fold as :func:`dsir_select`; the per-doc
    mean is one correctly-rounded division (fold / n_tok), and zero-token
    documents score exactly 0.0.  Output ``(id_col, n_tok, nll)``."""
    lp = fit_log_probs(
        ds,
        text_col=text_col,
        target_col=target_col,
        target_val=target_val,
        dim=dim,
        alpha=alpha,
        ngrams=ngrams,
    )

    def score_topk(b: pa.Table) -> pa.Table:
        bucket, gram_doc, ntok = _token_buckets(b, text_col, dim, ngrams)
        n = len(b)
        cnt = np.bincount(gram_doc * dim + bucket, minlength=n * dim).reshape(n, dim)
        s = np.zeros(n, dtype=np.float64)
        for j in range(dim):  # fixed-order fold (see dsir_select)
            s += cnt[:, j] * lp[j]
        nll = np.where(ntok > 0, -s / np.maximum(ntok, 1), 0.0)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        key = -nll if worst else nll
        order = np.lexsort((ids, key))[:k]
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "n_tok": pa.array(ntok[order]),
                "nll": pa.array(nll[order], type=pa.float64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        v = t.column("nll").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v if worst else v))[:k]
        return t.take(pa.array(order))

    return (
        ds.map_batches(score_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
    )
