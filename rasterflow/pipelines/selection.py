"""Importance-weighted data selection (DSIR) and LM-perplexity scoring.

Implements two public training-data curation algorithms over hashed
n-gram features:

- :func:`dsir_select` — the hashed-n-gram importance-resampling selector
  (Xie et al., "Data Selection for Language Models via Importance
  Resampling", NeurIPS 2023): fit bucketed unigram(/bigram) distributions
  for a TARGET slice and for the RAW corpus, score every document by its
  log importance ratio, keep the top-k most target-like.
- :func:`lm_nll_topk` — the CCNet/Gopher recipe's LM quality filter: fit
  a hashed-unigram LM on the target slice, score every document by mean
  negative log-likelihood, keep the k worst (filter-out candidates).

No reference-repo analogue — these are training-data assembly operators
the engine adds beyond parity (builder brief).

Scale posture (100 TB): two streaming passes over the corpus — one to fit
the dim-bucket count vectors (per-batch partials, each batch collapses to
ONE fixed-dim int row; the driver folds only #coalesced-blocks rows), one
to score (embarrassingly parallel, per-block partial top-k so the final
merge sees ≤ k·blocks rows in ONE block — no global sort AllToAll).  The
model that ships to pass 2 is a dim-length float64 vector (≤ a few KB),
closed over directly (smaller than any broadcast machinery).

Float reproducibility: per-document scores are a LEFT-TO-RIGHT fold over
the FIXED dim buckets (``w = ((c0·v0 + c1·v1) + c2·v2) …``), the same
technique that makes ``bm25_topk``'s scores bit-reproducible — the DuckDB
oracles replicate the identical chain with explicit parentheses, so
scores hash-match exactly (never a variable-arity float SUM).  The model
vectors use scalar ``math.log`` (glibc libm): numpy's SIMD ``np.log`` can
differ from DuckDB's ``ln`` by 1 ulp per bucket, which accumulates across
the fold.
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


def _fit_counts(
    ds,
    *,
    text_col: str,
    dim: int,
    ngrams: int,
    target_col: str | None,
    target_val: str,
) -> tuple[np.ndarray, np.ndarray | None]:
    """One streaming pass counting bucket occurrences: raw counts ``cr``
    over every document and — when ``target_col`` is given — target counts
    ``ct`` over the ``target_col == target_val`` slice.  Partials are one
    fixed-dim int64 row per batch, coalesced then folded — driver traffic
    is O(blocks·dim), independent of corpus size."""
    planes = ["cr"] + (["ct"] if target_col is not None else [])

    def fixed(v: np.ndarray) -> pa.FixedSizeListArray:
        return pa.FixedSizeListArray.from_arrays(pa.array(v), dim)

    def partial(b: pa.Table) -> pa.Table:
        bucket, gram_doc, _ntok = _token_buckets(b, text_col, dim, ngrams)
        cols = {"cr": np.bincount(bucket, minlength=dim).astype(np.int64)}
        if target_col is not None:
            tmask = np.asarray(
                pc.equal(b.column(target_col), pa.scalar(target_val)).to_numpy(
                    zero_copy_only=False
                ),
                dtype=bool,
            )
            cols["ct"] = np.bincount(
                bucket[tmask[gram_doc]], minlength=dim
            ).astype(np.int64)
        return pa.table({p: fixed(cols[p]) for p in planes})

    def reduce_block(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                p: fixed(
                    t.column(p)
                    .combine_chunks()
                    .flatten()
                    .to_numpy()
                    .reshape(-1, dim)
                    .sum(axis=0, dtype=np.int64)
                )
                for p in planes
            }
        )

    parts = coalesce_small(ds.map_batches(partial, batch_format="pyarrow"), 0.125)
    pdf = parts.map_batches(reduce_block, batch_format="pyarrow").to_pandas()

    def fold(p: str) -> np.ndarray:
        if not len(pdf):
            return np.zeros(dim, np.int64)
        return np.sum(np.stack(pdf[p].to_numpy()), axis=0, dtype=np.int64)

    return fold("cr"), (fold("ct") if target_col is not None else None)


def _smoothed_logs(c: np.ndarray, dim: int, alpha: float) -> list[float]:
    """Add-α-smoothed log probabilities via scalar libm (see module doc)."""
    import math

    tot = float(c.sum()) + alpha * dim
    return [math.log((int(c[b]) + alpha) / tot) for b in range(dim)]


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
    """DSIR model fit: the dim-length float64 log-ratio vector

        lr[b] = ln((ct[b]+α) / (Σct+α·dim)) − ln((cr[b]+α) / (Σcr+α·dim))

    from one :func:`_fit_counts` pass (identical doubles in any replica:
    integer+α and the division are exact/correctly-rounded, ln is the
    shared libm)."""
    cr, ct = _fit_counts(
        ds, text_col=text_col, dim=dim, ngrams=ngrams,
        target_col=target_col, target_val=target_val,
    )
    lt = _smoothed_logs(ct, dim, alpha)
    lraw = _smoothed_logs(cr, dim, alpha)
    return np.array([lt[b] - lraw[b] for b in range(dim)], dtype=np.float64)


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
    whole corpus when ``target_col`` is None)."""
    cr, ct = _fit_counts(
        ds, text_col=text_col, dim=dim, ngrams=ngrams,
        target_col=target_col, target_val=target_val,
    )
    return np.array(
        _smoothed_logs(ct if ct is not None else cr, dim, alpha), dtype=np.float64
    )


def _fold_scores(cnt: np.ndarray, vec: np.ndarray) -> np.ndarray:
    """Fixed-order left-to-right fold: bit-identical to the SQL chain."""
    w = np.zeros(len(cnt), dtype=np.float64)
    for j in range(vec.shape[0]):
        w += cnt[:, j] * vec[j]
    return w


def _score_topk(
    ds,
    *,
    text_col: str,
    id_col: str,
    dim: int,
    ngrams: int,
    k: int,
    vec: np.ndarray,
    value_col: str,
    finalize,
    descending: bool,
):
    """Score every doc (bucket counts → fixed-dim fold → ``finalize``) and
    keep the global top-k by (value, id): each block keeps only its own
    top-k, so the single-block merge orders ≤ k·blocks rows.  Ties break
    by id at both stages — stable under any partitioning, exactly the SQL
    window-oracle order.  Output ``(id_col, n_tok, value_col)``; the id
    column is ``take``-n from the source block, preserving its type (an
    untyped rebuild would emit a null-typed column for empty blocks)."""

    def score_block(b: pa.Table) -> pa.Table:
        bucket, gram_doc, ntok = _token_buckets(b, text_col, dim, ngrams)
        n = len(b)
        cnt = np.bincount(gram_doc * dim + bucket, minlength=n * dim).reshape(n, dim)
        val = finalize(_fold_scores(cnt, vec), ntok)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -val if descending else val))[:k]
        return pa.table(
            {
                id_col: b.column(id_col).take(pa.array(order)),
                "n_tok": pa.array(ntok[order], type=pa.int64()),
                value_col: pa.array(val[order], type=pa.float64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        v = t.column(value_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -v if descending else v))[:k]
        return t.take(pa.array(order))

    return (
        ds.map_batches(score_block, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow")
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
    """Top-k most target-like documents by DSIR importance weight
    (module doc).  Pass 1 (:func:`fit_log_ratios`) fits the two hashed
    distributions (pass ``log_ratios=`` to amortize it across reruns);
    pass 2 scores and selects (:func:`_score_topk`).

    Output: ``(id_col, n_tok, weight)``, weight desc / id asc.  Zero-token
    documents weigh exactly +0.0 and participate normally (the oracle's
    COALESCE path reproduces them)."""
    lr = (
        fit_log_ratios(
            ds, text_col=text_col, target_col=target_col, target_val=target_val,
            dim=dim, alpha=alpha, ngrams=ngrams,
        )
        if log_ratios is None
        else np.asarray(log_ratios, dtype=np.float64)
    )
    return _score_topk(
        ds, text_col=text_col, id_col=id_col, dim=dim, ngrams=ngrams, k=k,
        vec=lr, value_col="weight",
        finalize=lambda w, ntok: w, descending=True,
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
    """Perplexity-style quality scoring (module doc): fit a hashed-unigram
    LM on the target slice (:func:`fit_log_probs`), score every document
    by mean negative log-likelihood — one correctly-rounded division of
    the fold; zero-token documents score exactly 0.0 — and keep the k
    highest-NLL (``worst=True``, the filter-out candidates) or lowest-NLL
    documents.  Output ``(id_col, n_tok, nll)``."""
    lp = fit_log_probs(
        ds, text_col=text_col, target_col=target_col, target_val=target_val,
        dim=dim, alpha=alpha, ngrams=ngrams,
    )
    return _score_topk(
        ds, text_col=text_col, id_col=id_col, dim=dim, ngrams=ngrams, k=k,
        vec=lp, value_col="nll",
        finalize=lambda s, ntok: np.where(ntok > 0, -s / np.maximum(ntok, 1), 0.0),
        descending=worst,
    )
