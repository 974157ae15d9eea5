"""Composed training-data curation pipeline: the end-to-end shape a 100 TB
web corpus actually runs, built from the engine's own verified stages.

    documents
      → quality predicate        (vectorized regex counts — no shuffle)
      → decontaminate            (broadcast benchmark gram set — no shuffle)
      → exact dedup keep-list    (hash-partition groupby — the one shuffle)

Every stage is individually oracle-verified; the composition is verified as
one SQL statement (``curation_keep`` in ``__ray_entry__``), so stage
ORDERING and interaction are pinned too, not just the pieces.

Scale posture: the two filters are per-batch map stages that only ever
shrink the stream; the single shuffle runs over pre-aggregated (hash,
min-id, count) partials of the surviving rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def quality_filter(ds, text_col: str = "text", min_tok: int = 25, min_stop_ratio: float = 0.05):
    """Keep docs with ≥ ``min_tok`` whitespace tokens and an English
    stopword ratio ≥ ``min_stop_ratio`` (the same expressions the
    ``quality_score`` oracle hash-verifies)."""
    from .textstats import STOPWORDS

    stop_re = r"\b(" + "|".join(STOPWORDS["en"]) + r")\b"

    def f(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        ntok = pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        nstop = pc.cast(pc.count_substring_regex(t, stop_re), pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        stop_ratio = nstop / np.maximum(ntok, 1.0)
        keep = (ntok >= min_tok) & (stop_ratio >= min_stop_ratio)
        return b.filter(pa.array(keep))

    return ds.map_batches(f, batch_format="pyarrow")


def curation_keep_list(
    ds,
    benchmark_grams: np.ndarray,
    content_col: str = "text",
    id_col: str = "doc_id",
    min_tok: int = 25,
    min_stop_ratio: float = 0.05,
    ngram: int = 3,
    min_overlap: int = 1,
    verify: bool = False,
):
    """Quality filter → decontaminate → exact dedup; returns the keep list
    ``(doc_id, n)`` (min id per surviving distinct content, with its
    duplicate count), sorted by doc_id."""
    from .dedup import decontaminate, exact_dedup

    flt = quality_filter(ds, text_col=content_col, min_tok=min_tok, min_stop_ratio=min_stop_ratio)
    clean = decontaminate(
        flt, benchmark_grams, content_col=content_col, id_col=id_col,
        ngram=ngram, min_overlap=min_overlap,
    )
    return exact_dedup(clean, content_col=content_col, id_col=id_col, verify=verify)


def filter_by_quantile(
    ds,
    col: str,
    q: float = 0.9,
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
):
    """Keep rows at or above the corpus's q-th percentile of ``col`` — the
    "quality tail" filter composed from the exact distributed quantile
    selection (:func:`~rasterflow.pipelines.sampling.column_quantiles_select`,
    O(log) passes) and one broadcast-threshold filter pass.

    Threshold rule = the shared quantile definition (smallest v with
    cumulative count ≥ ceil(q·n)), so the SQL oracle is the same window
    expression.  Returns the kept rows (``keep_cols`` or (id, col)),
    sorted by id."""
    import pyarrow.compute as pc

    from .sampling import column_quantiles_select

    thr_tbl = column_quantiles_select(ds, col, qs=(q,)).to_pandas()
    thr = float(thr_tbl["value"].iloc[0])
    cols = keep_cols or [id_col, col]

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t.column(col), pa.scalar(thr))).select(cols)

    return ds.map_batches(keep, batch_format="pyarrow").sort(id_col)


def training_prep(
    ds,
    budget: int = 512,
    q: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    quality_col: str = "n_chars",
):
    """The end-to-end training-prep composition: percentile quality gate →
    exact dedup (min id per distinct content) → greedy sequence packing per
    stratum.  Returns the per-bin manifest (group, bin_id, n_docs, tok_sum).

    Scale shape: one O(log)-pass quantile selection, then ONE pass that
    filters + hashes + token-counts and immediately drops the text (only
    (id, group, n_tok, hash) ints travel), one hash-partitioned first-by-id
    dedup exchange, and the packing groupby — the full pipeline moves raw
    text zero times after the prep pass.  Verified as ONE SQL statement
    (window quantile + text-equality dedup + recursive packing CTE), so
    stage ordering and interaction are pinned, not just the pieces."""
    import pyarrow.compute as pc

    from .dedup import content_hash64
    from .packing import pack_sequences
    from .sampling import _grouped_head, column_quantiles_select

    thr_tbl = column_quantiles_select(ds, quality_col, qs=(q,)).to_pandas()
    thr = float(thr_tbl["value"].iloc[0])

    def prep(b: pa.Table) -> pa.Table:
        tb = b.filter(pc.greater_equal(b.column(quality_col), pa.scalar(thr)))
        h = content_hash64(tb.column(text_col)).astype(np.int64)
        n_tok = pc.cast(pc.count_substring_regex(tb.column(text_col), r"\S+"), pa.int64())
        return pa.table(
            {
                "h": pa.array(h),
                id_col: tb.column(id_col),
                group_col: tb.column(group_col),
                "n_tok": n_tok,
            }
        )

    slim = ds.map_batches(prep, batch_format="pyarrow")
    survivors = _grouped_head(
        slim, "h", [id_col], [True], 1, ["h", id_col, group_col, "n_tok"]
    )
    return pack_sequences(
        survivors, budget=budget, group_col=group_col, id_col=id_col, token_col="n_tok"
    )
