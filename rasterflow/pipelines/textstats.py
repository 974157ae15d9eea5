"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All vectorized Arrow/RE2 kernels in stateless ``map_batches`` tasks except
language-ID (regex set compiled once per actor).  Column names are stable so
oracle SQL can alias to match.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FNV = np.uint64(1099511628211)

STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "en", "los"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
}


def token_count(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_tok, n_ws_tok): BPE-ish regex token count + whitespace count."""

    def f(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        return pa.table(
            {
                id_col: b.column(id_col),
                # whitespace tokens
                "n_tok": pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int64()),
                # GPT-2-style coarse pieces: word / number / punct runs
                "n_bpe": pc.cast(
                    pc.count_substring_regex(t, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), pa.int64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def quality_score(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Heuristic quality features + combined score.

    Columns: n_chars_q, n_tok, punct_ratio, stop_ratio, mean_tok_len, score.
    score = stop_ratio-weighted length signal in [0, 1] — deterministic
    float64 per-row expression.
    """
    stop_re = r"\b(" + "|".join(STOPWORDS["en"]) + r")\b"

    def f(b: pa.Table) -> pa.Table:
        t = b.column(text_col)
        nch = pc.cast(pc.utf8_length(t), pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        ntok = pc.cast(pc.count_substring_regex(t, r"\S+"), pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        npunct = pc.cast(pc.count_substring_regex(t, r"[.,;:!?]"), pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        nstop = pc.cast(pc.count_substring_regex(t, stop_re), pa.int64()).to_numpy(zero_copy_only=False).astype(np.float64)
        ntok_s = np.maximum(ntok, 1.0)
        nch_s = np.maximum(nch, 1.0)
        punct_ratio = npunct / nch_s
        stop_ratio = nstop / ntok_s
        mean_tok_len = nch / ntok_s
        score = np.minimum(1.0, ntok / 64.0) * 0.5 + np.minimum(stop_ratio * 4.0, 1.0) * 0.3 + np.minimum(
            1.0, 1.0 - punct_ratio * 4.0
        ) * 0.2
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_chars_q": pa.array(nch.astype(np.int64)),
                "n_tok": pa.array(ntok.astype(np.int64)),
                "punct_ratio": pa.array(punct_ratio),
                "stop_ratio": pa.array(stop_ratio),
                "mean_tok_len": pa.array(mean_tok_len),
                "score": pa.array(score),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


class LangIdStage:
    """n-gram/stopword-profile language id over {en, es, de, fr}.

    Stopword regexes are built once per actor; scoring = per-language match
    counts normalized by token count; argmax with deterministic tie-break by
    language-code order.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.langs = sorted(STOPWORDS)
        self.regexes = {
            lang: r"\b(" + "|".join(words) + r")\b" for lang, words in STOPWORDS.items()
        }

    def __call__(self, b: pa.Table) -> pa.Table:
        t = b.column(self.text_col)
        lowered = pc.utf8_lower(t)
        counts = np.stack(
            [
                pc.cast(pc.count_substring_regex(lowered, self.regexes[lang]), pa.int64())
                .to_numpy(zero_copy_only=False)
                .astype(np.float64)
                for lang in self.langs
            ],
            axis=1,
        )
        best = counts.argmax(axis=1)
        pred = np.asarray(self.langs, dtype=object)[best]
        conf = counts.max(axis=1) / np.maximum(counts.sum(axis=1), 1.0)
        return pa.table(
            {
                self.id_col: b.column(self.id_col),
                "lang_pred": pa.array(pred.tolist(), type=pa.string()),
                "lang_conf": pa.array(conf),
            }
        )


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id", concurrency=(1, 8)):
    from ..util import cached_stage

    def f(b: pa.Table) -> pa.Table:
        return cached_stage(LangIdStage, text_col=text_col, id_col=id_col)(b)

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint(ds, text_col: str = "text", id_col: str = "doc_id"):
    """64-bit rolling polynomial fingerprint of the utf-8 bytes (mod 2^64):
    ``fp = OFFSET * P^n + Σ b_j * P^(n-1-j)`` — equivalently a Horner fold
    ``fp = fold(fp * P + byte)`` seeded with the FNV offset basis, which is
    exactly what the DuckDB oracle replicates with HUGEINT arithmetic.

    Fully vectorized over the batch's flat UTF-8 buffer (one prefix-hash pass
    for ALL documents — no per-row Python loop)."""

    def f(b: pa.Table) -> pa.Table:
        from ..stages.texthash import doc_hashes, flat_utf8

        data, offs = flat_utf8(b.column(text_col))
        out = doc_hashes(data, offs)
        return pa.table({id_col: b.column(id_col), "fp": pa.array(out.astype(np.int64))})

    return ds.map_batches(f, batch_format="pyarrow")


def top_tokens(ds, text_col: str = "text", k: int = 50):
    """Corpus-wide exact top-k tokens by frequency (heavy hitters, exact).

    Per-batch pre-aggregation (Arrow split + value_counts collapses each
    batch to its distinct tokens) so the shuffle carries (token, n) partials,
    not raw tokens; grouped sum; global top-k with deterministic
    (count desc, token asc) ordering — matches the SQL oracle."""

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(pc.utf8_split_whitespace(b.column(text_col)))
        toks = toks.filter(pc.not_equal(toks, pa.scalar("")))
        vc = toks.value_counts()
        return pa.table(
            {"token": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    from ..util import coalesce_small, grouped_aggregate

    partials = coalesce_small(ds.map_batches(partial, batch_format="pyarrow"), 4)
    red = grouped_aggregate(partials, "token", {"n": ("n", "sum")})
    return red.sort(["n", "token"], descending=[True, False]).limit(k)
