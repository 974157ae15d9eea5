"""Web-crawl URL curation: canonicalization, URL-level dedup, domain gating.

A Common-Crawl-style corpus is keyed by URL, and the first curation steps any
crawl pipeline runs are URL-shaped (CCNet / RefinedWeb / Gopher recipes):

* :func:`canonicalize_urls` — vectorized URL canonicalization (strip
  query/fragment, lowercase scheme+host, drop a leading ``www.``, trim
  trailing slashes).  Pure Arrow RE2 kernels (``replace_substring_regex`` /
  ``extract_regex``) — zero Python per row, zero shuffle.
* :func:`url_dedup` — exact duplicate collapse on the canonical URL (the
  recrawl case: the same page fetched as ``http://``/``https://``, with and
  without ``www.``, with tracking params).  Keep-first (min doc id) per
  canonical URL, like :func:`~rasterflow.pipelines.dedup.exact_dedup`.
* :func:`domain_of` / :func:`domain_quality_gate` — registrable-domain
  extraction and the two-pass per-domain quality gate: aggregate per-domain
  stats (tiny — domains ≪ docs), threshold on the driver, broadcast the
  surviving-domain set into a streaming filter.  The same
  broadcast-small-side plan as decontamination (no shuffle of the docs).

100 TB posture: canonicalization and domain extraction are row-local; the
dedup shuffles only ``(canon, doc_id)`` pairs (never text); the domain
aggregate exchanges per-batch partials bounded by the touched-domain count,
and the gate's pass 2 is a broadcast-set filter.  The domain table itself is
assumed driver-small (the web has ~10^8 registrable domains — a few GB of
keys at worst, but the gate only broadcasts the *kept* set; an extreme
cardinality run can swap the driver threshold step for a broadcast semi-join
via :func:`~rasterflow.pipelines.relational.bloom_semi_join`).

The ``synth_urls`` fixture column is deterministic in ``doc_id`` (four
variants per page id — case noise, ``www.``, tracking params, trailing
slash) so the DuckDB oracle can synthesize byte-identical input and the
whole family is hash-checked end to end (``__ray_entry__.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import coalesce_small, grouped_aggregate

# --- deterministic URL fixture (shared shape with the SQL oracle) ----------
# page q = doc_id // 4 appears as 4 URL variants (doc_id % 4):
#   0: https://site{d}.example/p{q:07d}            (already canonical)
#   1: HTTPS://SITE{d}.EXAMPLE/p{q:07d}            (scheme/host case noise)
#   2: https://www.site{d}.example/p{q:07d}/       (www + trailing slash)
#   3: https://site{d}.example/p{q:07d}?utm_source=feed#frag  (tracking)
# with d = q % N_DOMAINS.  All four canonicalize to variant 0.
N_DOMAINS = 50


def synth_urls(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Append the deterministic ``url`` fixture column (see module doc).
    Vectorized pandas string assembly — no Python per row."""
    import pandas as pd

    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    q = ids // 4
    v = ids % 4
    d = pd.Series(q % N_DOMAINS).astype(str)
    pq_ = pd.Series(q).astype(str).str.zfill(7)
    lo = "site" + d + ".example/p" + pq_
    urls = np.select(
        [v == 0, v == 1, v == 2],
        [
            "https://" + lo,
            "HTTPS://SITE" + d + ".EXAMPLE/p" + pq_,
            "https://www." + lo + "/",
        ],
        default="https://" + lo + "?utm_source=feed#frag",
    )
    return batch.append_column("url", pa.array(urls.tolist(), type=pa.string()))


_URL_RE = r"^(?P<scheme>[^:/?#]+)://(?P<host>[^/?#]*)(?P<path>/[^?#]*)?$"


def canonicalize_urls(batch: pa.Table, url_col: str = "url", out_col: str = "canon") -> pa.Table:
    """Append the canonical form of ``url_col`` (Arrow RE2 kernels, row-local).

    canon = lower(scheme) ``://`` lower(host without leading ``www.``) +
    path with query/fragment stripped and trailing ``/`` trimmed (empty path
    becomes ``/``).  Rows that don't parse as ``scheme://host...`` pass
    through lowercased-whole (a crawl's malformed-URL tail should be routed
    to a quarantine filter, not crash the stage).
    """
    u = batch.column(url_col)
    stripped = pc.replace_substring_regex(u, pattern=r"[?#].*$", replacement="")
    parts = pc.extract_regex(stripped, _URL_RE)
    ok = pc.is_valid(parts)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, pattern=r"^www\.", replacement="")
    path = pc.coalesce(pc.struct_field(parts, "path"), pa.scalar("", pa.string()))
    path = pc.replace_substring_regex(path, pattern=r"/+$", replacement="")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/", pa.string()), path)
    canon = pc.binary_join_element_wise(scheme, "://", host, path, "")
    # RE2 sanity: the regex refuses empty hosts only via [^/?#]* being empty —
    # still a match; genuine non-matches (no "://") fall back to lowercase.
    canon = pc.if_else(ok, canon, pc.utf8_lower(stripped))
    return batch.append_column(out_col, canon)


def add_urls_and_canon(ds, id_col: str = "doc_id"):
    """Fixture synth + canonicalization as one row-local Arrow stage."""

    def fn(b: pa.Table) -> pa.Table:
        return canonicalize_urls(synth_urls(b, id_col))

    return ds.map_batches(fn, batch_format="pyarrow")


def url_dedup(ds, id_col: str = "doc_id", url_col: str | None = None, sort: bool = True):
    """Exact dedup on the canonical URL: ``(canon, keep_id, n_dups)``.

    With ``url_col`` the existing URL column is canonicalized (the
    production path — e.g. the pages table's real ``url``); without it the
    deterministic fixture URLs are synthesized from ``id_col`` (the oracle
    path).  Two-stage: each batch collapses to its own per-canon ``(min id,
    count)`` partial (duplicates are adjacent in id order but may land in
    any block — min/count are both mergeable), then one hash exchange over
    the collapsed keys.  Only ``(canon, id)`` pairs ever move; the text
    never shuffles.
    """
    import pandas as pd

    if url_col is not None:
        withc = ds.map_batches(
            lambda b: canonicalize_urls(b, url_col), batch_format="pyarrow"
        )
    else:
        withc = add_urls_and_canon(ds, id_col)

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["canon", id_col]).to_pandas()
        out = df.groupby("canon", as_index=False, sort=False).agg(
            keep_id=pd.NamedAgg(id_col, "min"), n_dups=pd.NamedAgg(id_col, "size")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = coalesce_small(withc.map_batches(partial, batch_format="pyarrow"), 0.25)
    out = grouped_aggregate(
        partials, "canon", {"keep_id": ("keep_id", "min"), "n_dups": ("n_dups", "sum")}
    )
    return out.sort("canon") if sort else out


def domain_of(batch: pa.Table, canon_col: str = "canon", out_col: str = "domain") -> pa.Table:
    """Append the registrable domain of a canonical URL (host minus any
    subdomain labels beyond the last two — the public-suffix heuristic;
    a production run plugs in the PSL table the same way)."""
    host = pc.extract_regex(batch.column(canon_col), r"^[^:/?#]+://(?P<host>[^/?#]*)")
    host = pc.struct_field(host, "host")
    dom = pc.replace_substring_regex(host, pattern=r"^.*?([^.]+\.[^.]+)$", replacement=r"\1")
    return batch.append_column(out_col, dom)


def domain_dup_stats(ds, id_col: str = "doc_id", sort: bool = True):
    """Per-domain URL-duplication report: ``(domain, n_urls, n_canon)`` —
    how much of each domain's crawl collapses under canonicalization (the
    recrawl-waste dashboard).  Composition: canonicalize → collapse to
    distinct (domain, canon) with URL counts → per-domain fold.  Only
    collapsed keys shuffle."""
    import pandas as pd

    withd = add_urls_and_canon(ds, id_col).map_batches(domain_of, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["domain", "canon"]).to_pandas()
        out = df.groupby(["domain", "canon"], as_index=False, sort=False).size()
        return pa.Table.from_pandas(out.rename(columns={"size": "n"}), preserve_index=False)

    per_canon = grouped_aggregate(
        coalesce_small(withd.map_batches(partial, batch_format="pyarrow"), 0.25),
        ["domain", "canon"],
        {"n": ("n", "sum")},
    )
    out = grouped_aggregate(
        per_canon, "domain", {"n_urls": ("n", "sum"), "n_canon": ("canon", "count")}
    )
    return out.sort("domain") if sort else out


def domain_trend(
    ds,
    id_col: str = "doc_id",
    buckets: int = 8,
    min_count: int = 10,
    sort: bool = True,
):
    """Trending domains: early/late-half crawl counts per domain with an
    emerging/declining/persistent label — :func:`zonal.hotspot_evolution`'s
    plan on the DOMAIN key instead of the cell key (what's growing in the
    crawl).  Crawl timestamps are the pages-fixture plane ``(id·137) %
    TS_SPAN``; integer counts + a CASE label, hash-exact.  Per-batch
    (domain, half) collapse → one collapsed-key exchange → row-local label.
    """
    import pandas as pd

    from ..sources.fixtures import TS_SPAN

    if TS_SPAN % buckets:
        raise ValueError("buckets must divide TS_SPAN")
    w = TS_SPAN // buckets
    half = buckets // 2
    withd = add_urls_and_canon(ds, id_col).map_batches(domain_of, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        late = (((ids * 137) % TS_SPAN) // w) >= half
        df = pd.DataFrame({"domain": b.column("domain").to_pandas(), "late": late.astype(np.int64)})
        out = df.groupby("domain", as_index=False).agg(
            n_late=("late", "sum"), n=("late", "size")
        )
        out["n_early"] = out["n"] - out["n_late"]
        return pa.Table.from_pandas(out[["domain", "n_early", "n_late"]], preserve_index=False)

    agg = grouped_aggregate(
        coalesce_small(withd.map_batches(partial, batch_format="pyarrow"), 0.25),
        "domain",
        {"n_early": ("n_early", "sum"), "n_late": ("n_late", "sum")},
    )

    def classify(t: pa.Table) -> pa.Table:
        ne = t.column("n_early").to_numpy(zero_copy_only=False)
        nl = t.column("n_late").to_numpy(zero_copy_only=False)
        hot_e = ne >= min_count
        hot_l = nl >= min_count
        keep = hot_e | hot_l
        status = np.where(hot_e & hot_l, "persistent", np.where(hot_l, "emerging", "declining"))
        return pa.table(
            {
                "domain": t.column("domain").filter(pa.array(keep)),
                "n_early": pa.array(ne[keep]),
                "n_late": pa.array(nl[keep]),
                "status": pa.array(status[keep].tolist(), type=pa.string()),
            }
        )

    out = agg.map_batches(classify, batch_format="pyarrow")
    return out.sort("domain") if sort else out


def domain_quality_gate(
    ds,
    min_docs: int = 1,
    min_avg_chars: float = 0.0,
    id_col: str = "doc_id",
    value_col: str = "n_chars",
    sort: bool = True,
):
    """Two-pass per-domain quality gate (the Gopher/RefinedWeb "drop bad
    domains wholesale" step).

    Pass 1 aggregates ``(domain, n_docs, sum_chars)`` — per-batch partials
    bounded by touched domains, one collapsed-key exchange.  The threshold
    (``n_docs >= min_docs AND sum/n >= min_avg_chars``; the avg is ONE
    float64 division of two exact ints, so it hash-matches SQL) runs on the
    driver over the tiny domain table; the surviving-domain set broadcasts
    into a streaming pass-2 filter.  Returns the kept docs as ``(doc_id,
    domain)`` — the id plane of the filtered corpus; callers join text back
    by id (same contract as the dedup keep lists).
    """
    import pandas as pd

    withd = add_urls_and_canon(ds, id_col).map_batches(domain_of, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        df = b.select(["domain", value_col]).to_pandas()
        out = df.groupby("domain", as_index=False, sort=False).agg(
            n_docs=pd.NamedAgg(value_col, "size"), sum_v=pd.NamedAgg(value_col, "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    stats = grouped_aggregate(
        coalesce_small(withd.map_batches(partial, batch_format="pyarrow"), 0.25),
        "domain",
        {"n_docs": ("n_docs", "sum"), "sum_v": ("sum_v", "sum")},
    ).to_pandas()
    keep = stats[
        (stats["n_docs"] >= min_docs)
        & ((stats["sum_v"].astype(np.float64) / stats["n_docs"]) >= min_avg_chars)
    ]["domain"]
    keep_set = frozenset(keep.tolist())

    keep_arr = pa.array(sorted(keep_set), type=pa.string())

    def filt(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b.column("domain"), value_set=keep_arr)
        return b.filter(mask).select([id_col, "domain"])

    out = withd.map_batches(filt, batch_format="pyarrow")
    return out.sort(id_col) if sort else out
