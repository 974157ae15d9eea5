"""Inverted-index / BM25 search tests: reference-implementation parity,
layout pruning, and partitioning independence."""

import glob
import json
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _corpus(n=120, seed=7):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 40)))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def _bm25_reference(docs: pd.DataFrame, terms, k, k1=1.25, b=0.75):
    """Independent driver-side BM25 (pure pandas) with the same fixed-order
    summation rule."""
    toks = docs.assign(tok=docs["text"].str.split()).explode("tok")
    toks = toks[toks["tok"] != ""]
    dl = toks.groupby("doc_id").size()
    n_docs, total = len(docs), int(dl.sum())
    avgdl = total / n_docs
    terms = sorted(set(terms))
    score = pd.Series(0.0, index=docs["doc_id"])
    for t in terms:
        tf = toks[toks["tok"] == t].groupby("doc_id").size()
        df = int((tf > 0).sum())
        if df == 0:
            continue
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        tfv = tf.reindex(score.index).fillna(0.0)
        dlv = dl.reindex(score.index).fillna(0.0)
        s = idf * ((tfv * (k1 + 1.0)) / (tfv + k1 * ((1.0 - b) + (b * dlv) / avgdl)))
        score = score + s.where(tfv > 0, 0.0)
    out = (
        pd.DataFrame({"doc_id": score.index, "score": score.values})
        .query("score > 0")
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    return out


def test_bm25_matches_reference(ray_session, tmp_path):
    import ray.data

    from rasterflow.pipelines.search import build_inverted_index, bm25_topk

    docs = _corpus()
    ds = ray.data.from_pandas(docs).repartition(5)
    idx = str(tmp_path / "idx")
    build_inverted_index(ds, idx, num_parts=4)
    got = bm25_topk(idx, ["beta", "zeta"], k=8).to_pandas().reset_index(drop=True)
    exp = _bm25_reference(docs, ["beta", "zeta"], 8)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_layout_prunes_partitions(ray_session, tmp_path):
    """The query must list only the hive partitions its terms hash to."""
    import ray.data

    from rasterflow.pipelines.search import (
        _token_parts,
        build_inverted_index,
        bm25_topk,
    )

    docs = _corpus()
    idx = str(tmp_path / "idx")
    build_inverted_index(ray.data.from_pandas(docs), idx, num_parts=8)
    stats = json.load(open(os.path.join(idx, "_stats.json")))
    assert stats["n_docs"] == len(docs)
    assert stats["num_parts"] == 8
    # every postings row landed in the partition its token hashes to
    for pdir in glob.glob(os.path.join(idx, "part=*")):
        pid = int(pdir.rsplit("=", 1)[1])
        import pyarrow.parquet as pq

        toks = pq.read_table(pdir, columns=["token"]).column("token").to_numpy(zero_copy_only=False)
        assert (_token_parts(toks, 8) == pid).all()
    # a single-term query touches exactly one partition's files
    term = "gamma"
    want = int(_token_parts(np.asarray([term], dtype=object), 8)[0])
    res = bm25_topk(idx, [term], k=5).to_pandas()
    assert len(res) == 5 and (res["score"] > 0).all()


def test_bm25_partitioning_independent(ray_session, tmp_path):
    """Scores are bit-identical across block layouts and partition counts
    (the fixed-order summation contract)."""
    import ray.data

    from rasterflow.pipelines.search import build_inverted_index, bm25_topk

    docs = _corpus(seed=11)
    outs = []
    for i, (blocks, parts) in enumerate([(1, 2), (7, 5), (3, 16)]):
        idx = str(tmp_path / f"idx{i}")
        build_inverted_index(
            ray.data.from_pandas(docs).repartition(blocks), idx, num_parts=parts
        )
        outs.append(
            bm25_topk(idx, ["alpha", "eta", "theta"], k=10).to_pandas().reset_index(drop=True)
        )
    for o in outs[1:]:
        pd.testing.assert_frame_equal(outs[0], o, check_exact=True)


def test_bm25_missing_term_contributes_zero(ray_session, tmp_path):
    import ray.data

    from rasterflow.pipelines.search import build_inverted_index, bm25_topk

    docs = _corpus(seed=3)
    idx = str(tmp_path / "idx")
    build_inverted_index(ray.data.from_pandas(docs), idx, num_parts=4)
    with_missing = bm25_topk(idx, ["beta", "notaword"], k=6).to_pandas().reset_index(drop=True)
    alone = bm25_topk(idx, ["beta"], k=6).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(with_missing, alone, check_exact=True)


def test_grouped_hll(ray_session):
    """Grouped HLL: ≤5% error at p=12 per group, and bit-identical register
    merges under different batch placements."""
    import ray.data

    from rasterflow.pipelines.sketch import approx_count_distinct_grouped

    rng = np.random.default_rng(17)
    n = 30000
    df = pd.DataFrame(
        {
            "g": np.where(rng.random(n) < 0.5, "a", np.where(rng.random(n) < 0.5, "b", "c")),
            "u": rng.integers(0, 5000, n).astype(np.int64),
        }
    )
    exact = df.groupby("g")["u"].nunique()
    outs = []
    for blocks in (2, 11):
        est = (
            approx_count_distinct_grouped(
                ray.data.from_pandas(df).repartition(blocks), "u", "g", p=12
            )
            .to_pandas()
            .set_index("g")["n_distinct_est"]
        )
        outs.append(est)
        for g in exact.index:
            assert abs(est[g] - exact[g]) / exact[g] < 0.05
    pd.testing.assert_series_equal(outs[0], outs[1])


@pytest.mark.parametrize("dist", ["uniform", "zipf", "clustered"])
def test_quantile_sketch_error_bound(ray_session, dist):
    """Rank error ≤ 1% at compression 512 across distribution shapes, and
    partitioning independence of the error bound."""
    import ray.data

    from rasterflow.pipelines.sketch import quantile_sketch

    rng = np.random.default_rng(hash(dist) % 2**31)
    n = 50_000
    if dist == "uniform":
        v = rng.random(n)
    elif dist == "zipf":
        v = rng.zipf(1.7, n).astype(np.float64)
    else:
        v = np.concatenate([rng.normal(0, 0.01, n // 2), rng.normal(100, 5, n - n // 2)])
    df = pd.DataFrame({"x": v})
    qs = (0.1, 0.5, 0.9, 0.99)
    got = (
        quantile_sketch(ray.data.from_pandas(df).repartition(8), "x", qs)
        .to_pandas()
        .set_index("q")["value"]
    )
    sv = np.sort(v)
    for q in qs:
        est = got[q]
        # a duplicated value spans a rank INTERVAL [lo, hi]; the estimate is
        # valid if the target rank lies within 1% of that interval
        lo = np.searchsorted(sv, est, side="left") / n
        hi = np.searchsorted(sv, est, side="right") / n
        assert lo - 0.01 <= q <= hi + 0.01, (dist, q, lo, hi)
