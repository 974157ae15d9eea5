"""Sequence-packing tests: greedy-rule parity with a per-row reference,
overflow singletons, and partitioning independence."""

import numpy as np
import pandas as pd
import pytest

from rasterflow.pipelines.packing import greedy_bins


def _reference_bins(ntok, budget):
    """Literal per-row state machine (the oracle's recursive CTE rule)."""
    bins, fill, b = [], None, 0
    for n in ntok:
        if fill is None:
            fill = n
        elif fill + n > budget:
            b += 1
            fill = n
        else:
            fill += n
        bins.append(b)
    return np.asarray(bins, dtype=np.int64)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_greedy_bins_matches_state_machine(seed):
    rng = np.random.default_rng(seed)
    ntok = rng.integers(1, 300, size=500)
    got = greedy_bins(ntok, 512)
    exp = _reference_bins(ntok, 512)
    np.testing.assert_array_equal(got, exp)


def test_overflow_doc_sits_alone():
    ntok = np.array([100, 900, 50, 60, 900, 10])
    got = greedy_bins(ntok, 512)
    # 100 | 900 | 50+60 | 900 | 10
    np.testing.assert_array_equal(got, [0, 1, 2, 2, 3, 4])


def test_empty_and_single():
    assert len(greedy_bins(np.array([], dtype=np.int64), 512)) == 0
    np.testing.assert_array_equal(greedy_bins(np.array([7]), 512), [0])


def test_pack_sequences_partitioning_independent(ray_session):
    import ray.data

    from rasterflow.pipelines.packing import pack_sequences

    rng = np.random.default_rng(5)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "source": [f"s{i % 7}" for i in range(400)],
            "text": [" ".join(["w"] * int(n)) for n in rng.integers(1, 120, 400)],
        }
    )
    outs = []
    for blocks in (1, 9):
        ds = ray.data.from_pandas(docs).repartition(blocks)
        outs.append(pack_sequences(ds, budget=256).to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # bins respect the budget except documented overflow singletons
    assign = (
        pack_sequences(ray.data.from_pandas(docs), budget=256, per_bin=False)
        .to_pandas()
    )
    per_bin = assign.groupby(["source", "bin_id"]).agg(
        tok=("n_tok", "sum"), n=("n_tok", "size")
    )
    over = per_bin[per_bin["tok"] > 256]
    assert (over["n"] == 1).all()


def test_pack_sequences_token_col(ray_session):
    """A precomputed token-count column skips the text pass."""
    import ray.data

    from rasterflow.pipelines.packing import pack_sequences

    df = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64),
            "source": ["a"] * 50,
            "ntoks": np.full(50, 100, dtype=np.int64),
        }
    )
    out = (
        pack_sequences(
            ray.data.from_pandas(df), budget=512, token_col="ntoks", per_bin=True
        )
        .to_pandas()
    )
    # 5 docs x 100 tokens per bin
    assert (out["n_docs"] == 5).all() and (out["tok_sum"] == 500).all()


def _chunk_reference(text, chunk, overlap):
    toks = [t for t in text.split() if t]
    stride = chunk - overlap
    out = []
    for i, s in enumerate(range(0, len(toks), stride)):
        w = toks[s : s + chunk]
        out.append((i, len(w), " ".join(w)))
    return out


def test_chunk_documents_matches_reference(ray_session):
    import ray.data

    from rasterflow.pipelines.packing import chunk_documents

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{j}" for j in rng.integers(0, 50, n))
        for n in list(rng.integers(1, 90, 60)) + [0]  # includes an empty doc
    ]
    texts[5] = "  " + texts[5] + "   "  # leading/trailing whitespace
    docs = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    got = (
        chunk_documents(ray.data.from_pandas(docs).repartition(4), chunk_tokens=16, overlap=4)
        .to_pandas()
    )
    exp_rows = []
    for did, txt in zip(docs["doc_id"], docs["text"]):
        for cid, ntok, ctext in _chunk_reference(txt, 16, 4):
            exp_rows.append((did, cid, ntok, ctext))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "chunk_id", "n_tok", "chunk_text"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)
    # the empty doc contributed nothing
    assert (got["doc_id"] != len(texts) - 1).all()


def test_chunk_documents_zero_overlap(ray_session):
    import ray.data

    from rasterflow.pipelines.packing import chunk_documents

    docs = pd.DataFrame({"doc_id": [0], "text": [" ".join(str(i) for i in range(10))]})
    got = chunk_documents(ray.data.from_pandas(docs), chunk_tokens=4, overlap=0).to_pandas()
    assert got["n_tok"].tolist() == [4, 4, 2]
    assert got["chunk_text"].tolist() == ["0 1 2 3", "4 5 6 7", "8 9"]


def test_chunk_documents_rejects_bad_overlap(ray_session):
    import ray.data

    from rasterflow.pipelines.packing import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(None, chunk_tokens=8, overlap=8)


def test_ragged_arange():
    from rasterflow.pipelines.packing import _ragged_arange

    np.testing.assert_array_equal(_ragged_arange(np.array([3, 1, 2])), [0, 1, 2, 0, 0, 1])
    assert len(_ragged_arange(np.array([], dtype=np.int64))) == 0
    np.testing.assert_array_equal(_ragged_arange(np.array([1])), [0])


def test_compress_cdf_conserves_mass_and_extremes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rasterflow.pipelines.sketch import _compress_cdf

    @settings(max_examples=50, deadline=None)
    @given(n=st.integers(1, 3000), c=st.integers(2, 64), seed=st.integers(0, 10**6))
    def check(n, c, seed):
        rng = np.random.default_rng(seed)
        v = rng.normal(size=n)
        w = rng.random(n) + 0.01
        cv, cw = _compress_cdf(v, w, c)
        assert len(cv) <= max(c + 2, n)
        np.testing.assert_allclose(cw.sum(), w.sum(), rtol=1e-12)
        assert cv[0] == v.min() and cv[-1] == v.max()
        assert (np.diff(cv) >= 0).all()
        assert (cw > 0).all()

    check()


def test_training_prep_matches_pandas_composition(ray_session):
    """The composed pipeline ≡ the same three stages applied with pandas."""
    import ray.data

    from rasterflow.pipelines.curation import training_prep
    from rasterflow.pipelines.packing import greedy_bins

    rng = np.random.default_rng(21)
    n = 300
    texts = [" ".join(f"w{j}" for j in rng.integers(0, 40, rng.integers(1, 60))) for _ in range(n)]
    # engineered duplicates across the quality boundary
    texts[50] = texts[10]
    texts[51] = texts[10]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"s{i % 5}" for i in range(n)],
            "text": texts,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    got = training_prep(
        ray.data.from_pandas(docs).repartition(4), budget=64, q=0.5
    ).to_pandas()

    # pandas reference with the SAME rules
    sv = np.sort(docs["n_chars"].to_numpy())
    thr = sv[int(np.ceil(0.5 * n)) - 1]
    kept = docs[docs["n_chars"] >= thr]
    ded = kept.loc[kept.groupby("text")["doc_id"].idxmin()].sort_values("doc_id")
    ded = ded.assign(n_tok=ded["text"].str.split().str.len())
    rows = []
    for src, g in ded.groupby("source"):
        g = g.sort_values("doc_id")
        bins = greedy_bins(g["n_tok"].to_numpy(), 64)
        agg = g.assign(bin_id=bins).groupby("bin_id").agg(
            n_docs=("doc_id", "size"), tok_sum=("n_tok", "sum")
        ).reset_index()
        agg.insert(0, "source", src)
        rows.append(agg)
    exp = pd.concat(rows, ignore_index=True)[["source", "bin_id", "n_docs", "tok_sum"]]
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp, check_dtype=False)
