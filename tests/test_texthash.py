"""Property tests for the vectorized flat-buffer text-hash kernels.

Each kernel is checked against a trivially-correct per-document reference
over adversarial inputs (empty docs, whitespace-only docs, multi-space runs,
short docs, non-ASCII UTF-8) — the edge cases the offsets arithmetic must
survive.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from rasterflow.stages.texthash import (
    OFFSET,
    P,
    PrefixHash,
    doc_hashes,
    flat_utf8,
    ngram_hashes,
    token_hashes,
    window_hashes,
)


def ref_poly(b: bytes) -> int:
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for c in b:
            h = h * P + np.uint64(c)
    return int(h)


def ref_doc(b: bytes) -> int:
    h = OFFSET
    with np.errstate(over="ignore"):
        for c in b:
            h = h * P + np.uint64(c)
    return int(h)


# text with whitespace runs, unicode, empties
texts_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab \t\n  é文!")),
        max_size=24,
    ),
    min_size=0,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_doc_hashes_match_reference(texts):
    col = pa.array(texts, type=pa.string())
    data, offs = flat_utf8(col)
    got = doc_hashes(data, offs)
    assert [int(g) for g in got] == [ref_doc(t.encode()) for t in texts]


@settings(max_examples=60, deadline=None)
@given(texts_strategy, st.integers(min_value=1, max_value=6))
def test_window_hashes_match_reference(texts, k):
    col = pa.array(texts, type=pa.string())
    data, offs = flat_utf8(col)
    wh, iptr = window_hashes(data, offs, k)
    for i, t in enumerate(texts):
        b = t.encode()
        if len(b) >= k:
            exp = [ref_poly(b[j : j + k]) for j in range(len(b) - k + 1)]
        else:
            exp = [ref_poly(b)]
        assert [int(x) for x in wh[iptr[i] : iptr[i + 1]]] == exp


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_token_hashes_match_split(texts):
    col = pa.array(texts, type=pa.string())
    data, offs = flat_utf8(col)
    th, tptr = token_hashes(data, offs)
    for i, t in enumerate(texts):
        exp = [ref_poly(w.encode()) for w in t.split()]
        assert [int(x) for x in th[tptr[i] : tptr[i + 1]]] == exp


@settings(max_examples=60, deadline=None)
@given(texts_strategy, st.integers(min_value=1, max_value=4))
def test_ngram_hashes_match_reference(texts, n):
    col = pa.array(texts, type=pa.string())
    data, offs = flat_utf8(col)
    th, tptr = token_hashes(data, offs)
    gh, gptr = ngram_hashes(th, tptr, n)

    def ref_grams(t):
        toks = t.split()
        if not toks:
            return set()
        hs = [np.uint64(ref_poly(w.encode())) for w in toks]
        out = set()
        with np.errstate(over="ignore"):
            if len(hs) < n:
                g = np.uint64(0)
                for h in hs:
                    g = g * P + h
                out.add(int(g))
            else:
                for j in range(len(hs) - n + 1):
                    g = np.uint64(0)
                    for h in hs[j : j + n]:
                        g = g * P + h
                    out.add(int(g))
        return out

    for i, t in enumerate(texts):
        seg = gh[gptr[i] : gptr[i + 1]]
        assert set(int(x) for x in seg) == ref_grams(t)
        # sorted unique within doc
        assert list(seg) == sorted(set(int(x) for x in seg))


def test_range_hashes_sliced_column():
    """flat_utf8 must honour a non-zero Arrow array offset (sliced column)."""
    col = pa.array(["aaa", "bbbb", "cc", "dd ee"], type=pa.string()).slice(1, 3)
    data, offs = flat_utf8(col)
    got = doc_hashes(data, offs)
    assert [int(g) for g in got] == [ref_doc(t.encode()) for t in ["bbbb", "cc", "dd ee"]]


# ---- consumer-level properties (round 3): the ADVICE r2 bugs were not in
# the kernels but in segment reductions OVER them (clamped reduceat), so pin
# the composed stages against per-doc evaluation under adversarial batches.


@settings(max_examples=60, deadline=None)
@given(texts_strategy)
def test_simhash_stage_batch_placement_independent(texts):
    """A doc's SimHash may not depend on its neighbors in the batch —
    including trailing/leading empty and whitespace-only docs."""
    from rasterflow.pipelines.dedup import SimHashStage

    stage = SimHashStage()
    batch = stage.simhashes(pa.array(texts, type=pa.string()))
    solo = [stage.simhashes(pa.array([t], type=pa.string()))[0] for t in texts]
    assert [int(x) for x in batch] == [int(x) for x in solo]


@settings(max_examples=60, deadline=None)
@given(texts_strategy, st.integers(min_value=2, max_value=6))
def test_minhash_signatures_batch_placement_independent(texts, k):
    from rasterflow.pipelines.dedup import MinHashSignatures

    stage = MinHashSignatures("text", "doc_id", num_perm=8, bands=4, shingle_k=k)
    batch = stage.signatures(pa.array(texts, type=pa.string()))
    for i, t in enumerate(texts):
        solo = stage.signatures(pa.array([t], type=pa.string()))[0]
        assert list(batch[i]) == list(solo)


@settings(max_examples=60, deadline=None)
@given(texts_strategy, st.integers(min_value=1, max_value=3))
def test_contamination_counts_match_per_doc_reference(ray_session, texts, n):
    """n_overlap per doc == |gram_set(doc) ∩ bench| regardless of where
    zero-gram docs sit in the batch."""
    import pandas as pd

    from rasterflow.pipelines.dedup import contamination_check
    from rasterflow.stages.texthash import flat_utf8, ngram_hashes, token_hashes

    if not texts:
        return
    # benchmark = gram set of the first doc
    col = pa.array([texts[0]], type=pa.string())
    data, offs = flat_utf8(col)
    th, tptr = token_hashes(data, offs)
    bench, _ = ngram_hashes(th, tptr, n)
    if len(bench) == 0:
        return

    import ray.data

    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    )
    out = contamination_check(ds, bench, ngram=n, min_overlap=1).to_pandas()
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    bset = set(int(b) for b in bench)
    for i, t in enumerate(texts):
        c = pa.array([t], type=pa.string())
        d2, o2 = flat_utf8(c)
        t2, p2 = token_hashes(d2, o2)
        g2, _ = ngram_hashes(t2, p2, n)
        exp = len(bset & set(int(g) for g in g2))
        assert got.get(i, 0) == exp
