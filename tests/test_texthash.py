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
