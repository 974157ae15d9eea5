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
