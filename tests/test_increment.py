"""Incremental-dedup tests: cross-corpus hits, within-delta dups, the
append flow across deliveries, and partition pruning of the probe."""

import glob
import os

import numpy as np
import pandas as pd
import pytest


def _df(ids, texts):
    return pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64), "text": texts})


def test_incremental_dedup_cross_and_within(ray_session, tmp_path):
    import ray.data

    from rasterflow.pipelines.increment import dedup_index_ingest, incremental_dedup

    idx = str(tmp_path / "idx")
    corpus = _df(range(100), [f"corpus {i}" for i in range(100)])
    dedup_index_ingest(ray.data.from_pandas(corpus).repartition(4), idx, num_parts=8)

    delta = _df(
        [200, 201, 202, 203, 204],
        [
            "corpus 7",      # cross-corpus dup -> dropped
            "fresh one",     # new -> kept
            "fresh two",     # new -> kept
            "fresh one",     # within-delta dup of 201 -> dropped
            "corpus 42",     # cross-corpus dup -> dropped
        ],
    )
    out = (
        incremental_dedup(ray.data.from_pandas(delta).repartition(3), idx)
        .to_pandas()
    )
    assert out["doc_id"].tolist() == [201, 202]
    assert out["text"].tolist() == ["fresh one", "fresh two"]


def test_incremental_dedup_append_across_deliveries(ray_session, tmp_path):
    import ray.data

    from rasterflow.pipelines.increment import dedup_index_ingest, incremental_dedup

    idx = str(tmp_path / "idx")
    dedup_index_ingest(
        ray.data.from_pandas(_df([0, 1], ["a", "b"])), idx, num_parts=4
    )
    d1 = _df([10, 11], ["c", "a"])
    out1 = incremental_dedup(ray.data.from_pandas(d1), idx, append=True).to_pandas()
    assert out1["doc_id"].tolist() == [10]  # "c" new, "a" already indexed
    # second delivery: "c" must now be seen (appended by delivery 1)
    d2 = _df([20, 21], ["c", "d"])
    out2 = incremental_dedup(ray.data.from_pandas(d2), idx, append=True).to_pandas()
    assert out2["doc_id"].tolist() == [21]


def test_probe_reads_only_delta_partitions(ray_session, tmp_path):
    """The probe lists only the index partitions the delta's hashes land in."""
    import ray.data

    from rasterflow.pipelines.increment import (
        _content_hashes,
        _parts_of,
        dedup_index_ingest,
        incremental_dedup,
    )

    idx = str(tmp_path / "idx")
    corpus = _df(range(200), [f"t{i}" for i in range(200)])
    dedup_index_ingest(ray.data.from_pandas(corpus), idx, num_parts=16)
    import pyarrow as pa

    h1, _ = _content_hashes(pa.array(["t5"], type=pa.string()))
    want = int(_parts_of(h1, 16)[0])
    # one-doc delta: its bucket exists and the result is correct
    assert os.path.isdir(os.path.join(idx, f"part={want}"))
    out = incremental_dedup(
        ray.data.from_pandas(_df([999], ["t5"])), idx
    ).to_pandas()
    assert len(out) == 0


def test_empty_delta_and_no_matches(ray_session, tmp_path):
    import ray.data

    from rasterflow.pipelines.increment import dedup_index_ingest, incremental_dedup

    idx = str(tmp_path / "idx")
    dedup_index_ingest(ray.data.from_pandas(_df([0], ["x"])), idx, num_parts=4)
    out = incremental_dedup(
        ray.data.from_pandas(_df([5, 6], ["y", "z"])), idx
    ).to_pandas()
    assert out["doc_id"].tolist() == [5, 6]
