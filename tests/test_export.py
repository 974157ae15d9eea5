"""Shard-export tests: written layout matches the manifest contract
(assignment, balance, within-shard order), and reruns are shard-resumable."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


def _docs(n=400):
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "n_chars": (np.arange(n) * 37 % 991).astype(np.int64),
            "text": [f"doc {i}" for i in range(n)],
        }
    )


def test_export_layout_and_order(ray_session, tmp_path):
    import ray.data

    from rasterflow.pipelines.export import export_shards
    from rasterflow.stages.texthash import mulrot_hash64

    docs = _docs()
    out = str(tmp_path / "shards")
    export_shards(ray.data.from_pandas(docs).repartition(5), out, num_shards=4)
    dirs = sorted(glob.glob(os.path.join(out, "shard=*")))
    assert len(dirs) == 4
    seen = 0
    for d in dirs:
        k = int(d.rsplit("=", 1)[1])
        t = pq.read_table(d).to_pandas()
        seen += len(t)
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            h = mulrot_hash64(ids)
        assert ((h % 4).astype(np.int64) == k).all()
        # within-shard (hash, id) order
        order = np.lexsort((t["doc_id"].to_numpy(), h))
        assert (order == np.arange(len(t))).all()
        # payload rode along
        assert (t["text"] == "doc " + t["doc_id"].astype(str)).all()
    assert seen == len(docs)


def test_manifest_matches_written_layout(ray_session, tmp_path):
    import ray.data

    from rasterflow.pipelines.export import export_shards, shard_manifest

    docs = _docs(300)
    ds = ray.data.from_pandas(docs).repartition(3)
    out = str(tmp_path / "shards")
    export_shards(ds, out, num_shards=3)
    man = shard_manifest(ds, num_shards=3, sum_col="n_chars").to_pandas()
    for _, row in man.iterrows():
        t = pq.read_table(os.path.join(out, f"shard={int(row['shard'])}")).to_pandas()
        assert len(t) == row["n_docs"]
        assert int(t["n_chars"].sum()) == row["sum_n_chars"]
        assert t["doc_id"].iloc[0] == row["first_doc"]
        assert t["doc_id"].iloc[-1] == row["last_doc"]


def test_shards_balanced(ray_session):
    import ray.data

    from rasterflow.pipelines.export import shard_manifest

    docs = _docs(4000)
    man = shard_manifest(ray.data.from_pandas(docs), num_shards=8).to_pandas()
    assert len(man) == 8
    # hash sharding keeps sizes within a loose band of the mean
    assert man["n_docs"].max() < 2 * man["n_docs"].min()
    assert man["n_docs"].sum() == 4000
