"""Resume semantics: crashed runs skip verified partitions, redo the rest."""

import json

import numpy as np
import pytest

from rasterflow.state.lineage import partition_files, read_manifest, run_resumable


def build_fn_factory(log):
    import ray.data

    def build(spec):
        log.append(spec)
        start, stop = spec
        return ray.data.range(stop - start).map_batches(
            lambda b: {"v": b["id"] + start}, batch_format="numpy"
        )

    return build


def test_run_and_resume(ray_session, tmp_path):
    parts = [(f"{i}", (i * 10, (i + 1) * 10)) for i in range(4)]
    log: list = []
    out = run_resumable(parts, build_fn_factory(log), tmp_path / "o")
    assert out["ran"] == ["0", "1", "2", "3"] and out["rows"] == 40
    # resume: nothing re-runs
    log2: list = []
    out2 = run_resumable(parts, build_fn_factory(log2), tmp_path / "o")
    assert out2["skipped"] == ["0", "1", "2", "3"] and log2 == []
    assert out2["rows"] == 40
    m = read_manifest(tmp_path / "o")
    assert set(m) == {"0", "1", "2", "3"}
    assert all(e["rows"] == 10 and e["wall_s"] >= 0 for e in m.values())


def test_resume_after_crash(ray_session, tmp_path):
    parts = [(f"{i}", (i * 10, (i + 1) * 10)) for i in range(4)]

    calls = {"n": 0}
    import ray.data

    def flaky(spec):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated crash")
        start, stop = spec
        return ray.data.range(stop - start)

    with pytest.raises(RuntimeError):
        run_resumable(parts, flaky, tmp_path / "o")
    # two partitions committed
    m = read_manifest(tmp_path / "o")
    assert set(m) == {"0", "1"}

    def ok(spec):
        start, stop = spec
        return ray.data.range(stop - start)

    out = run_resumable(parts, ok, tmp_path / "o")
    assert out["skipped"] == ["0", "1"]
    assert out["ran"] == ["2", "3"]


def test_corrupt_output_reruns(ray_session, tmp_path):
    parts = [("0", (0, 10))]
    import ray.data

    def ok(spec):
        return ray.data.range(10)

    run_resumable(parts, ok, tmp_path / "o")
    # corrupt: truncate one output file
    pdir = tmp_path / "o" / "part-0"
    f = next(p for p in pdir.iterdir() if p.is_file())
    f.write_bytes(b"junk")
    out = run_resumable(parts, ok, tmp_path / "o")
    assert out["ran"] == ["0"]


def test_torn_manifest_line_ignored(ray_session, tmp_path):
    parts = [("0", (0, 10))]
    import ray.data

    run_resumable(parts, lambda s: ray.data.range(10), tmp_path / "o")
    mp = tmp_path / "o" / "_manifest.jsonl"
    with mp.open("a") as fh:
        fh.write('{"partition_id": "1", "rows":')  # torn line
    m = read_manifest(tmp_path / "o")
    assert set(m) == {"0"}


def test_partition_files_deterministic():
    paths = [f"/x/f{i}.parquet" for i in range(7)]
    a = partition_files(list(reversed(paths)), 3)
    b = partition_files(paths, 3)
    assert a == b
    assert [pid for pid, _ in a] == ["00000", "00001", "00002"]


def test_changed_inputs_rebuild(ray_session, tmp_path):
    """A partition id whose recorded inputs differ from the current spec must
    rebuild, not silently reuse stale output (positional ids shift when the
    input list changes; ADVICE r1)."""
    parts = [("0", (0, 10)), ("1", (10, 20))]
    log: list = []
    run_resumable(parts, build_fn_factory(log), tmp_path / "o")
    assert log == [(0, 10), (10, 20)]
    # same partition ids, shifted input ranges -> both rebuild
    parts2 = [("0", (5, 15)), ("1", (15, 25))]
    log2: list = []
    out = run_resumable(parts2, build_fn_factory(log2), tmp_path / "o")
    assert out["ran"] == ["0", "1"] and log2 == [(5, 15), (15, 25)]
    # and re-running the shifted spec now skips
    log3: list = []
    out3 = run_resumable(parts2, build_fn_factory(log3), tmp_path / "o")
    assert out3["skipped"] == ["0", "1"] and log3 == []


def test_run_job_dedup_distributed_combine(ray_session, tmp_path, capsys, monkeypatch):
    """run_job --pipeline dedup: the final combine must be the distributed
    grouped_aggregate (VERDICT r2 #2), produce the same keep-list as a
    single-shot exact dedup, and dedupe duplicates spanning partitions."""
    import sys as _sys

    import pandas as pd
    import pyarrow.parquet as pq
    import ray.data

    from rasterflow.sources.fixtures import pages_batch

    # two input files with overlapping ids -> cross-partition exact dups
    ind = tmp_path / "pages"
    ind.mkdir()
    pq.write_table(pages_batch(np.arange(0, 60)), ind / "a.parquet")
    pq.write_table(pages_batch(np.arange(40, 100)), ind / "b.parquet")

    sys_path0 = list(_sys.path)
    import scripts.run_job as RJ

    out = tmp_path / "out"
    monkeypatch.setattr(
        _sys,
        "argv",
        ["run_job.py", "--pipeline", "dedup", "--input", str(ind),
         "--out", str(out), "--partition-size", "1"],
    )
    assert RJ.main() == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ran"] == ["00000", "00001"]
    got = ray.data.read_parquet(rep["final"]).to_pandas().sort_values("url").reset_index(drop=True)
    # single-shot oracle over the same pages
    from rasterflow.pipelines.dedup import exact_dedup
    from rasterflow.stages.extract import extract_text

    ds = ray.data.read_parquet([str(ind / "a.parquet"), str(ind / "b.parquet")])
    ds = ds.map_batches(extract_text, batch_format="pyarrow")
    exp = (
        exact_dedup(ds, content_col="text2", id_col="url")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert len(got) == 100  # 120 rows, 20 ids duplicated
    pd.testing.assert_frame_equal(got[["url", "n"]], exp[["url", "n"]])
    # resume: everything skips, final identical
    monkeypatch.setattr(
        _sys,
        "argv",
        ["run_job.py", "--pipeline", "dedup", "--input", str(ind),
         "--out", str(out), "--partition-size", "1"],
    )
    assert RJ.main() == 0
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["skipped"] == ["00000", "00001"]
    assert rep2["rows_out"] == 100
    _sys.path[:] = sys_path0


def test_micro_batch_append_only_new_partitions(ray_session, tmp_path):
    """VERDICT r2 #9: appending a micro-batch builds ONLY the new files'
    partitions (content-addressed ids — existing partitions never re-key),
    readers see the union, and the manifest version tracks appends."""
    import pyarrow.parquet as pq
    import ray.data

    from rasterflow.sources.fixtures import pages_batch
    from rasterflow.state.streaming import append_micro_batch, manifest_version, read_log
    from rasterflow.stages.extract import extract_text
    from rasterflow.stages.geocode import PreparePoints

    ind = tmp_path / "in"
    ind.mkdir()
    out = tmp_path / "log"

    def write(name, ids):
        pq.write_table(pages_batch(np.arange(*ids)), ind / name)
        return str(ind / name)

    def build(files):
        ds = ray.data.read_parquet(files, columns=["url", "warc_ts", "html"])
        ds = ds.map_batches(extract_text, batch_format="pyarrow")
        return ds.map_batches(
            PreparePoints(geocoder="text", text_col="text2", cell_res=20), batch_format="pyarrow"
        )

    f1 = write("a.parquet", (0, 40))
    f2 = write("b.parquet", (40, 80))
    r1 = append_micro_batch(out, [f1, f2], build, group_size=1)
    assert len(r1["ran"]) == 2 and r1["new_files"] == 2
    v1 = manifest_version(out)
    n1 = read_log(out).count()

    # delivery 2: one new file alongside the old ones
    f3 = write("c.parquet", (80, 100))
    r2 = append_micro_batch(out, [f1, f2, f3], build, group_size=1)
    assert len(r2["ran"]) == 1 and r2["skipped"] == [] and r2["new_files"] == 1
    assert manifest_version(out) != v1
    assert read_log(out).count() == n1 + 20

    # delivery 3: nothing new -> no work, version stable
    r3 = append_micro_batch(out, [f1, f2, f3], build, group_size=1)
    assert r3["ran"] == [] and r3["new_files"] == 0
    assert manifest_version(out) == r2["version"]

    # the log is a normal points dataset: spatial ops run over it directly
    from rasterflow.pipelines.ingest import count_in_box

    assert count_in_box(read_log(out), -1e18, -1e18, 1e18, 1e18) == read_log(out).count()
