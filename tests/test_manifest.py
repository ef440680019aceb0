"""Checkpoint / resume tests (SURVEY.md §5c: kill between stages, re-run,
identical output; §7.4: config change invalidates downstream only)."""

import dataclasses
import os
import shutil

import pytest

from courlan_ray.config import DedupConfig
from courlan_ray.sources import synth
from courlan_ray.state.manifest import Checkpoint
from courlan_ray.pipelines.image_dedup import dedup_pipeline

N = 400


@pytest.fixture(scope="module")
def synth_path(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_ck"))
    return synth.synth_parquet(N, 42, root=root)


def _run(synth_path, ck_root, cfg):
    import ray.data as rd
    ck = Checkpoint(ck_root, cfg)
    out = dedup_pipeline(rd.read_parquet(synth_path), cfg, checkpoint=ck)
    clusters = out["clusters"].to_pandas().sort_values("image_id") \
        .reset_index(drop=True)
    return clusters, ck


def test_resume_skips_completed_stages(synth_path, tmp_path):
    cfg = DedupConfig(signature_concurrency=2)
    root = str(tmp_path / "ck")
    c1, ck1 = _run(synth_path, root, cfg)
    statuses1 = {r["stage"]: r["status"] for r in ck1.records()}
    assert statuses1 == {"exact_edges": "computed", "sigtable": "computed",
                         "candidates": "computed", "verified_pairs": "computed"}

    c2, ck2 = _run(synth_path, root, cfg)
    last = {r["stage"]: r["status"] for r in ck2.records()[4:]}
    assert set(last.values()) == {"skipped"}
    # resumed output is identical
    assert c1.equals(c2)


def test_config_change_invalidates_downstream_only(synth_path, tmp_path):
    cfg = DedupConfig(signature_concurrency=2)
    root = str(tmp_path / "ck")
    _run(synth_path, root, cfg)

    # loosen a verification threshold: sigtable/candidates hit cache,
    # verified_pairs recomputes
    cfg2 = dataclasses.replace(cfg, jaccard_threshold=0.7)
    _, ck2 = _run(synth_path, root, cfg2)
    n2 = len(ck2.records())
    statuses = {r["stage"]: r["status"] for r in ck2.records()[4:]}
    assert statuses["exact_edges"] == "skipped"
    assert statuses["sigtable"] == "skipped"
    assert statuses["candidates"] == "skipped"
    assert statuses["verified_pairs"] == "computed"

    # changing the signature config recomputes everything downstream
    cfg3 = dataclasses.replace(cfg, num_perm=64, bands=16)
    _, ck3 = _run(synth_path, root, cfg3)
    statuses = {r["stage"]: r["status"] for r in ck3.records()[n2:]}
    assert statuses["sigtable"] == "computed"
    assert statuses["candidates"] == "computed"
    assert statuses["verified_pairs"] == "computed"


def test_mid_run_kill_resume(synth_path, tmp_path):
    """Simulate a crash after the signature stage: later stage dirs are
    missing, earlier ones survive; resume recomputes only the tail."""
    cfg = DedupConfig(signature_concurrency=2)
    root = str(tmp_path / "ck")
    c1, ck1 = _run(synth_path, root, cfg)
    # wipe the candidate + pair checkpoints ("killed mid-run")
    for rec in ck1.records():
        if rec["stage"] in ("candidates", "verified_pairs"):
            shutil.rmtree(rec["out_dir"], ignore_errors=True)
    c2, ck2 = _run(synth_path, root, cfg)
    statuses = {r["stage"]: r["status"] for r in ck2.records()[4:]}
    assert statuses["exact_edges"] == "skipped"
    assert statuses["sigtable"] == "skipped"
    assert statuses["candidates"] == "computed"
    assert statuses["verified_pairs"] == "computed"
    assert c1.equals(c2)


def test_run_sharded_resumes_per_shard(tmp_path):
    """Shard-granular resume: completed shards are never recomputed."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd
    from courlan_ray.config import DedupConfig
    from courlan_ray.state.manifest import Checkpoint

    files = []
    for i in range(6):
        p = str(tmp_path / f"in{i}.parquet")
        pq.write_table(pa.table({"x": pa.array([i * 10 + j for j in range(5)],
                                               pa.int64())}), p)
        files.append(p)

    calls = []

    def make(ds):
        calls.append(1)
        return ds.map_batches(
            lambda b: b.append_column("y", pa.array(
                [v * 2 for v in b["x"].to_pylist()], pa.int64())),
            batch_format="pyarrow")

    root = str(tmp_path / "ck")
    ck = Checkpoint(root, DedupConfig())
    out = ck.run_sharded("sigtable", files, make, n_shards=3)
    assert out.count() == 30 and len(calls) == 3

    # simulate a mid-run crash: delete ONE shard's marker
    out_root = ck._dir("sigtable")
    victim = os.path.join(out_root, "shard-00001")
    os.remove(os.path.join(victim, "_SUCCESS"))

    calls.clear()
    ck2 = Checkpoint(root, DedupConfig())
    out2 = ck2.run_sharded("sigtable", files, make, n_shards=3)
    assert out2.count() == 30 and len(calls) == 1   # only the victim reran
    recs = [r for r in ck2.records() if r.get("status") == "shard_skipped"]
    assert len(recs) >= 2
    got = sorted(out2.to_pandas()["y"])
    assert got == sorted(v * 2 for f in range(6) for v in
                         range(f * 10, f * 10 + 5))


def test_run_persists_empty_stage(tmp_path):
    """A zero-row stage must write a schema-bearing empty parquet so the
    resumed read returns the same typed empty dataset."""
    import pyarrow as pa
    import ray.data as rd
    from courlan_ray.config import DedupConfig
    from courlan_ray.state.manifest import Checkpoint

    def make():
        return rd.from_arrow(pa.table({
            "left_id": pa.array([], pa.string()),
            "right_id": pa.array([], pa.string())}))

    root = str(tmp_path / "ck")
    ck = Checkpoint(root, DedupConfig())
    out = ck.run("exact_edges", make)
    assert out.count() == 0
    assert out.schema().names == ["left_id", "right_id"]
    # resume hits the cached directory
    out2 = Checkpoint(root, DedupConfig()).run("exact_edges", make)
    assert out2.count() == 0 and out2.schema().names == ["left_id", "right_id"]


def test_run_sharded_no_spurious_partition_column(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from courlan_ray.config import DedupConfig
    from courlan_ray.state.manifest import Checkpoint

    p = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({"x": pa.array([1, 2, 3], pa.int64())}), p)
    ck = Checkpoint(str(tmp_path / "ck"), DedupConfig())
    out = ck.run_sharded("sigtable", [p], lambda ds: ds, n_shards=2)
    assert out.schema().names == ["x"]          # no hive 'shard' column

def test_run_sharded_empty_shard(tmp_path):
    """A shard whose transform drops every row must still complete (write a
    schema-bearing empty parquet, mark _SUCCESS) instead of crashing on the
    missing tmp directory — ADVICE round 2 (manifest.py run_sharded)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from courlan_ray.config import DedupConfig
    from courlan_ray.state.manifest import Checkpoint

    files = []
    for i in range(2):
        p = str(tmp_path / f"in{i}.parquet")
        pq.write_table(pa.table({"x": pa.array([i * 10 + j for j in range(5)],
                                               pa.int64())}), p)
        files.append(p)

    def make(ds):
        # drops ALL rows of shard 1 (x >= 10), keeps shard 0
        return ds.filter(expr="x < 5")

    root = str(tmp_path / "ck")
    ck = Checkpoint(root, DedupConfig())
    out = ck.run_sharded("sigtable", files, make, n_shards=2)
    assert out.count() == 5
    assert out.schema().names == ["x"]
    out_root = ck._dir("sigtable")
    # both shards completed (markers present), incl. the empty one
    for s in range(2):
        assert os.path.exists(os.path.join(out_root, f"shard-{s:05d}",
                                           "_SUCCESS"))
    # resume recomputes nothing and returns the same rows
    out2 = Checkpoint(root, DedupConfig()).run_sharded(
        "sigtable", files, lambda ds: (_ for _ in ()).throw(
            AssertionError("shard recomputed")), n_shards=2)
    assert out2.count() == 5
