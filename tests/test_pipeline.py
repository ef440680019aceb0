"""End-to-end pipeline tests against planted ground truth (SURVEY.md §5:
pipeline-level tests on deterministic synthetic tables with known clusters,
dup-pair recall >= 0.99 at fixed signature config)."""

import numpy as np
import pyarrow as pa
import pytest

from courlan_ray.config import DedupConfig
from courlan_ray.sources import synth
from courlan_ray.pipelines.image_dedup import dedup_pipeline, pair_recall

N = 800
SEED = 42


@pytest.fixture(scope="module")
def synth_path(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    return synth.synth_parquet(N, SEED, root=root)


@pytest.fixture(scope="module")
def result(synth_path):
    import ray.data as rd
    cfg = DedupConfig(signature_concurrency=2)
    out = dedup_pipeline(rd.read_parquet(synth_path), cfg)
    clusters = out["clusters"].to_pandas()
    counters = out["counters"].to_pandas()
    return clusters, counters


def test_recall_at_least_99(result):
    clusters, _ = result
    pairs, _ = synth.truth_tables(N, SEED)
    r = pair_recall(pa.Table.from_pandas(clusters), pairs)
    assert r >= 0.99, r


def test_no_cluster_mixes_truth_groups(result):
    clusters, _ = result
    _, truth = synth.truth_tables(N, SEED)
    tmap = truth.to_pandas().set_index("image_id")["cluster_id"]
    multi = clusters[clusters.groupby("cluster_id")["image_id"]
                     .transform("size") > 1].copy()
    multi["truth"] = multi["image_id"].map(tmap)
    mixing = multi.groupby("cluster_id")["truth"].nunique()
    assert (mixing > 1).sum() == 0


def test_one_representative_per_cluster(result):
    clusters, _ = result
    reps = clusters.groupby("cluster_id")["is_representative"].sum()
    assert (reps == 1).all()
    # representative is the min image_id (order-free determinism)
    rep_rows = (clusters[clusters["is_representative"]]
                .set_index("cluster_id")["image_id"].sort_index())
    mins = clusters.groupby("cluster_id")["image_id"].min().sort_index()
    assert (rep_rows == mins).all()


def test_invalid_rows_excluded_and_counted(result):
    clusters, counters = result
    plan = synth.row_plan(np.arange(N), SEED)
    invalid_ids = {f"img-{i:012d}"
                   for i in np.flatnonzero(plan["kind"] == synth.KIND_INVALID)}
    assert invalid_ids.isdisjoint(set(clusters["image_id"]))
    rejected = counters[counters["reject_reason"] != ""]["n"].sum()
    assert rejected == len(invalid_ids)


def test_cluster_sizes_match_column(result):
    clusters, _ = result
    sizes = clusters.groupby("cluster_id")["image_id"].transform("size")
    assert (clusters["cluster_size"] == sizes).all()


@pytest.mark.slow
def test_recall_at_fixtures_scale(tmp_path_factory):
    """FIXTURES.md §A / VERDICT round 1 #2: recall >= 0.99 at the declared
    ~50k-row scale with the skewed duplicate plan (not just N=800)."""
    import ray.data as rd
    n = 50_000
    root = str(tmp_path_factory.mktemp("synth50k"))
    path = synth.synth_parquet(n, SEED, root=root)
    out = dedup_pipeline(rd.read_parquet(path), DedupConfig())
    clusters = out["clusters"].to_pandas()
    pairs, _ = synth.truth_tables(n, SEED)
    r = pair_recall(pa.Table.from_pandas(clusters), pairs)
    assert r >= 0.99, r


def test_forced_scale_paths_small_cluster(synth_path):
    """Regression for the round-2 executor stall: force EVERY size-adaptive
    stage onto its keyed-shuffle scale path simultaneously (exact-dedup
    shuffle, LSH cross-block link, joined verify, distributed components)
    so the maximum number of hash-shuffle aggregator pools is live at once
    on the 4-CPU test cluster.  Stacked pool CPU reservations twice starved
    the upstream 1-CPU map tasks (84%-idle livelock); the budget invariant
    lives in joins.keyed_shuffle_partitions + courlan_ray.__init__.
    Completing at all — with unchanged recall — is the assertion."""
    import ray.data as rd
    cfg = DedupConfig(signature_concurrency=2,
                      lsh_driver_link_max=0,
                      verify_broadcast_max=0,
                      driver_cc_max_pairs=0)
    out = dedup_pipeline(rd.read_parquet(synth_path), cfg)
    clusters = out["clusters"].to_pandas()
    pairs, _ = synth.truth_tables(N, SEED)
    assert pair_recall(pa.Table.from_pandas(clusters), pairs) >= 0.99


def test_single_row_and_empty_inputs(synth_path):
    """Degenerate inputs: one row -> one singleton cluster; zero rows ->
    typed empty outputs (no crash in membership gather / schema probes)."""
    import ray.data as rd
    full = dedup_pipeline(rd.read_parquet(synth_path).limit(1), DedupConfig())
    df = full["clusters"].to_pandas()
    one_valid = dedup_pipeline(
        rd.read_parquet(synth_path).limit(1), DedupConfig())["rejected"] \
        .count() == 0
    # exactly one singleton when the row passes gates; zero when rejected
    assert len(df) == (1 if one_valid else 0)
    if len(df):
        assert df["cluster_size"].tolist() == [1]
        assert df["is_representative"].all()

    empty = dedup_pipeline(
        rd.read_parquet(synth_path).filter(expr="image_id == 'nope'"),
        DedupConfig())
    assert empty["clusters"].count() == 0
    assert empty["verified_pairs"].count() == 0
    assert empty["clusters"].schema().names == [
        "image_id", "cluster_id", "cluster_size", "is_representative"]
