"""Scale-robustness probes for the flagship image-dedup pipeline.

Two evidence modes (VERDICT r4 "next round" items 3 and 5), each run in a
fresh process so `ray.init` owns the session:

  python probe_robustness.py skew  [--rows 1000000] [--hot 200] [--cpus 32]
      Plants a hot band (``--hot`` permille of body rows share ONE constant
      caption -> one LSH bucket per MinHash band) and measures wall time,
      dup-pair recall, and the per-bucket emission bounds that prove the
      salting/star-edge design holds at row scale:
        - raw_max_bucket_total: members of the hottest (band, bucket) —
          the O(n²)-pair blowup a naive LSH would emit pairs over
        - max_local_group: the largest (bucket, salt) group ANY single
          kernel invocation actually materializes (bounded by salting +
          block size, independent of bucket heat)
        - candidate_edges: total emitted candidates (linear in members —
          star edges + per-bucket rep links, never |bucket|²)
      With --hot 10 the same corpus shape is ~1% hot (the generator
      default), giving the uniform comparison row.

  python probe_robustness.py spill [--rows 500000] [--cpus 32] [--store-gb 4]
      Runs the flagship with the object store constrained to --store-gb
      (default 4 GiB vs the ~37 GiB default) and reports completion,
      recall, spill bytes and throughput — the backpressure story: the
      streaming executor must degrade by spilling, not OOM.

  python probe_robustness.py resume [--rows 200000] [--cpus 32]
      Runs the flagship with a durable Checkpoint, then simulates a crash
      between stages (drops everything after ``candidates``) and re-runs:
      the upstream stages (sigtable = the expensive decode traversal,
      exact_edges, candidates) must be SKIPPED via the manifest, the
      resumed wall time must be a small fraction of the cold run, and the
      final cluster table must be identical.

Timed region matches bench.py exactly (page-cache warm + task-worker
warmup outside it); diagnostics run untimed after the headline.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time


def _warm(path: str, ncpu: int) -> None:
    import ray
    for f in glob.glob(os.path.join(path, "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 24):
                pass
    w = ray.remote(num_cpus=1)(lambda: 0)
    ray.get([w.remote() for _ in range(ncpu)])


def _spilled_bytes() -> int:
    """Object-store spill bytes of the current session, from the raylet
    log's cumulative "Spilled N MiB" lines (0 if none).  (The stats API
    needs the grpc wheel, absent in this sandbox.)"""
    import ray
    sess = ray._private.worker._global_node.get_session_dir_path()
    best = 0
    try:
        with open(os.path.join(sess, "logs", "raylet.out"),
                  errors="ignore") as fh:
            for line in fh:
                m = re.search(r"Spilled (\d+) MiB", line)
                if m:
                    best = max(best, int(m.group(1)))
    except OSError:
        pass
    return best << 20


def _flagship(path: str):
    import ray.data as rd
    from courlan_ray.config import DedupConfig
    from courlan_ray.pipelines.image_dedup import dedup_pipeline

    t0 = time.time()
    out = dedup_pipeline(rd.read_parquet(path), DedupConfig())
    clusters = out["clusters"].materialize()
    n = clusters.count()
    return out, clusters, n, time.time() - t0


def _recall(clusters, rows: int, hot: int) -> float:
    from courlan_ray.pipelines.image_dedup import pair_recall
    from courlan_ray.sources.synth import truth_tables
    from courlan_ray.stages.joins import _collect
    tp, _ = truth_tables(rows, 42, hot)
    return round(pair_recall(_collect(clusters), tp), 5)


def _bucket_stats(path: str, cfg) -> dict:
    """Untimed: recompute the narrow sigtable once and aggregate the LSH
    level-1 rep rows (one per (block, bucket, salt), carrying the local
    member count) into the bucket-heat evidence numbers."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from courlan_ray.stages.lsh import _local_stars
    from courlan_ray.stages.signatures import compute_signatures

    sig = compute_signatures(rd.read_parquet(path), cfg, with_gates=True)

    def partial(b: pa.Table) -> pa.Table:
        st1 = _local_stars(b, cfg)
        reps = st1.filter(st1["is_rep"])
        g = reps.group_by("bucket").aggregate(
            [("cnt", "sum"), ("cnt", "max"), ("cnt", "count")])
        return pa.table({"bucket": g["bucket"], "total": g["cnt_sum"],
                         "local_max": g["cnt_max"], "reps": g["cnt_count"]})

    parts = sig.map_batches(partial, batch_format="pyarrow",
                            batch_size=cfg.batch_size)
    import pandas as pd
    df = parts.to_pandas()          # one row per (block, bucket): small
    by = df.groupby("bucket").agg(total=("total", "sum"),
                                  local_max=("local_max", "max"),
                                  reps=("reps", "sum"))
    hottest = by["total"].idxmax()
    return {
        "raw_max_bucket_total": int(by["total"].max()),
        "max_local_group": int(by["local_max"].max()),
        "hottest_bucket_rep_rows": int(by.loc[hottest, "reps"]),
        "n_buckets": int(len(by)),
    }


def _resume_probe(rows: int, cpus: int) -> dict:
    import shutil

    import pandas as pd
    import ray.data as rd
    from courlan_ray.config import DedupConfig
    from courlan_ray.pipelines.image_dedup import dedup_pipeline
    from courlan_ray.sources.synth import synth_parquet
    from courlan_ray.state.manifest import Checkpoint, STAGE_ORDER
    from courlan_ray.stages.joins import _collect

    path = synth_parquet(rows, 42)
    _warm(path, cpus)
    root = "/tmp/probe_resume_ck"
    shutil.rmtree(root, ignore_errors=True)
    cfg = DedupConfig()

    def run():
        ck = Checkpoint(root, cfg, input_fingerprint=path)
        t0 = time.time()
        out = dedup_pipeline(rd.read_parquet(path), cfg, checkpoint=ck)
        df = _collect(out["clusters"]).to_pandas()
        cols = sorted(df.columns)
        return df[cols].sort_values(cols).reset_index(drop=True), \
            time.time() - t0

    cold_df, cold_sec = run()

    # crash between stages: everything after `candidates` is lost
    keep = set(STAGE_ORDER[:STAGE_ORDER.index("candidates") + 1])
    for d in os.listdir(root):
        stage = d.split("-")[1] if d.startswith("stage-") else None
        if stage and stage not in keep:
            shutil.rmtree(os.path.join(root, d))
    mark = sum(1 for _ in open(os.path.join(root, "manifest.jsonl")))

    warm_df, warm_sec = run()
    # manifest records appended by run 2: upstream stages must be skips
    recs = [json.loads(l) for l in
            open(os.path.join(root, "manifest.jsonl"))][mark:]
    skipped = {r["stage"] for r in recs if r.get("status") == "skipped"}
    pd.testing.assert_frame_equal(warm_df, cold_df, check_exact=True)
    return {
        "mode": "resume", "rows": rows, "num_cpus": cpus,
        "cold_sec": round(cold_sec, 1), "resumed_sec": round(warm_sec, 1),
        "resume_fraction": round(warm_sec / cold_sec, 3),
        "stages_skipped": sorted(skipped),
        "upstream_skipped": keep <= skipped,
        "clusters_identical": True,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["skew", "spill", "resume"])
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--hot", type=int, default=200)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--store-gb", type=float, default=4.0)
    args = ap.parse_args()
    rows = args.rows or {"skew": 1_000_000, "spill": 500_000,
                         "resume": 200_000}[args.mode]
    hot = args.hot if args.mode == "skew" else 10

    import ray
    import ray.data as rd
    kw = {}
    if args.mode == "spill" and args.store_gb > 0:  # 0 = unconstrained control
        kw["object_store_memory"] = int(args.store_gb * (1 << 30))
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR", **kw)
    rd.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from courlan_ray.config import DedupConfig
    from courlan_ray.sources.synth import synth_parquet

    if args.mode == "resume":
        print(json.dumps(_resume_probe(rows, args.cpus)))
        ray.shutdown()
        return

    path = synth_parquet(rows, 42, hot_permille=hot)
    _warm(path, args.cpus)

    out, clusters, n_clustered, wall = _flagship(path)
    res = {
        "mode": args.mode, "rows": rows, "hot_permille": hot,
        "num_cpus": args.cpus, "sec": round(wall, 1),
        "images_per_sec": round(rows / wall, 1),
        "rows_clustered": n_clustered,
        "recall": _recall(clusters, rows, hot),
        "spilled_bytes": _spilled_bytes(),
    }
    if args.mode == "spill":
        res["object_store_gb"] = args.store_gb
    if args.mode == "skew":
        from courlan_ray.stages.joins import _collect
        cdf = _collect(clusters).to_pandas()
        res["max_cluster_size"] = int(cdf.groupby("cluster_id").size().max())
        res["verified_pairs"] = out["verified_pairs"].count()
        res.update(_bucket_stats(path, DedupConfig()))
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
