"""``ray job submit``-shaped entrypoint for the flagship dedup pipeline.

On a real cluster (the north_rule's fixed N / 4N-node deployments):

    ray job submit --working-dir . -- \
        python jobs/dedup_job.py --input s3://bucket/images/ \
            --output s3://bucket/dedup-out/ --checkpoint s3://bucket/ck/

Locally (this sandbox) it runs against a local session.  The job script
OWNS the Ray session (the library never calls ray.init); inside a
``ray job submit`` driver ``ray.init(address="auto")`` attaches to the
submitting cluster.

Outputs (partitioned parquet under --output, resumable via --checkpoint):
    clusters/        image_id, cluster_id, cluster_size, is_representative
    rejected/        gated rows with reject_reason
    verified_pairs/  scored pair lineage
    counters/        reject-reason histogram
    metrics.json     row counts + wall time (the per-run metrics record)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="input table path (parquet dir/file or Lance)")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint root for shard-granular resume")
    p.add_argument("--language", default=None,
                   help="caption language gate (ISO 639-1), default off")
    p.add_argument("--strict", action="store_true")
    p.add_argument("--num-perm", type=int, default=None)
    p.add_argument("--bands", type=int, default=None)
    p.add_argument("--hamming-threshold", type=int, default=None)
    p.add_argument("--address", default=None,
                   help="ray address (default: auto inside a job, "
                        "local otherwise)")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        addr = args.address or ("auto" if os.environ.get("RAY_ADDRESS")
                                else "local")
        ray.init(address=addr, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    import dataclasses
    from courlan_ray.config import DedupConfig
    from courlan_ray.pipelines.image_dedup import dedup_pipeline
    from courlan_ray.sources.readers import read_table
    from courlan_ray.state.manifest import Checkpoint

    overrides = {k: v for k, v in {
        "language": args.language, "strict": args.strict or None,
        "num_perm": args.num_perm, "bands": args.bands,
        "hamming_threshold": args.hamming_threshold}.items()
        if v is not None}
    cfg = dataclasses.replace(DedupConfig(), **overrides)

    ck = Checkpoint(args.checkpoint, cfg) if args.checkpoint else None
    t0 = time.time()
    ds = read_table(args.input)
    out = dedup_pipeline(ds, cfg, checkpoint=ck)

    import glob
    import pyarrow.parquet as pq

    metrics: dict = {"input": args.input, "config": overrides}
    for name in ("clusters", "rejected", "verified_pairs", "counters"):
        path = os.path.join(args.output, name)
        out[name].write_parquet(path)
        os.makedirs(path, exist_ok=True)       # zero-row outputs
        # row counts from the written footers — counting the Dataset
        # would re-execute any non-materialized tail of the pipeline
        metrics[f"rows_{name}"] = int(sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(path, "*.parquet"))))
    metrics["wall_sec"] = round(time.time() - t0, 3)
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=1)
    print(json.dumps(metrics))
    if owns_session:            # never tear down a caller-owned session
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
