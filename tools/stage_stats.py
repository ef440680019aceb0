"""Per-stage execution report for the flagship pipeline from Ray Data's
own ``ds.stats()`` — the measure-don't-guess loop: run, read which
operator dominates wall time, iterate.

    PYTHONPATH=/root/repo python tools/stage_stats.py [rows]

Prints one line per (stage, operator) with wall time, task count, and
output rows, then the pipeline totals.  Uses the same synthetic input as
bench.py (cached parquet).
"""

from __future__ import annotations

import os
import re
import sys
import time


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from courlan_ray.config import DedupConfig
    from courlan_ray.pipelines.image_dedup import dedup_pipeline
    from courlan_ray.sources.synth import synth_parquet

    path = synth_parquet(rows, 42)
    t0 = time.time()
    out = dedup_pipeline(rd.read_parquet(path), DedupConfig())
    clusters = out["clusters"].materialize()
    wall = time.time() - t0

    # ds.stats() of the final dataset covers its whole lineage; the
    # pipeline's materialized intermediates each carry their own stats
    print(f"== flagship {rows} rows: {wall:.2f}s end-to-end ==")
    for name in ("clusters", "verified_pairs", "counters"):
        ds = out[name] if name != "clusters" else clusters
        try:
            stats = ds.stats()
        except Exception:
            continue
        print(f"\n-- {name} lineage --")
        for m in re.finditer(
                r"Operator (\d+) (\S+):.*?\n.*?"
                r"\* Remote wall time: .*? max, ([\d.ms]+us?|[\d.]+[ms]?s?) "
                r"total", stats):
            pass
        # compact: one line per operator summary block
        for block in re.split(r"\n(?=Operator )", stats):
            head = block.splitlines()[0] if block else ""
            mwall = re.search(r"\* Remote wall time: .*?, (.*?) total", block)
            mrows = re.search(r"\* Output num rows per block: .*? "
                              r"(\d+) total", block)
            mtask = re.search(r"(\d+) tasks executed", block)
            if head.startswith("Operator"):
                print(f"  {head[:72]:72s} wall={mwall.group(1) if mwall else '?':>10s}"
                      f" tasks={mtask.group(1) if mtask else '?':>4s}"
                      f" rows={mrows.group(1) if mrows else '?'}")
    ray.shutdown()


if __name__ == "__main__":
    main()
