"""Flagship pipeline: normalize -> filter -> dedup -> cluster -> sample.

The end-to-end generalization of the reference's contract
(normalize→filter→dedup→sample, /root/reference/courlan/cli.py:112-132 +
urlstore.py:171-275 + sampling.py:15-68) over image+caption tables:

  read -> [canonicalize ∘ signatures]  (ONE actor-pool traversal of the
          wide byte payload: gates as columns + decode + phash + MinHash +
          SimHash + winnowing, fused — the "sigtable")
       -> exact dedup  (variant-invariant key over the narrow sigtable)
       -> LSH banding  (block-local salted star reduction + size-adaptive
                        cross-block link, 3 candidate channels)
       -> verify       (banded Jaccard + Hamming + LCS)
       -> components   (union-find / min-label propagation)
       -> assign + representatives (one-per-cluster draw)

Design for scale (SURVEY.md §7.3/§7.4 + VERDICT round 1):

- the wide binary payload is read from storage EXACTLY ONCE; it is
  consumed inside the signature actors and never crosses a shuffle or a
  second scan.  Every downstream stage reads the materialized narrow
  sigtable (ids, hashes, signature lists — ~100 bytes/row + minhash).
- exact-dup rows still get signatures (their decode is the price of the
  single traversal — cheaper than a second full scan to pre-filter them),
  but they are dropped before LSH so they add no candidate volume.
- no stage collects the corpus on the driver unconditionally: the LSH
  cross-block link and pair verification switch to keyed hash-shuffle /
  partitioned joins above configured thresholds.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DedupConfig, DEFAULT_CONFIG
from ..stages.canonicalize import reject_counters
from ..stages.exact_dedup import exact_dup_edges
from ..stages.signatures import compute_signatures
from ..stages.lsh import candidate_pairs
from ..stages.verify import verify_pairs
from ..stages.components import cluster_assignments


def dedup_pipeline(ds, cfg: DedupConfig = DEFAULT_CONFIG, *,
                   checkpoint=None) -> dict:
    """Full near-duplicate detection + clustering.

    Returns dict of Datasets:
      clusters: (image_id, cluster_id, is_representative, cluster_size)
      rejected: canonicalized rows with reject_reason != ''
      verified_pairs: scored pair table (lineage)
      counters: reject_reason counts

    The narrow sigtable and the (much smaller) edge/pair tables are pinned
    with ``materialize()``; with a ``checkpoint``
    (state.manifest.Checkpoint) they are written to partitioned parquet
    instead — the durable equivalent at 100 TB scale — and completed
    stages are skipped on resume.  For file-backed inputs the signature
    stage can additionally resume at SHARD granularity via
    ``checkpoint.run_sharded("sigtable", ds.input_files(), make)`` —
    one output directory per input-file shard, only unmarked shards
    recompute (state/manifest.py).
    """
    ck = checkpoint
    import os, sys, time
    prof = bool(os.environ.get("COURLAN_RAY_PROFILE"))
    t_start = time.time()

    def stage(name, make):
        t0 = time.time()
        if ck is None:
            out = make().materialize()
        else:
            out = ck.run(name, make)
        if prof:
            print(f"[stage] {name}: {time.time()-t0:.2f}s "
                  f"(cum {time.time()-t_start:.2f}s)", file=sys.stderr)
        return out

    # ONE traversal of the wide payload: gates + all signatures fused into
    # the actor pool; output is the narrow per-row signature table
    sigtable = stage("sigtable",
                     lambda: compute_signatures(ds, cfg, with_gates=True))
    if sigtable.count() == 0:           # empty input: typed empty outputs
        import ray.data as rd
        from ..stages.verify import _EMPTY_OUT
        empty_clusters = rd.from_arrow(pa.table({
            "image_id": pa.array([], pa.string()),
            "cluster_id": pa.array([], pa.string()),
            "cluster_size": pa.array([], pa.int64()),
            "is_representative": pa.array([], pa.bool_())}))
        return {"clusters": empty_clusters,
                "rejected": sigtable,
                "verified_pairs": rd.from_arrow(_EMPTY_OUT),
                "counters": rd.from_arrow(pa.table({
                    "reject_reason": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64())}))}
    valid = sigtable.filter(expr="valid == True")
    rejected = sigtable.filter(expr="valid == False")

    from ..stages.joins import filter_by_keys

    # sigtable already carries exact_key (computed in the signature actor)
    keyed_edges = stage("exact_edges", lambda: exact_dup_edges(valid, cfg))
    survivors = filter_by_keys(valid, keyed_edges,
                               "image_id", keep=False, keys_col="right_id",
                               num_partitions=cfg.shuffle_partitions)

    cands = stage("candidates", lambda: candidate_pairs(survivors, cfg))
    scored = stage("verified_pairs", lambda: verify_pairs(cands, valid, cfg))
    verified = scored.filter(expr="verified == True")

    edges = verified.select_columns(["left_id", "right_id"]).union(
        keyed_edges.select_columns(["left_id", "right_id"]))

    t0 = time.time()
    if prof:
        print(f"[stage] pre-components cum {t0-t_start:.2f}s",
              file=sys.stderr)
    all_ids = valid.select_columns(["image_id"])
    clusters = cluster_assignments(edges, all_ids, cfg)
    if prof:
        print(f"[stage] components: {time.time()-t0:.2f}s "
              f"(cum {time.time()-t_start:.2f}s)", file=sys.stderr)

    counters = reject_counters(sigtable)
    if prof:
        print(f"[stage] return cum {time.time()-t_start:.2f}s",
              file=sys.stderr)
    return {
        "clusters": clusters,
        "rejected": rejected,
        "verified_pairs": scored,
        "counters": counters,
    }


def pair_recall(clusters_tbl: pa.Table, truth_pairs: pa.Table) -> float:
    """Fraction of planted truth pairs whose two ids share a final cluster
    (the dup-pair recall >= 0.99 criterion, BASELINE.json)."""
    import pandas as pd

    cdf = clusters_tbl.to_pandas().set_index("image_id")["cluster_id"]
    tp = truth_pairs.to_pandas()
    l = tp["left_id"].map(cdf)
    r = tp["right_id"].map(cdf)
    ok = (l.notna()) & (r.notna()) & (l == r)
    return float(ok.mean()) if len(tp) else 1.0
