"""Flagship pipeline: normalize -> filter -> dedup -> cluster -> sample.

The end-to-end generalization of the reference's contract
(normalize→filter→dedup→sample, /root/reference/courlan/cli.py:112-132 +
urlstore.py:171-275 + sampling.py:15-68) over image+caption tables:

  read -> canonicalize (stateless map_batches, gates as columns)
       -> exact dedup  (variant-invariant key, narrow shuffle)
       -> signatures   (actor pool: decode+phash+MinHash+SimHash+winnow)
       -> LSH banding  (salted bucket shuffle, 3 candidate channels)
       -> verify       (banded Jaccard + Hamming + LCS)
       -> components   (union-find / min-label propagation)
       -> assign + representatives (one-per-cluster draw)

Binary image payloads are consumed inside the signature actor and never
cross a shuffle; every wide operation moves only narrow id/signature
columns (SURVEY.md §7.3/§7.4).
"""

from __future__ import annotations

import pyarrow as pa

from ..config import DedupConfig, DEFAULT_CONFIG
from ..stages.canonicalize import canonicalize, reject_counters
from ..stages.exact_dedup import add_exact_key, exact_dup_edges
from ..stages.signatures import compute_signatures
from ..stages.lsh import candidate_pairs
from ..stages.verify import verify_pairs
from ..stages.components import connected_components, assign_clusters
from ..stages.sampling import cluster_representatives


def _exact_edges(valid_ds, cfg: DedupConfig):
    return exact_dup_edges(add_exact_key(valid_ds, cfg), cfg)


def dedup_pipeline(ds, cfg: DedupConfig = DEFAULT_CONFIG, *,
                   checkpoint=None) -> dict:
    """Full near-duplicate detection + clustering.

    Returns dict of Datasets:
      clusters: (image_id, cluster_id, is_representative, cluster_size)
      rejected: canonicalized rows with reject_reason != ''
      verified_pairs: scored pair table (lineage)
      counters: reject_reason counts

    Narrow intermediates (signatures, edges, pairs — id/hash columns only)
    are pinned with ``materialize()`` so downstream consumers and count()
    probes don't re-execute the wide upstream read+decode; with a
    ``checkpoint`` (state.manifest.Checkpoint) they are written to
    partitioned parquet instead, which is the durable equivalent at
    100 TB scale, and completed stages are skipped on resume.
    """
    ck = checkpoint

    def stage(name, make):
        if ck is None:
            return make().materialize()
        return ck.run(name, make)

    canon = canonicalize(ds, cfg)
    valid = canon.filter(expr="valid == True")
    rejected = canon.filter(expr="valid == False")

    from ..stages.joins import filter_by_keys

    # ONE narrow projection of the wide canonicalized stream is pinned;
    # every consumer except the signature pass (which needs the binary
    # payload and is fused into the actor pool) reads it instead of
    # re-executing the full read+canonicalize over the wide table
    valid_narrow = valid.select_columns(
        ["image_id", "caption_key", "phash"]).materialize()

    keyed_edges = stage("exact_edges",
                        lambda: _exact_edges(valid_narrow, cfg))
    survivors = filter_by_keys(add_exact_key(valid, cfg), keyed_edges,
                               "image_id", keep=False, keys_col="right_id",
                               num_partitions=cfg.shuffle_partitions)

    sigs = stage("signatures", lambda: compute_signatures(
        survivors.select_columns(["image_id", "caption_key", "bytes", "phash"]), cfg))

    cands = stage("candidates", lambda: candidate_pairs(sigs, cfg))
    scored = stage("verified_pairs", lambda: verify_pairs(cands, sigs, cfg))
    verified = scored.filter(expr="verified == True")

    edges = verified.select_columns(["left_id", "right_id"]).union(
        keyed_edges.select_columns(["left_id", "right_id"]))

    comp = connected_components(edges, cfg)
    all_ids = valid_narrow.select_columns(["image_id"])
    assigned = assign_clusters(all_ids, comp, cfg)
    clusters = cluster_representatives(assigned, cfg)

    return {
        "clusters": clusters,
        "rejected": rejected,
        "verified_pairs": scored,
        "counters": reject_counters(canon),
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
