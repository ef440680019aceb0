"""LSH banding, salted bucket shuffle, candidate-edge emission.

The band bucket key is the generalization of the reference's per-domain
grouping key ``hostinfo`` (/root/reference/courlan/urlutils.py:83-96 used at
urlstore.py:199-200): identical band rows -> same bucket -> per-bucket work.

Three candidate channels feed ONE unified (bucket, salt, image_id) stream:
  - MinHash caption bands  (near-dup captions, banded Jaccard)
  - phash 16-bit bands     (Hamming-ball: 4 bands find every pair with
    pixel-phash distance <= 3 by pigeonhole)
  - winnowing fingerprints (shared long substrings, suffix-array stand-in)

Candidate generation is **star-shaped and fully vectorized** — no per-group
Python, no O(|bucket|²) pair blowup:

  1. every bucket is salted into ``num_salts`` sub-buckets by
     ``hash(image_id) % S`` (north_rule: "explicit salting of hot bands"),
     so no single aggregation group or join partition sees more than
     ~|bucket|/S rows;
  2. ``groupby(bucket, salt).aggregate(Min(image_id))`` computes each
     sub-bucket's representative (C-vectorized sort-aggregate);
  3. star edges (sub_rep -> member) attach via a partitioned hash join;
  4. a second, tiny aggregate over sub-bucket reps links sub-buckets
     (bucket_rep -> sub_rep), preserving exactly the connectivity of the
     unsalted computation.

A star per bucket emits |bucket| edges instead of |bucket|² pairs;
transitive closure in the components stage recovers full clusters, and
verification prunes false-positive spokes (a true pair that loses its spoke
in one bucket still links through any of the other ~bands shared buckets).
Edge dedup across channels/bands is another vectorized aggregate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DedupConfig
from ..functions.hashing import band_keys, hash_u64_pair, hash_strings, splitmix64

_U64 = np.uint64

# channel tags folded into bucket keys so channels never collide
CH_MINHASH, CH_PHASH, CH_FINGERPRINT = 1, 2, 3


def banding_rows(sig_batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    """Signature rows -> exploded (bucket:int64, salt:int32, image_id) rows
    for all three channels.  Vectorized; output is narrow by design."""
    n = sig_batch.num_rows
    ids = sig_batch["image_id"]
    id_hash = hash_strings(ids.to_pylist(), seed=cfg.seed + 77)
    salt = (id_hash % _U64(cfg.num_salts)).astype(np.int32)

    buckets: list[np.ndarray] = []
    row_idx: list[np.ndarray] = []
    chan_tags: list[np.ndarray] = []

    if "minhash" in cfg.channels:
        mh = np.asarray(sig_batch["minhash"].combine_chunks().flatten()
                        .to_numpy(zero_copy_only=False)).view(_U64).reshape(n, cfg.num_perm)
        bk = band_keys(mh, cfg.bands, seed=cfg.seed + 11)      # (n, bands)
        ch = splitmix64(bk ^ _U64(CH_MINHASH))
        buckets.append(ch.ravel())
        row_idx.append(np.repeat(np.arange(n), cfg.bands))
        chan_tags.append(np.full(n * cfg.bands, CH_MINHASH))

    if "phash" in cfg.channels:
        # phash 16-bit bands (Hamming-ball multi-index)
        ph = sig_batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(_U64)
        nb = cfg.phash_bands
        width = 64 // nb
        mask = _U64((1 << width) - 1)
        pieces = np.empty((n, nb), dtype=_U64)
        for b in range(nb):
            piece = (ph >> _U64(b * width)) & mask
            pieces[:, b] = splitmix64(piece ^ splitmix64(np.full(n, _U64(b + 101))))
        ch2 = splitmix64(pieces ^ _U64(CH_PHASH))
        buckets.append(ch2.ravel())
        row_idx.append(np.repeat(np.arange(n), nb))
        chan_tags.append(np.full(n * nb, CH_PHASH))

    if "fingerprint" in cfg.channels:
        fp_list = sig_batch["fingerprints"].combine_chunks()
        fp_flat = np.asarray(fp_list.flatten().to_numpy(zero_copy_only=False)).view(_U64)
        fp_counts = np.diff(fp_list.offsets.to_numpy(zero_copy_only=False))
        ch3 = splitmix64(fp_flat ^ _U64(CH_FINGERPRINT))
        buckets.append(ch3)
        row_idx.append(np.repeat(np.arange(n), fp_counts))
        chan_tags.append(np.full(len(fp_flat), CH_FINGERPRINT))

    all_buckets = np.concatenate(buckets).view(np.int64)
    all_rows = np.concatenate(row_idx)
    chans = np.concatenate(chan_tags).astype(np.int8)
    return pa.table({
        "bucket": pa.array(all_buckets, pa.int64()),
        "salt": pa.array(salt[all_rows], pa.int32()),
        "ch": pa.array(chans, pa.int8()),
        "image_id": ids.take(pa.array(all_rows)),
    })


def _canon_edges(batch: pa.Table, left: str, right: str) -> pa.Table:
    """Order each edge (min, max), drop self-edges, add a dedup key."""
    l = batch[left].to_pandas().to_numpy(dtype=object)
    r = batch[right].to_pandas().to_numpy(dtype=object)
    swap = l > r
    l2 = np.where(swap, r, l)
    r2 = np.where(swap, l, r)
    keep = l2 != r2
    l2, r2 = l2[keep], r2[keep]
    pk = hash_u64_pair(hash_strings(l2, seed=1), hash_strings(r2, seed=2))
    return pa.table({"left_id": pa.array(l2, pa.string()),
                     "right_id": pa.array(r2, pa.string()),
                     "pair_key": pa.array(pk.view(np.int64), pa.int64())})


def candidate_pairs(sig_ds, cfg: DedupConfig):
    """Signatures -> distinct candidate (left_id, right_id) star edges.

    All shuffles move only (int64, int32, short string) columns; every
    aggregation is an associative combine tree (stages/agg.py), never
    per-group Python."""
    from .agg import grouped_agg
    from .joins import attach_by_key

    banded = sig_ds.map_batches(lambda b: banding_rows(b, cfg),
                                batch_format="pyarrow",
                                batch_size=cfg.batch_size)
    banded = banded.materialize()      # consumed by two branches below

    P = cfg.shuffle_partitions
    cap = cfg.weak_bucket_cap
    sub_min = grouped_agg(banded, ["bucket", "salt"],
                          [("image_id", "min", "sub_rep"),
                           ("image_id", "count", "sub_n"),
                           ("ch", "min", "ch")]).materialize()

    def weak_ok(b: pa.Table, n_col: str) -> pa.Table:
        # weak channels (phash band / fingerprint) are single-feature
        # collisions: buckets above the cap are noise (a common phrase, a
        # popular 16-bit phash band) and are dropped; full-signature
        # MinHash bands are never capped (the hot-band path relies on them)
        keep = pc.or_(pc.equal(b["ch"], pa.scalar(CH_MINHASH, pa.int8())),
                      pc.less_equal(b[n_col], pa.scalar(cap)))
        return b.filter(keep)

    # level-1 star edges: sub-bucket representative -> each member
    # (banded's own ch column is dropped; sub_min carries the same value)
    e1 = attach_by_key(banded.drop_columns(["ch"]), sub_min,
                       ["bucket", "salt"], num_partitions=P)
    e1 = e1.map_batches(lambda b: _canon_edges(weak_ok(b, "sub_n"),
                                               "sub_rep", "image_id"),
                        batch_format="pyarrow")

    # level-2 edges: bucket representative -> each sub-bucket representative
    bucket_min = grouped_agg(sub_min, ["bucket"],
                             [("sub_rep", "min", "bucket_rep"),
                              ("sub_n", "sum", "bucket_n"),
                              ("ch", "min", "bucket_ch")])
    e2 = attach_by_key(sub_min, bucket_min, ["bucket"], num_partitions=P)
    e2 = e2.map_batches(
        lambda b: _canon_edges(
            b.filter(pc.or_(pc.equal(b["bucket_ch"], pa.scalar(CH_MINHASH, pa.int8())),
                            pc.less_equal(b["bucket_n"], pa.scalar(cap)))),
            "bucket_rep", "sub_rep"),
        batch_format="pyarrow")

    # distinct edges across bands/channels via the same combine tree
    distinct = grouped_agg(e1.union(e2), ["pair_key"],
                           [("left_id", "min", "left_id"),
                            ("right_id", "min", "right_id")])
    return distinct.drop_columns(["pair_key"])
