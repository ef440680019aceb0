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
from .joins import cached_get

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


def _reduce_round(b: pa.Table) -> pa.Table:
    """One combine-tree round over (bucket, salt, ch, image_id, cnt) rows:
    per (bucket, salt) group take the min id as representative, emit a
    star edge rep -> member for every other member, and pass the rep row
    (with summed count) upward.  Output mixes edge rows and rep rows,
    tagged by ``is_rep``; fully vectorized (pyarrow group_by + take)."""
    if b.num_rows == 0:
        return pa.table({"bucket": b["bucket"], "salt": b["salt"],
                         "ch": b["ch"], "image_id": b["image_id"],
                         "cnt": b["cnt"], "partner": b["image_id"],
                         "is_rep": pa.array([], pa.bool_())})
    agg = b.group_by(["bucket", "salt"]).aggregate(
        [("image_id", "min"), ("ch", "min"), ("cnt", "sum")])
    # vectorized local attach: position of each row's group in agg
    key_all = hash_u64_pair(b["bucket"].to_numpy(zero_copy_only=False).view(np.uint64),
                            b["salt"].to_numpy(zero_copy_only=False).astype(np.uint64))
    key_agg = hash_u64_pair(agg["bucket"].to_numpy(zero_copy_only=False).view(np.uint64),
                            agg["salt"].to_numpy(zero_copy_only=False).astype(np.uint64))
    order = np.argsort(key_agg, kind="stable")
    pos = order[np.searchsorted(key_agg[order], key_all)]
    reps_for_rows = agg["image_id_min"].take(pa.array(pos, pa.int64()))

    edge_mask = pc.not_equal(b["image_id"], reps_for_rows)
    f = b.filter(edge_mask)
    edges = pa.table({
        "bucket": f["bucket"], "salt": f["salt"], "ch": f["ch"],
        "image_id": f["image_id"], "cnt": f["cnt"],
        "partner": reps_for_rows.filter(edge_mask),
        "is_rep": pa.array(np.zeros(f.num_rows, dtype=bool)),
    })
    reps = pa.table({
        "bucket": agg["bucket"], "salt": agg["salt"], "ch": agg["ch_min"],
        "image_id": agg["image_id_min"], "cnt": agg["cnt_sum"],
        "partner": agg["image_id_min"],
        "is_rep": pa.array(np.ones(agg.num_rows, dtype=bool)),
    })
    return pa.concat_tables([edges, reps])


def candidate_pairs(sig_ds, cfg: DedupConfig):
    """Signatures -> distinct candidate (left_id, right_id) star edges.

    **Hierarchical star construction, zero joins**: each combine-tree
    round links every member to its block-local sub-bucket representative
    and passes only the representatives (one row per (bucket, salt) per
    block) upward; the next round links those reps to each other's
    winners.  Connectivity is identical to attaching the global min to
    every member, but no attach join or broadcast ever happens — the
    whole stage is map passes + coalescing repartitions, which is also
    the right topology on a multi-node cluster (tree reduction).  A final
    local pass at the tree root links sub-bucket reps across salts
    (restoring full-bucket connectivity) and computes bucket totals for
    the weak-channel noise cap."""
    banded = sig_ds.map_batches(lambda b: banding_rows(b, cfg),
                                batch_format="pyarrow",
                                batch_size=cfg.batch_size)
    banded = banded.map_batches(
        lambda b: b.append_column("cnt", pa.array(
            np.ones(b.num_rows, dtype=np.int64))),
        batch_format="pyarrow")

    cap = cfg.weak_bucket_cap
    edge_rounds = []
    cur = banded.map_batches(_reduce_round, batch_format="pyarrow",
                             batch_size=None).materialize()
    merged_in_one = cur.num_blocks() <= 1
    while True:
        edge_rounds.append(cur.filter(expr="is_rep == False"))
        reps = cur.filter(expr="is_rep == True")
        if merged_in_one:
            # the last round ran as a single batch: reps are now global
            # per-(bucket, salt) minima (the executor may have re-split
            # the OUTPUT into several blocks; that doesn't undo the merge)
            top = reps
            break
        target = max(1, cur.num_blocks() // 8)
        cur = (reps.repartition(target)
                   .map_batches(_reduce_round, batch_format="pyarrow",
                                batch_size=None).materialize())
        merged_in_one = target == 1

    # tree root: link sub-bucket reps within each bucket across salts and
    # compute total bucket sizes (cnt sums) for the cap
    def across_salts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "ch": pa.array([], pa.int8()),
                             "left_id": pa.array([], pa.string()),
                             "right_id": pa.array([], pa.string()),
                             "bucket_n": pa.array([], pa.int64())})
        agg = b.group_by("bucket").aggregate(
            [("image_id", "min"), ("cnt", "sum")])
        ka = agg["bucket"].to_numpy(zero_copy_only=False)
        kb = b["bucket"].to_numpy(zero_copy_only=False)
        order = np.argsort(ka, kind="stable")
        pos = order[np.searchsorted(ka[order], kb)]
        rep = agg["image_id_min"].take(pa.array(pos, pa.int64()))
        total = agg["cnt_sum"].take(pa.array(pos, pa.int64()))
        mask = pc.not_equal(b["image_id"], rep)
        f = b.filter(mask)
        return pa.table({"bucket": f["bucket"], "ch": f["ch"],
                         "left_id": rep.filter(mask),
                         "right_id": f["image_id"],
                         "bucket_n": total.filter(mask)})

    top_mat = top.materialize()
    e2 = top_mat.repartition(1).map_batches(across_salts,
                                            batch_format="pyarrow",
                                            batch_size=None)

    # bucket totals -> the (small) noisy-bucket list for the weak cap
    def bucket_totals(b: pa.Table) -> pa.Table:
        agg = b.group_by(["bucket", "ch"]).aggregate([("cnt", "sum")])
        return pa.table({"bucket": agg["bucket"], "ch": agg["ch"],
                         "bucket_n": agg["cnt_sum"]})

    totals = top_mat.map_batches(bucket_totals, batch_format="pyarrow",
                                 batch_size=None)
    from .agg import grouped_agg
    totals = grouped_agg(totals, ["bucket", "ch"],
                         [("bucket_n", "sum", "bucket_n")])
    noisy_tbl = totals.filter(expr=f"bucket_n > {cap}").materialize()
    import ray
    noisy_minhash_free = noisy_tbl.filter(
        expr=f"ch != {CH_MINHASH}").select_columns(["bucket"])
    noisy = set(r["bucket"] for r in noisy_minhash_free.take_all())
    noisy_ref = ray.put(np.array(sorted(noisy), dtype=np.int64))

    def finalize(b: pa.Table) -> pa.Table:
        """Drop weak-channel edges from noisy buckets, canonicalize."""
        if b.num_rows == 0:
            return pa.table({"left_id": pa.array([], pa.string()),
                             "right_id": pa.array([], pa.string()),
                             "pair_key": pa.array([], pa.int64())})
        noisy_arr = cached_get(noisy_ref)
        bu = b["bucket"].to_numpy(zero_copy_only=False)
        ch = b["ch"].to_numpy(zero_copy_only=False)
        is_noisy = np.zeros(len(bu), dtype=bool)
        if noisy_arr.size:
            pos = np.searchsorted(noisy_arr, bu)
            pos = np.clip(pos, 0, noisy_arr.size - 1)
            is_noisy = (noisy_arr[pos] == bu) & (ch != CH_MINHASH)
        return _canon_edges(b.filter(pa.array(~is_noisy)),
                            "left_id", "right_id")

    def tag_edges(b: pa.Table) -> pa.Table:
        return pa.table({"bucket": b["bucket"], "ch": b["ch"],
                         "left_id": b["partner"],
                         "right_id": b["image_id"]})

    all_edges = None
    for er in edge_rounds:
        t = er.map_batches(tag_edges, batch_format="pyarrow")
        all_edges = t if all_edges is None else all_edges.union(t)
    all_edges = all_edges.union(e2.drop_columns(["bucket_n"]))

    canonical = all_edges.map_batches(finalize, batch_format="pyarrow")

    distinct = grouped_agg(canonical, ["pair_key"],
                           [("left_id", "min", "left_id"),
                            ("right_id", "min", "right_id")])
    return distinct.drop_columns(["pair_key"])
