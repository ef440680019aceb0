"""Candidate-pair verification: banded Jaccard + Hamming thresholds.

Joins candidate pairs back to the (narrow) signature table — broadcast when
the signature side is small, partitioned hash join at scale (SURVEY.md
§2.5) — then verifies each pair with vectorized kernels:

- caption channel: estimated Jaccard (fraction of agreeing MinHash perms)
  >= ``jaccard_threshold``
- pixel channel: phash Hamming distance <= ``hamming_threshold`` or pixel
  SimHash Hamming <= ``simhash_hamming_threshold``
- substring channel: shared winnowing fingerprints, confirmed by exact
  longest-common-substring ratio >= ``substring_min_ratio`` (the
  suffix-array verification path; pairs are few by now so per-pair DP is
  affordable — SURVEY.md §7.4)

A pair survives if ANY channel verifies; the channel verdicts are kept as
boolean columns for lineage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DedupConfig
from .joins import hash_join_pairs

_U64 = np.uint64
_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _ham(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a.astype(np.int64).view(_U64) ^ b.astype(np.int64).view(_U64)
    return _POP[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int32)


def _lcs_len(a: str, b: str) -> int:
    """Longest common substring length, O(len(a)*len(b)) rolling DP."""
    if not a or not b:
        return 0
    aa = np.frombuffer(a.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    bb = np.frombuffer(b.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(aa) > len(bb):
        aa, bb = bb, aa
    prev = np.zeros(len(bb) + 1, dtype=np.int32)
    best = 0
    for ch in aa:                       # O(|a|) passes of vectorized compare
        cur = np.zeros(len(bb) + 1, dtype=np.int32)
        match = bb == ch
        cur[1:][match] = prev[:-1][match] + 1
        m = int(cur.max())
        if m > best:
            best = m
        prev = cur
    return best


def verify_pairs(pairs_ds, sig_ds, cfg: DedupConfig):
    """(left_id, right_id) candidates -> verified pairs with verdict columns
    (jaccard, ham_phash, ham_simpix, substr_ratio, verified:bool).

    The substring channel verifies in two tiers: a cheap winnowing-
    fingerprint containment bound first (|fp_a ∩ fp_b| relative to the
    smaller doc's fingerprint count), and the exact LCS dynamic program
    only for pairs whose containment clears half the threshold — so the
    O(|a|*|b|) DP runs on a small borderline band, not every candidate."""
    payload_cols = ["minhash", "simhash_cap", "simhash_pix", "phash",
                    "caption_key", "fingerprints"]
    # the candidate tree ends in one or two blocks; re-split so the
    # gather+verify stages fan out across the cluster
    try:
        import ray
        fanout = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        fanout = 16
    pairs_ds = pairs_ds.repartition(fanout)
    joined = hash_join_pairs(pairs_ds, sig_ds, id_col="image_id",
                             payload_cols=payload_cols,
                             num_partitions=cfg.shuffle_partitions)

    num_perm = cfg.num_perm

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"left_id": pa.array([], pa.string()),
                             "right_id": pa.array([], pa.string()),
                             "jaccard": pa.array([], pa.float32()),
                             "ham_phash": pa.array([], pa.int32()),
                             "ham_simpix": pa.array([], pa.int32()),
                             "substr_ratio": pa.array([], pa.float32()),
                             "verified": pa.array([], pa.bool_())})
        mh_l = np.asarray(batch["minhash_l"].combine_chunks().flatten()
                          .to_numpy(zero_copy_only=False)).reshape(n, num_perm)
        mh_r = np.asarray(batch["minhash_r"].combine_chunks().flatten()
                          .to_numpy(zero_copy_only=False)).reshape(n, num_perm)
        jac = (mh_l == mh_r).mean(axis=1)

        ph = _ham(batch["phash_l"].to_numpy(zero_copy_only=False),
                  batch["phash_r"].to_numpy(zero_copy_only=False))
        sp = _ham(batch["simhash_pix_l"].to_numpy(zero_copy_only=False),
                  batch["simhash_pix_r"].to_numpy(zero_copy_only=False))

        cap_ok = jac >= cfg.jaccard_threshold
        if "phash" in cfg.channels:
            pix_ok = (ph <= cfg.hamming_threshold) | (sp <= cfg.simhash_hamming_threshold)
        else:
            pix_ok = np.zeros(n, dtype=bool)

        # substring check only where cheap channels failed.  Containment
        # |fp_l ∩ fp_r| / min(|fp_l|, |fp_r|) is computed for the whole
        # batch with one vectorized merge (explode fps -> inner join on
        # (pair, fp) -> bincount); the exact O(|a|*|b|) LCS runs only on
        # the pairs whose containment clears half the threshold.
        sub_ratio = np.zeros(n, dtype=np.float32)
        need = ~(cap_ok | pix_ok)
        if need.any():
            import pandas as pd
            idx = np.flatnonzero(need)
            fl = batch["fingerprints_l"].combine_chunks()
            fr = batch["fingerprints_r"].combine_chunks()
            l_flat = fl.flatten().to_numpy(zero_copy_only=False)
            r_flat = fr.flatten().to_numpy(zero_copy_only=False)
            l_off = fl.offsets.to_numpy(zero_copy_only=False)
            r_off = fr.offsets.to_numpy(zero_copy_only=False)
            l_cnt = np.diff(l_off)
            r_cnt = np.diff(r_off)
            take = np.zeros(n, dtype=bool)
            take[idx] = True
            l_sel = np.repeat(take, l_cnt)
            r_sel = np.repeat(take, r_cnt)
            ldf = pd.DataFrame({
                "p": np.repeat(np.arange(n), l_cnt)[l_sel],
                "f": l_flat[l_sel]}).drop_duplicates()
            rdf = pd.DataFrame({
                "p": np.repeat(np.arange(n), r_cnt)[r_sel],
                "f": r_flat[r_sel]}).drop_duplicates()
            common = ldf.merge(rdf, on=["p", "f"])
            inter = np.bincount(common["p"].to_numpy(), minlength=n)
            # a common substring of ratio*minlen chars is guaranteed to
            # contribute ~ (ratio*minlen - (k+w-1)) / w shared winnowing
            # prints; require half that (plus an absolute floor of 2) so
            # the exact LCS DP runs only on genuinely plausible pairs
            len_l = np.array([len(x) for x in batch["caption_key_l"].to_pylist()])
            len_r = np.array([len(x) for x in batch["caption_key_r"].to_pylist()])
            minlen = np.minimum(len_l, len_r)
            t_guar = cfg.fingerprint_k + cfg.fingerprint_window - 1
            needed = (cfg.substring_min_ratio * minlen - t_guar) \
                / cfg.fingerprint_window
            floor = np.maximum(2, 0.5 * needed)
            lcs_idx = idx[(inter[idx] >= floor[idx])
                          & (l_cnt[idx] > 0) & (r_cnt[idx] > 0)]
            if lcs_idx.size:
                cl = batch["caption_key_l"].to_pylist()
                cr = batch["caption_key_r"].to_pylist()
                for i in lcs_idx:
                    a, b = cl[i], cr[i]
                    denom = min(len(a), len(b))
                    if denom >= cfg.fingerprint_k:
                        sub_ratio[i] = _lcs_len(a, b) / denom
        sub_ok = sub_ratio >= cfg.substring_min_ratio

        verified = cap_ok | pix_ok | sub_ok
        return pa.table({
            "left_id": batch["left_id"],
            "right_id": batch["right_id"],
            "jaccard": pa.array(jac.astype(np.float32), pa.float32()),
            "ham_phash": pa.array(ph, pa.int32()),
            "ham_simpix": pa.array(sp, pa.int32()),
            "substr_ratio": pa.array(sub_ratio, pa.float32()),
            "verified": pa.array(verified),
        })

    scored = joined.map_batches(kernel, batch_format="pyarrow",
                                batch_size=cfg.batch_size)
    return scored


def fidelity_check(pairs_sample: pd.DataFrame, row_lookup) -> pd.DataFrame:
    """Per-row fidelity invariant on a (small) verified-pair sample:
    decoded-pixel PSNR >= cfg.psnr_min_db for lossy re-encodes + caption
    equality (input_hint invariant).  ``row_lookup(image_id) -> row dict``."""
    from ..functions import imagecodec as codec

    out = []
    for _, p in pairs_sample.iterrows():
        a, b = row_lookup(p["left_id"]), row_lookup(p["right_id"])
        try:
            ia, ib = codec.decode_image(a["bytes"]), codec.decode_image(b["bytes"])
            psnr = codec.psnr_db(ia, ib) if ia.shape == ib.shape else 0.0
        except codec.CodecError:
            psnr = 0.0
        out.append({"left_id": p["left_id"], "right_id": p["right_id"],
                    "psnr_db": psnr,
                    "caption_equal": a["caption"] == b["caption"]})
    return pd.DataFrame(out)
