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


def _pack_signatures(sig_ds, cfg: DedupConfig):
    """Collect the signature table into PURE-NUMPY broadcast blocks:
    plain-dtype numpy arrays come out of the Ray object store zero-copy,
    so 32 workers reading a 400 MB payload costs nothing per worker —
    unlike a pickled pandas/Arrow broadcast, which every worker would
    re-deserialize (the measured cause of negative CPU scaling)."""
    import ray
    from ..functions.hashing import hash_strings
    from .joins import _collect

    tbl = _collect(sig_ds.select_columns(
        ["image_id", "minhash", "simhash_pix", "phash",
         "caption_key", "fingerprints"]))
    n = tbl.num_rows
    id_hash = hash_strings(tbl["image_id"].to_pylist(), seed=0xA11CE)
    order = np.argsort(id_hash, kind="stable")
    tbl = tbl.take(pa.array(order, pa.int64())).combine_chunks()

    mh = np.ascontiguousarray(
        np.asarray(tbl["minhash"].chunk(0).flatten()
                   .to_numpy(zero_copy_only=False)).reshape(n, cfg.num_perm))
    caps = tbl["caption_key"].chunk(0)
    cap_buf = np.frombuffer(
        "\x00".join(caps.to_pylist()).encode("utf-8", "surrogatepass")
        + b"\x00", dtype=np.uint8) if n else np.zeros(0, np.uint8)
    cap_lens = np.array([len(c.encode("utf-8", "surrogatepass"))
                         for c in caps.to_pylist()], dtype=np.int64) \
        if n else np.zeros(0, np.int64)
    cap_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cap_lens + 1, out=cap_off[1:])
    fps = tbl["fingerprints"].chunk(0)
    fp_flat = np.ascontiguousarray(
        np.asarray(fps.flatten().to_numpy(zero_copy_only=False)))
    fp_off = np.ascontiguousarray(
        fps.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    pack = {
        "id_hash": np.ascontiguousarray(id_hash[order]),
        "minhash": mh,
        "phash": np.ascontiguousarray(
            tbl["phash"].to_numpy(zero_copy_only=False)),
        "simhash_pix": np.ascontiguousarray(
            tbl["simhash_pix"].to_numpy(zero_copy_only=False)),
        "cap_buf": cap_buf, "cap_off": cap_off, "cap_lens": cap_lens,
        "fp_flat": fp_flat, "fp_off": fp_off,
    }
    return {k: ray.put(v) for k, v in pack.items()}


def verify_pairs(pairs_ds, sig_ds, cfg: DedupConfig):
    """(left_id, right_id) candidates -> verified pairs with verdict columns
    (jaccard, ham_phash, ham_simpix, substr_ratio, verified:bool).

    The substring channel verifies in two tiers: a cheap winnowing-
    fingerprint containment bound first (vectorized explode+merge), and
    the exact LCS dynamic program only for pairs clearing a
    length-scaled shared-print bound."""
    from .joins import cached_get
    from ..functions.hashing import hash_strings

    # the candidate tree ends in one or two blocks; re-split so the
    # gather+verify stages fan out across the cluster
    try:
        import ray
        fanout = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        fanout = 16
    pairs_ds = pairs_ds.repartition(fanout)
    refs = _pack_signatures(sig_ds, cfg)

    num_perm = cfg.num_perm

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        empty = pa.table({"left_id": pa.array([], pa.string()),
                          "right_id": pa.array([], pa.string()),
                          "jaccard": pa.array([], pa.float32()),
                          "ham_phash": pa.array([], pa.int32()),
                          "ham_simpix": pa.array([], pa.int32()),
                          "substr_ratio": pa.array([], pa.float32()),
                          "verified": pa.array([], pa.bool_())})
        if n == 0:
            return empty
        id_hash = cached_get(refs["id_hash"])
        probe_l = hash_strings(batch["left_id"].to_pylist(), seed=0xA11CE)
        probe_r = hash_strings(batch["right_id"].to_pylist(), seed=0xA11CE)
        pos_l = np.clip(np.searchsorted(id_hash, probe_l), 0, len(id_hash) - 1)
        pos_r = np.clip(np.searchsorted(id_hash, probe_r), 0, len(id_hash) - 1)
        hit = (id_hash[pos_l] == probe_l) & (id_hash[pos_r] == probe_r)
        if not hit.all():
            batch = batch.filter(pa.array(hit))
            pos_l, pos_r = pos_l[hit], pos_r[hit]
            n = batch.num_rows
            if n == 0:
                return empty

        mh = cached_get(refs["minhash"])
        jac = (mh[pos_l] == mh[pos_r]).mean(axis=1)
        phash = cached_get(refs["phash"])
        simpix = cached_get(refs["simhash_pix"])
        ph = _ham(phash[pos_l], phash[pos_r])
        sp = _ham(simpix[pos_l], simpix[pos_r])

        cap_ok = jac >= cfg.jaccard_threshold
        if "phash" in cfg.channels:
            pix_ok = (ph <= cfg.hamming_threshold) | (sp <= cfg.simhash_hamming_threshold)
        else:
            pix_ok = np.zeros(n, dtype=bool)

        # substring check only where cheap channels failed.  Containment
        # |fp_l ∩ fp_r| via one vectorized explode+merge; the exact
        # O(|a|*|b|) LCS runs only on pairs clearing a length-scaled
        # shared-print bound (a true LCS of ratio*minlen chars yields
        # ~ (ratio*minlen - (k+w-1)) / w shared winnowing prints).
        sub_ratio = np.zeros(n, dtype=np.float32)
        need = ~(cap_ok | pix_ok)
        if need.any():
            import pandas as pd
            fp_flat = cached_get(refs["fp_flat"])
            fp_off = cached_get(refs["fp_off"])
            cap_lens = cached_get(refs["cap_lens"])
            idx = np.flatnonzero(need)

            def explode(pos):
                cnt = (fp_off[pos + 1] - fp_off[pos])[idx]
                starts = fp_off[pos][idx]
                flat_idx = np.repeat(starts, cnt) + _ranges(cnt)
                return pd.DataFrame({"p": np.repeat(idx, cnt),
                                     "f": fp_flat[flat_idx]})

            common = explode(pos_l).merge(explode(pos_r), on=["p", "f"])
            inter = np.bincount(common["p"].to_numpy(), minlength=n)
            minlen = np.minimum(cap_lens[pos_l], cap_lens[pos_r])
            t_guar = cfg.fingerprint_k + cfg.fingerprint_window - 1
            needed = (cfg.substring_min_ratio * minlen - t_guar) \
                / cfg.fingerprint_window
            floor = np.maximum(2, 0.5 * needed)
            l_cnt = fp_off[pos_l + 1] - fp_off[pos_l]
            r_cnt = fp_off[pos_r + 1] - fp_off[pos_r]
            lcs_idx = idx[(inter[idx] >= floor[idx])
                          & (l_cnt[idx] > 0) & (r_cnt[idx] > 0)]
            if lcs_idx.size:
                cap_buf = cached_get(refs["cap_buf"])
                cap_off = cached_get(refs["cap_off"])

                def cap_of(pos):
                    return bytes(cap_buf[cap_off[pos]:cap_off[pos]
                                         + cap_lens[pos]]).decode(
                        "utf-8", "surrogatepass")

                for i in lcs_idx:
                    a, b = cap_of(pos_l[i]), cap_of(pos_r[i])
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

    scored = pairs_ds.map_batches(kernel, batch_format="pyarrow",
                                  batch_size=8192)
    return scored


def _ranges(counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    out = np.arange(total, dtype=np.int64)
    ends = np.cumsum(counts)
    out -= np.repeat(ends - counts, counts)
    return out


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
