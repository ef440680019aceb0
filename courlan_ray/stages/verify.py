"""Candidate-pair verification: banded Jaccard + Hamming thresholds.

Joins candidate pairs back to the (narrow) signature table — a numpy
broadcast pack when the signature side is small, a partitioned hash join
at scale (SURVEY.md §2.5; the size switch is
``cfg.verify_broadcast_max``) — then verifies each pair with vectorized
kernels:

- caption channel: estimated Jaccard (fraction of agreeing MinHash perms)
  >= ``jaccard_threshold``
- pixel channel: phash Hamming distance <= ``hamming_threshold`` or pixel
  SimHash Hamming <= ``simhash_hamming_threshold`` (both sides decode_ok)
- substring channel: shared winnowing fingerprints, confirmed by exact
  longest-common-substring ratio >= ``substring_min_ratio`` (the
  suffix-array verification path; pairs are few by now so per-pair DP is
  affordable — SURVEY.md §7.4)

A pair survives if ANY channel verifies; the channel verdicts are kept as
boolean columns for lineage.

The broadcast pack is PURE NUMPY built zero-copy from Arrow buffers (no
per-row Python): plain-dtype numpy arrays come out of the Ray object store
zero-copy, so N workers reading the payload cost nothing per worker —
unlike a pickled pandas/Arrow broadcast, which every worker would
re-deserialize.  Above the threshold no driver materialization happens at
all: signatures attach to pairs via two partitioned hash joins
(``stages.joins.hash_join_pairs``) and the same vectorized verdict kernel
runs on the attached columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DedupConfig
from ..functions.hashing import _ranges_within

_U64 = np.uint64
_POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

_OUT_SCHEMA = pa.schema([
    ("left_id", pa.string()), ("right_id", pa.string()),
    ("jaccard", pa.float32()), ("ham_phash", pa.int32()),
    ("ham_simpix", pa.int32()), ("substr_ratio", pa.float32()),
    ("verified", pa.bool_()),
])

_EMPTY_OUT = pa.table({f.name: pa.array([], f.type) for f in _OUT_SCHEMA})


def _ham(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a.astype(np.int64).view(_U64) ^ b.astype(np.int64).view(_U64)
    return _POP[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1).astype(np.int32)


def _lcs_len(a: bytes, b: bytes) -> int:
    """Longest common substring length, O(len(a)*len(b)) rolling DP over
    utf-8 bytes."""
    if not a or not b:
        return 0
    aa = np.frombuffer(a, dtype=np.uint8)
    bb = np.frombuffer(b, dtype=np.uint8)
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


def _string_buffers(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(utf-8 byte buffer, int64 offsets[n+1]) of a string column, built
    zero-copy from the Arrow buffers — no per-row Python.  Offsets are
    ABSOLUTE into the returned buffer (valid for sliced arrays too)."""
    from .joins import safe_combine
    arr = safe_combine(col) if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    if off_buf is None:
        return np.zeros(0, np.uint8), np.zeros(n + 1, np.int64)
    off = np.frombuffer(off_buf, dtype=np.int32)[arr.offset: arr.offset + n + 1] \
        .astype(np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8) if data_buf \
        else np.zeros(0, np.uint8)
    return data, off


def _list_buffers(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 values, int64 offsets) of a list<int64> column."""
    from .joins import safe_combine
    arr = safe_combine(col) if isinstance(col, pa.ChunkedArray) else col
    flat = np.ascontiguousarray(
        np.asarray(arr.flatten().to_numpy(zero_copy_only=False)))
    off = np.ascontiguousarray(
        arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    return flat, off


def _pack_signatures(sig_ds, cfg: DedupConfig):
    """Broadcast pack of the signature table, id-hash-sorted for
    searchsorted probing.  The hash column and the per-block sorting run in
    PARALLEL map tasks; the driver only merges pre-sorted blocks (numpy
    C-speed) and ``ray.put``s the arrays — the former collect+argsort+take
    of the whole table on the driver was a multi-second serial floor."""
    import ray
    from ..functions.hashing import hash_strings
    from .joins import _collect

    def add_hash(b: pa.Table) -> pa.Table:
        h = hash_strings(b["image_id"].to_pylist(), seed=0xA11CE)
        return b.append_column("__idh",
                               pa.array(h.view(np.int64), pa.int64()))

    from .joins import safe_combine
    tbl = safe_combine(_collect(sig_ds.select_columns(
        ["image_id", "minhash", "simhash_pix", "phash",
         "caption_key", "fingerprints", "decode_ok"])
        .map_batches(add_hash, batch_format="pyarrow")))
    n = tbl.num_rows
    # payload arrays stay in ARRIVAL order; only the 8-byte hash column is
    # sorted, plus a perm array mapping sorted position -> payload row.
    # The probe side gathers by row anyway, so reordering 100+ MB of
    # payload on the driver (argsort + full-table take) buys nothing.
    raw = tbl["__idh"].to_numpy(zero_copy_only=False).view(_U64) if n else \
        np.zeros(0, _U64)
    perm = np.argsort(raw, kind="stable")

    mh = np.ascontiguousarray(
        np.asarray(tbl["minhash"].chunk(0).flatten()
                   .to_numpy(zero_copy_only=False)).reshape(n, cfg.num_perm)) \
        if n else np.zeros((0, cfg.num_perm), np.int64)
    cap_buf, cap_off = _string_buffers(tbl["caption_key"]) if n else \
        (np.zeros(0, np.uint8), np.zeros(1, np.int64))
    fp_flat, fp_off = _list_buffers(tbl["fingerprints"]) if n else \
        (np.zeros(0, np.int64), np.zeros(1, np.int64))
    pack = {
        "id_hash": np.ascontiguousarray(raw[perm]),
        "perm": perm,
        "minhash": mh,
        "phash": np.ascontiguousarray(
            tbl["phash"].to_numpy(zero_copy_only=False)),
        "simhash_pix": np.ascontiguousarray(
            tbl["simhash_pix"].to_numpy(zero_copy_only=False)),
        "decode_ok": np.ascontiguousarray(
            tbl["decode_ok"].to_numpy(zero_copy_only=False)),
        "cap_buf": cap_buf, "cap_off": cap_off,
        "fp_flat": fp_flat, "fp_off": fp_off,
    }
    return {k: ray.put(v) for k, v in pack.items()}


def _verdicts(cfg: DedupConfig, *, mh_l, mh_r, ph_l, ph_r, sp_l, sp_r,
              ok_l, ok_r, fp_l, fp_r, cap_l, cap_r):
    """Shared verdict kernel over per-pair numpy views.

    minhash: (n, num_perm); phash/simhash/ok: (n,);
    fingerprints / captions per side: (flat_buffer, starts, ends) triples —
    pair i's values live at flat[starts[i]:ends[i]] (need NOT be
    contiguous across pairs, so both the gathered-corpus broadcast layout
    and the contiguous join layout fit).  Returns dict of verdict arrays."""
    fp_flat_l, fp_s_l, fp_e_l = fp_l
    fp_flat_r, fp_s_r, fp_e_r = fp_r
    cap_buf_l, cap_s_l, cap_e_l = cap_l
    cap_buf_r, cap_s_r, cap_e_r = cap_r
    n = len(ph_l)
    jac = (mh_l == mh_r).mean(axis=1) if n else np.zeros(0)
    ph = _ham(ph_l, ph_r)
    sp = _ham(sp_l, sp_r)

    cap_ok = jac >= cfg.jaccard_threshold
    if "phash" in cfg.channels:
        pix_ok = ((ph <= cfg.hamming_threshold)
                  | (sp <= cfg.simhash_hamming_threshold)) & ok_l & ok_r
    else:
        pix_ok = np.zeros(n, dtype=bool)

    # substring check only where cheap channels failed.  Containment
    # |fp_l ∩ fp_r| via one vectorized explode+merge; the exact LCS
    # (DP / suffix-array dispatch) runs only on pairs clearing a
    # length-scaled shared-print bound (a true LCS of ratio*minlen chars
    # yields ~ (ratio*minlen - (k+w-1)) / w shared winnowing prints).
    sub_ratio = np.zeros(n, dtype=np.float32)
    need = ~(cap_ok | pix_ok)
    if need.any():
        idx = np.flatnonzero(need)

        # per-pair fingerprint intersection |fp_l ∩ fp_r|, exploiting that
        # print lists are stored SORTED per row (signature actors): key =
        # (local pair ordinal << 44) | (print >> 20) is then globally
        # sorted on the probe side with NO sort here — just two gathers +
        # one searchsorted.  (A pandas explode+merge measured 67 s for
        # 160k text pairs; a hash+sort variant 27 s; this runs in ~1 s.)
        # Truncating prints to 44 bits only risks a +-1 on the LCS gate.
        # Local ordinals keep the shift valid for any batch < 2^20 pairs —
        # enforced by _VERDICT_SLICE (=65536, see _sliced below), which
        # slices every whole-block batch before it reaches this kernel.
        # Raising _VERDICT_SLICE past 2^20 would silently corrupt keys.
        def seg_keys(flat, starts, ends):
            cnt = (ends - starts)[idx]
            fi = np.repeat(starts[idx], cnt) + _ranges_within(cnt)
            pid = np.repeat(np.arange(idx.size, dtype=np.int64), cnt)
            vals = flat[fi].astype(np.int64, copy=False).view(_U64)
            return (pid.astype(_U64) << _U64(44)) | (vals >> _U64(20)), pid

        kl, pid_l = seg_keys(fp_flat_l, fp_s_l, fp_e_l)
        kr, _ = seg_keys(fp_flat_r, fp_s_r, fp_e_r)
        if kr.size:
            pos = np.clip(np.searchsorted(kr, kl), 0, kr.size - 1)
            hit = kr[pos] == kl
        else:
            hit = np.zeros(kl.size, dtype=bool)
        inter = np.zeros(n, dtype=np.int64)
        if hit.any():
            inter[idx] = np.bincount(pid_l[hit], minlength=idx.size)
        minlen = np.minimum(cap_e_l - cap_s_l, cap_e_r - cap_s_r)
        t_guar = cfg.fingerprint_k + cfg.fingerprint_window - 1
        needed = (cfg.substring_min_ratio * minlen - t_guar) \
            / cfg.fingerprint_window
        floor = np.maximum(2, 0.5 * needed)
        l_cnt = fp_e_l - fp_s_l
        r_cnt = fp_e_r - fp_s_r
        lcs_idx = idx[(inter[idx] >= floor[idx])
                      & (l_cnt[idx] > 0) & (r_cnt[idx] > 0)]
        if lcs_idx.size:
            # exact LCS: rolling DP for caption-sized pairs, generalized
            # suffix array above the crossover (functions/suffixarray.py).
            # Two exact shortcuts before the O(n log n) SA build — a
            # C-speed containment test (a substring-channel candidate is
            # very often a literal containment: LCS = len(shorter)), and
            # a per-batch memo on the byte pair (hot/boilerplate captions
            # repeat across many pairs; LCS is symmetric).  Measured:
            # 5.9 s -> ~0.5 s for the 44k-pair flagship verify batch.
            from ..functions.suffixarray import lcs_len
            memo: dict = {}
            for i in lcs_idx:
                a = bytes(cap_buf_l[cap_s_l[i]:cap_e_l[i]])
                b = bytes(cap_buf_r[cap_s_r[i]:cap_e_r[i]])
                denom = min(len(a), len(b))
                if denom < cfg.fingerprint_k:
                    continue
                key = (a, b) if a <= b else (b, a)
                lcs = memo.get(key)
                if lcs is None:
                    short, long_ = (a, b) if len(a) <= len(b) else (b, a)
                    lcs = len(short) if short in long_ \
                        else lcs_len(a, b)
                    memo[key] = lcs
                sub_ratio[i] = lcs / denom
    sub_ok = sub_ratio >= cfg.substring_min_ratio

    return {
        "jaccard": np.asarray(jac, dtype=np.float32),
        "ham_phash": ph, "ham_simpix": sp,
        "substr_ratio": sub_ratio,
        "verified": cap_ok | pix_ok | sub_ok,
    }


_VERDICT_SLICE = 65536     # pairs per _verdicts call: bounds the (n, num_perm)
                           # minhash gather (~64 MB at 128 perms) and keeps the
                           # kernel's 44-bit local-ordinal packing valid (< 2^20)


def _sliced(batch: pa.Table, one):
    """Apply ``one`` (a verdict kernel over <= _VERDICT_SLICE pairs) to a
    whole-block batch.  ``map_batches(batch_size=None)`` hands each task its
    block unsplit — one task per block, so an upstream ``repartition(fanout)``
    actually fans the kernel out instead of being re-bundled into
    ceil(rows/batch_size) tasks (measured: 6 tasks over a 64-way fanout at
    44k pairs).  Oversized blocks are sliced inside the task AND their
    outputs yielded one slice at a time (generator UDF), so the executor
    can emit/split output blocks incrementally instead of the task holding
    the whole output table in memory at once."""
    n = batch.num_rows
    if n <= _VERDICT_SLICE:
        yield one(batch)
        return
    for i in range(0, n, _VERDICT_SLICE):
        yield one(batch.slice(i, _VERDICT_SLICE))


def _verify_broadcast(pairs_ds, sig_ds, cfg: DedupConfig, prof=False):
    """Small-signature path: numpy broadcast pack + searchsorted gather."""
    import sys
    import time

    from .joins import cached_get
    from ..functions.hashing import hash_strings

    t0 = time.time()
    refs = _pack_signatures(sig_ds, cfg)
    if prof:
        print(f"[verify] pack: {time.time()-t0:.2f}s", file=sys.stderr)

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _EMPTY_OUT
        id_hash = cached_get(refs["id_hash"])
        if "left_h" in batch.schema.names:
            # pair rows carry their id hashes (stages/lsh._canon_edges) —
            # no per-batch string materialization
            probe_l = batch["left_h"].to_numpy(zero_copy_only=False).view(_U64)
            probe_r = batch["right_h"].to_numpy(zero_copy_only=False).view(_U64)
        else:
            probe_l = hash_strings(batch["left_id"].to_pylist(), seed=0xA11CE)
            probe_r = hash_strings(batch["right_id"].to_pylist(), seed=0xA11CE)
        pos_l = np.clip(np.searchsorted(id_hash, probe_l), 0, max(len(id_hash) - 1, 0))
        pos_r = np.clip(np.searchsorted(id_hash, probe_r), 0, max(len(id_hash) - 1, 0))
        if len(id_hash) == 0:
            return _EMPTY_OUT
        hit = (id_hash[pos_l] == probe_l) & (id_hash[pos_r] == probe_r)
        if not hit.all():
            batch = batch.filter(pa.array(hit))
            pos_l, pos_r = pos_l[hit], pos_r[hit]
            n = batch.num_rows
            if n == 0:
                return _EMPTY_OUT
        # sorted position -> payload row (payload arrays are unsorted)
        perm = cached_get(refs["perm"])
        pos_l, pos_r = perm[pos_l], perm[pos_r]

        mh = cached_get(refs["minhash"])
        phash = cached_get(refs["phash"])
        simpix = cached_get(refs["simhash_pix"])
        dec_ok = cached_get(refs["decode_ok"])
        fp_flat = cached_get(refs["fp_flat"])
        fp_off = cached_get(refs["fp_off"])
        cap_buf = cached_get(refs["cap_buf"])
        cap_off = cached_get(refs["cap_off"])

        v = _verdicts(
            cfg,
            mh_l=mh[pos_l], mh_r=mh[pos_r],
            ph_l=phash[pos_l], ph_r=phash[pos_r],
            sp_l=simpix[pos_l], sp_r=simpix[pos_r],
            ok_l=dec_ok[pos_l], ok_r=dec_ok[pos_r],
            fp_l=(fp_flat, fp_off[pos_l], fp_off[pos_l + 1]),
            fp_r=(fp_flat, fp_off[pos_r], fp_off[pos_r + 1]),
            cap_l=(cap_buf, cap_off[pos_l], cap_off[pos_l + 1]),
            cap_r=(cap_buf, cap_off[pos_r], cap_off[pos_r + 1]),
        )
        return _emit(batch, v)

    return pairs_ds.map_batches(lambda b: _sliced(b, kernel),
                                batch_format="pyarrow", batch_size=None)


def _emit(batch: pa.Table, v: dict) -> pa.Table:
    return pa.table({
        "left_id": batch["left_id"],
        "right_id": batch["right_id"],
        "jaccard": pa.array(v["jaccard"], pa.float32()),
        "ham_phash": pa.array(v["ham_phash"], pa.int32()),
        "ham_simpix": pa.array(v["ham_simpix"], pa.int32()),
        "substr_ratio": pa.array(v["substr_ratio"], pa.float32()),
        "verified": pa.array(v["verified"]),
    })


def verify_pairs(pairs_ds, sig_ds, cfg: DedupConfig):
    """(left_id, right_id) candidates -> verified pairs with verdict columns
    (jaccard, ham_phash, ham_simpix, substr_ratio, verified:bool).

    Size-adaptive: below ``cfg.verify_broadcast_max`` signature rows the
    signature table is broadcast as numpy blocks; above it signatures
    attach via two partitioned hash joins (no driver materialization)."""
    import os
    import sys
    import time

    prof = bool(os.environ.get("COURLAN_RAY_PROFILE"))
    t0 = time.time()
    sig_ds = sig_ds.materialize()
    n_sigs = sig_ds.count()
    if prof:
        print(f"[verify] sig materialize: {time.time()-t0:.2f}s",
              file=sys.stderr)

    # re-split the candidate output so the verify stage fans out across the
    # cluster — skipped when the input is already well-partitioned (the
    # keyed-shuffle distinct emits shuffle_partitions blocks)
    try:
        import ray
        fanout = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    except Exception:
        fanout = 16
    from ray.data.dataset import MaterializedDataset
    is_mat = isinstance(pairs_ds, MaterializedDataset)
    nb = pairs_ds.num_blocks() if is_mat else 0
    if is_mat and pairs_ds.count() <= 8192:
        pass        # <= one verify batch: a repartition's AllToAll launch
                    # (~1.5 s) dwarfs the single-task kernel, skip it
    elif nb < fanout // 2:
        pairs_ds = pairs_ds.repartition(fanout)
        if prof:
            pairs_ds = pairs_ds.materialize()
            print(f"[verify] pair repartition: {time.time()-t0:.2f}s cum",
                  file=sys.stderr)

    if n_sigs <= cfg.verify_broadcast_max:
        out = _verify_broadcast(pairs_ds, sig_ds, cfg, prof=prof)
    else:
        out = _verify_joined(pairs_ds, sig_ds, cfg)
    if prof:
        out = out.materialize()
        print(f"[verify] kernel: {time.time()-t0:.2f}s cumulative",
              file=sys.stderr)
    return out


def _verify_joined(pairs_ds, sig_ds, cfg: DedupConfig):
    """Large-signature path: partitioned pair<->signature hash join, then
    the same vectorized verdict kernel over the attached columns."""
    from .joins import hash_join_pairs

    cols = ["minhash", "simhash_pix", "phash", "caption_key",
            "fingerprints", "decode_ok"]
    attached = hash_join_pairs(
        pairs_ds, sig_ds.select_columns(["image_id"] + cols),
        id_col="image_id", payload_cols=cols,
        num_partitions=cfg.shuffle_partitions,
        broadcast_max=0)            # force the partitioned path

    def kernel(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return _EMPTY_OUT
        num_perm = cfg.num_perm

        def mh(col):
            return np.asarray(batch[col].combine_chunks().flatten()
                              .to_numpy(zero_copy_only=False)).reshape(n, num_perm)

        fl_l, fo_l = _list_buffers(batch["fingerprints_l"])
        fl_r, fo_r = _list_buffers(batch["fingerprints_r"])
        cb_l, co_l = _string_buffers(batch["caption_key_l"])
        cb_r, co_r = _string_buffers(batch["caption_key_r"])
        v = _verdicts(
            cfg,
            mh_l=mh("minhash_l"), mh_r=mh("minhash_r"),
            ph_l=batch["phash_l"].to_numpy(zero_copy_only=False),
            ph_r=batch["phash_r"].to_numpy(zero_copy_only=False),
            sp_l=batch["simhash_pix_l"].to_numpy(zero_copy_only=False),
            sp_r=batch["simhash_pix_r"].to_numpy(zero_copy_only=False),
            ok_l=batch["decode_ok_l"].to_numpy(zero_copy_only=False),
            ok_r=batch["decode_ok_r"].to_numpy(zero_copy_only=False),
            fp_l=(fl_l, fo_l[:-1], fo_l[1:]),
            fp_r=(fl_r, fo_r[:-1], fo_r[1:]),
            cap_l=(cb_l, co_l[:-1], co_l[1:]),
            cap_r=(cb_r, co_r[:-1], co_r[1:]),
        )
        return _emit(batch, v)

    return attached.map_batches(lambda b: _sliced(b, kernel),
                                batch_format="pyarrow", batch_size=None)


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
