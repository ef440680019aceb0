"""Signature stage: the stateful actor-pool ``map_batches``.

Per actor (``__init__``, once): MinHash permutation salts, DCT matrix warm,
codec state — the per-process LRU-cache pattern of the reference
(/root/reference/courlan/filters.py:180, meta.py:20-24) made explicit.

Per batch (``__call__``): decode pixels -> recompute phash (verifying the
precomputed ``phash`` column) + pixel SimHash; caption shingles -> MinHash
signature + caption SimHash; winnowing substring fingerprints.  Decoded
pixels are dropped before return — only narrow signature columns ever reach
a shuffle (SURVEY.md §4 memory row).

With ``with_gates=True`` the actor runs the canonicalization gate chain
(stages/canonicalize.py, the check_url generalization) on the raw batch
first and emits EVERY row — invalid rows keep ``valid=False`` /
``reject_reason`` and get empty signatures.  This fuses
read -> canonicalize -> signatures into ONE traversal of the wide byte
payload: the single most expensive scan of the pipeline happens exactly
once, and the materialized output is the narrow "sigtable" every
downstream stage (exact dedup, LSH, verify, components, counters,
rejected sink) reads instead of re-scanning the input.

Pixel math is batched: per-image decode + area-resample to a 32x32 gray
stack, then ONE broadcast (B,32,32) DCT matmul chain for all phashes and
one reshape-mean for all pixel SimHashes — no per-image DCT calls.

Output schema:
  image_id, caption_key, valid, reject_reason,
  minhash: fixed_size_list<int64>[num_perm], simhash_cap: int64,
  simhash_pix: int64, phash: int64 (recomputed; input value when decode
  fails), fingerprints: list<int64>, shingle_count: int32, decode_ok: bool
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions import imagecodec as codec
from ..functions.hashing import (char_shingle_hashes, hash_strings,
                                 minhash_signatures, simhash64, splitmix64,
                                 winnowing_fingerprints)

_U64 = np.uint64


def _pixel_features(arr: np.ndarray) -> np.ndarray:
    """64 block-mean luma features for the pixel SimHash: 8x8 area means."""
    g = codec._resize_gray_32(arr)
    return g.reshape(8, 4, 8, 4).mean(axis=(1, 3)).ravel()


def pixel_simhash64(arr: np.ndarray) -> int:
    """64-bit pixel SimHash: block-mean luma vs global mean."""
    feats = _pixel_features(arr)
    bits = (feats > feats.mean()).astype(np.uint8)
    return int(np.packbits(bits, bitorder="little").view("<u8")[0])


def _pack_bits64(bits: np.ndarray) -> np.ndarray:
    """(m, 64) bool/uint8 -> (m,) uint64, little bit order."""
    return np.packbits(bits.astype(np.uint8), axis=1,
                       bitorder="little").view("<u8").ravel()


def pixel_hashes_batch(payloads: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a batch of payloads -> (phash u64, simhash_pix u64, ok bool).

    Decode + resize run per payload (variable sizes force it); the DCT /
    thresholding runs ONCE for the whole stack — one (B,32,32) matmul chain
    instead of B separate 32x32 DCTs."""
    n = len(payloads)
    ok = np.zeros(n, dtype=bool)
    grays = []
    for i, p in enumerate(payloads):
        try:
            grays.append(codec.gray32_area_f32(codec.decode_image(p)))
            ok[i] = True
        except codec.CodecError:
            pass
    phash = np.zeros(n, dtype=_U64)
    simpix = np.zeros(n, dtype=_U64)
    if grays:
        G = np.stack(grays)                               # (m, 32, 32) f32
        D = codec._DCT32.astype(np.float32)
        C = D[None] @ G @ D.T[None]                       # batched 2-D DCT
        vals = C[:, :8, :8].reshape(len(grays), 64)[:, 1:]  # drop DC
        med = np.median(vals, axis=1, keepdims=True)
        bits = np.zeros((len(grays), 64), dtype=np.uint8)
        bits[:, 1:] = vals > med
        phash[ok] = _pack_bits64(bits)

        feats = G.reshape(len(grays), 8, 4, 8, 4).mean(axis=(2, 4)) \
                 .reshape(len(grays), 64)
        sbits = feats > feats.mean(axis=1, keepdims=True)
        simpix[ok] = _pack_bits64(sbits)
    return phash, simpix, ok


class SignatureActor:
    """Callable class for ``map_batches(SignatureActor, fn_constructor_args=
    (cfg,), concurrency=N)`` — setup once per actor, vectorized per batch."""

    def __init__(self, cfg: DedupConfig, with_gates: bool = False):
        self.cfg = cfg
        self.with_gates = with_gates
        # touch the module-level DCT matrix so first-batch latency is paid here
        codec._DCT32 @ codec._DCT32.T

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        if self.with_gates:
            from .canonicalize import canonicalize_batch
            batch = canonicalize_batch(batch, cfg)
            valid = batch["valid"].to_numpy(zero_copy_only=False)
            reject = batch["reject_reason"]
        else:
            valid = np.ones(batch.num_rows, dtype=bool)
            reject = pa.array([""] * batch.num_rows, pa.string())
        n = batch.num_rows
        vidx = np.flatnonzero(valid)
        vb = batch.take(pa.array(vidx, pa.int64())) if len(vidx) < n else batch
        captions = vb["caption_key"].to_pylist()

        sh, v_counts = char_shingle_hashes(captions, cfg.shingle_width,
                                           seed=cfg.seed)
        v_minh = minhash_signatures(sh, v_counts, cfg.num_perm,
                                    seed=cfg.seed + 1)
        v_sim_cap = simhash64(sh, v_counts)
        v_fps, v_fp_counts = winnowing_fingerprints(
            captions, cfg.fingerprint_k, cfg.fingerprint_window,
            seed=cfg.seed + 2)
        from ..functions.hashing import adjacent_pair_hashes, sort_segments
        # consecutive-print pair hashes (position order) for banding, THEN
        # sort prints per row for the verify-side set intersection
        v_fpp, v_fpp_counts = adjacent_pair_hashes(v_fps, v_fp_counts)
        v_fps = sort_segments(v_fps, v_fp_counts)

        in_phash = vb["phash"].to_numpy(zero_copy_only=False) \
            .astype(np.int64).view(_U64)
        v_phash, v_simpix, v_ok = pixel_hashes_batch(vb["bytes"].to_pylist())
        # decode failure: keep the input phash (can't verify it) and give the
        # pixel SimHash a per-row noise value so failed rows never share a
        # pixel band bucket (banding additionally skips decode_ok=False rows)
        fail = ~v_ok
        if fail.any():
            v_phash[fail] = in_phash[fail]
            v_simpix[fail] = splitmix64(
                hash_strings(np.asarray(captions, dtype=object)[fail],
                             seed=cfg.seed + 9) ^ _U64(0xDEAD))

        # scatter valid-row results back to full batch length
        minh = np.zeros((n, cfg.num_perm), dtype=_U64)
        minh[vidx] = v_minh
        sim_cap = np.zeros(n, dtype=_U64); sim_cap[vidx] = v_sim_cap
        phash = np.zeros(n, dtype=_U64); phash[vidx] = v_phash
        simpix = np.zeros(n, dtype=_U64); simpix[vidx] = v_simpix
        ok = np.zeros(n, dtype=bool); ok[vidx] = v_ok
        counts = np.zeros(n, dtype=np.int64); counts[vidx] = v_counts
        fp_counts = np.zeros(n, dtype=np.int64); fp_counts[vidx] = v_fp_counts
        fpp_counts = np.zeros(n, dtype=np.int64)
        fpp_counts[vidx] = v_fpp_counts

        cap_full = batch["caption_key"]

        # store the low 32 bits of each min-hash: equality comparisons (the
        # only use — banding keys and Jaccard estimation) are unchanged up
        # to a 2^-32 collision; storage/shuffle/gather traffic halves
        mh32 = (minh & _U64(0xFFFFFFFF)).astype(np.uint32)
        mh_flat = pa.array(mh32.view(np.int32).ravel(), pa.int32())
        minhash_col = pa.FixedSizeListArray.from_arrays(mh_flat, cfg.num_perm)
        fp_offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(fp_counts, out=fp_offsets[1:])
        fp_col = pa.ListArray.from_arrays(pa.array(fp_offsets, pa.int32()),
                                          pa.array(v_fps.view(np.int64),
                                                   pa.int64()))
        fpp_offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(fpp_counts, out=fpp_offsets[1:])
        fpp_col = pa.ListArray.from_arrays(pa.array(fpp_offsets, pa.int32()),
                                           pa.array(v_fpp.view(np.int64),
                                                    pa.int64()))
        # variant-invariant exact-dup key (stages/exact_dedup.py), computed
        # here so the exact stage needs no extra pass over the sigtable
        ck = hash_strings(batch["caption_key"].to_pylist(), seed=cfg.seed)
        from ..functions.hashing import hash_u64_pair
        exact_key = hash_u64_pair(ck, phash).view(np.int64)

        return pa.table({
            "image_id": batch["image_id"],
            "caption_key": cap_full,
            "valid": pa.array(valid),
            "reject_reason": reject,
            "exact_key": pa.array(exact_key, pa.int64()),
            "minhash": minhash_col,
            "simhash_cap": pa.array(sim_cap.view(np.int64), pa.int64()),
            "simhash_pix": pa.array(simpix.view(np.int64), pa.int64()),
            "phash": pa.array(phash.view(np.int64), pa.int64()),
            "fingerprints": fp_col,
            "fp_pairs": fpp_col,
            "shingle_count": pa.array(counts.astype(np.int32), pa.int32()),
            "decode_ok": pa.array(ok),
        })


def sized_pool(ds, pool: int, batch_size: int) -> int:
    """Cap an actor pool at ~2 batches per actor when the input's row count
    is metadata-known (fresh parquet read: footer counts, no execution) —
    a 20k-row input needs 10 signature actors, not 24 idle-starting
    processes (measured 4.7 s -> 3.8-4.0 s for the standalone stage).
    Unknown count (None, e.g. a transformed dataset) or large inputs keep
    the full fixed pool."""
    try:
        meta_rows = ds._meta_count()
    except Exception:
        meta_rows = None
    if meta_rows is not None:   # 0 rows is KNOWN-empty: cap at the floor,
        batches = -(-int(meta_rows) // max(1, batch_size))  # not full pool
        # a cap only: never RAISE the pool above its configured size (a
        # 1-actor pool on a 2-CPU cluster must stay 1 — two actors would
        # reserve every CPU and starve the read stage)
        pool = min(pool, max(2, -(-batches // 2)))
    return pool


def _pool_size(cfg: DedupConfig) -> int:
    """Size the pool to 3/4 of cluster CPUs so the pool never reserves
    every CPU and starves the read stage (a pool that owns the whole node
    serializes the pipeline).  Proportional — not ``cpus - 2`` — so the
    stage's resource share is identical at every cluster size (a constant
    subtraction gave small clusters a disproportionally small pool,
    distorting scaling measurements)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1, min(cfg.signature_concurrency, (3 * cpus) // 4))


def compute_signatures(ds, cfg: DedupConfig, *, with_gates: bool = False):
    """Rows -> signature table via an actor pool; the binary payload is
    consumed here and never emitted.  ``with_gates=True`` fuses the
    canonicalization gate chain in front (see module docstring)."""
    pool = sized_pool(ds, _pool_size(cfg), cfg.signature_batch_size)
    return ds.map_batches(
        SignatureActor,
        fn_constructor_args=(cfg, with_gates),
        batch_format="pyarrow",
        batch_size=cfg.signature_batch_size,
        # FIXED pool: the autoscaler ramps on queue pressure and reaches
        # full width too late — measured 12.9 s (fixed 12) vs 20.9 s
        # (auto 1..12) for the same 200k-row stage at 16 CPUs, and worse
        # in-pipeline (46.7 s).  Small inputs pay a few idle actor starts;
        # the scaling bar pays for ramp lag at every cluster size.
        concurrency=pool,
        num_cpus=1,
    )
