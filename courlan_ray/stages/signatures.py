"""Signature stage: the stateful actor-pool ``map_batches``.

Per actor (``__init__``, once): MinHash permutation salts, DCT matrix warm,
codec state — the per-process LRU-cache pattern of the reference
(/root/reference/courlan/filters.py:180, meta.py:20-24) made explicit.

Per batch (``__call__``): decode pixels -> recompute phash (verifying the
precomputed ``phash`` column) + pixel SimHash; caption shingles -> MinHash
signature + caption SimHash; winnowing substring fingerprints.  Decoded
pixels are dropped before return — only narrow signature columns ever reach
a shuffle (SURVEY.md §4 memory row).

Output schema:
  image_id, caption_key, minhash: fixed_size_list<uint64>[num_perm],
  simhash_cap: int64 (bits), simhash_pix: int64, phash: int64 (recomputed),
  fingerprints: list<uint64>, shingle_count: int32, decode_ok: bool
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions import imagecodec as codec
from ..functions.hashing import (char_shingle_hashes, minhash_signatures,
                                 simhash64, winnowing_fingerprints)


def _pixel_features(arr: np.ndarray) -> np.ndarray:
    """64 block-mean luma features for the pixel SimHash: 8x8 area means."""
    g = codec._resize_gray_32(arr)
    return g.reshape(8, 4, 8, 4).mean(axis=(1, 3)).ravel()


def pixel_simhash64(arr: np.ndarray) -> int:
    """64-bit pixel SimHash: block-mean luma vs global mean."""
    feats = _pixel_features(arr)
    bits = (feats > feats.mean()).astype(np.uint8)
    return int(np.packbits(bits, bitorder="little").view("<u8")[0])


class SignatureActor:
    """Callable class for ``map_batches(SignatureActor, fn_constructor_args=
    (cfg,), concurrency=N)`` — setup once per actor, vectorized per batch."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        # touch the module-level DCT matrix so first-batch latency is paid here
        codec._DCT32 @ codec._DCT32.T

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        captions = batch["caption_key"].to_pylist()

        sh, counts = char_shingle_hashes(captions, cfg.shingle_width, seed=cfg.seed)
        minh = minhash_signatures(sh, counts, cfg.num_perm, seed=cfg.seed + 1)
        sim_cap = simhash64(sh, counts)
        fps, fp_counts = winnowing_fingerprints(
            captions, cfg.fingerprint_k, cfg.fingerprint_window, seed=cfg.seed + 2)

        payloads = batch["bytes"].to_pylist()
        phash = np.zeros(n, dtype=np.uint64)
        sim_pix = np.zeros(n, dtype=np.uint64)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):          # decode is inherently per-payload
            try:
                arr = codec.decode_image(payloads[i])
                phash[i] = codec.phash64(arr)
                sim_pix[i] = pixel_simhash64(arr)
                ok[i] = True
            except codec.CodecError:
                pass

        mh_flat = pa.array(minh.view(np.int64).ravel(), pa.int64())
        minhash_col = pa.FixedSizeListArray.from_arrays(mh_flat, cfg.num_perm)
        fp_offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(fp_counts, out=fp_offsets[1:])
        fp_col = pa.ListArray.from_arrays(pa.array(fp_offsets, pa.int32()),
                                          pa.array(fps.view(np.int64), pa.int64()))
        return pa.table({
            "image_id": batch["image_id"],
            "caption_key": batch["caption_key"],
            "minhash": minhash_col,
            "simhash_cap": pa.array(sim_cap.view(np.int64), pa.int64()),
            "simhash_pix": pa.array(sim_pix.view(np.int64), pa.int64()),
            "phash": pa.array(phash.view(np.int64), pa.int64()),
            "fingerprints": fp_col,
            "shingle_count": pa.array(counts.astype(np.int32), pa.int32()),
            "decode_ok": pa.array(ok),
        })


def compute_signatures(ds, cfg: DedupConfig):
    """Valid rows -> signature table via an actor pool; binary payload is
    consumed here and never emitted.

    Pool size is clamped to CPUs-2 so the pool never reserves every CPU and
    starves the read/shuffle stages (a pool that owns the whole node
    serializes the pipeline)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    pool = max(1, min(cfg.signature_concurrency, cpus - 2))
    return ds.map_batches(
        SignatureActor,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.signature_batch_size,
        concurrency=pool,
        num_cpus=1,
    )
