"""Text near-duplicate pipeline: the dedup engine applied to a documents
table (doc_id, text) — MinHash+LSH over character shingles, SimHash,
winnowing substring fingerprints, connected components, representatives.

Same stages as the image pipeline minus the pixel channel; demonstrates the
engine is payload-agnostic (the courlan contract over any record stream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions.hashing import (char_shingle_hashes, minhash_signatures,
                                 simhash64, winnowing_fingerprints)
from ..stages.lsh import candidate_pairs
from ..stages.components import cluster_assignments


class TextSignatureActor:
    """Actor-pool signature stage for text rows (id_col, text_col)."""

    def __init__(self, cfg: DedupConfig, id_col: str = "doc_id",
                 text_col: str = "text"):
        self.cfg, self.id_col, self.text_col = cfg, id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        import pyarrow.compute as pc
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.replace_substring_regex(batch[self.text_col], r"\s+", " ")))
        texts = norm.to_pylist()
        sh, counts = char_shingle_hashes(texts, cfg.shingle_width, seed=cfg.seed)
        minh = minhash_signatures(sh, counts, cfg.num_perm, seed=cfg.seed + 1)
        sim = simhash64(sh, counts)
        fps, fpc = winnowing_fingerprints(texts, cfg.fingerprint_k,
                                          cfg.fingerprint_window,
                                          seed=cfg.seed + 2)
        from ..functions.hashing import adjacent_pair_hashes, sort_segments
        fpp, fppc = adjacent_pair_hashes(fps, fpc)  # position order, banding
        fps = sort_segments(fps, fpc)               # sorted, verify side
        mh32 = (minh & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        mh_flat = pa.array(mh32.view(np.int32).ravel(), pa.int32())
        off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(fpc, out=off[1:])
        off2 = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(fppc, out=off2[1:])
        ids = pc.cast(batch[self.id_col], pa.string())
        return pa.table({
            "image_id": ids,                # engine-wide id column name
            "caption_key": norm,
            "minhash": pa.FixedSizeListArray.from_arrays(mh_flat, cfg.num_perm),
            "simhash_cap": pa.array(sim.view(np.int64), pa.int64()),
            "simhash_pix": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "phash": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            "fingerprints": pa.ListArray.from_arrays(
                pa.array(off, pa.int32()), pa.array(fps.view(np.int64), pa.int64())),
            "fp_pairs": pa.ListArray.from_arrays(
                pa.array(off2, pa.int32()),
                pa.array(fpp.view(np.int64), pa.int64())),
            "shingle_count": pa.array(counts.astype(np.int32), pa.int32()),
            "decode_ok": pa.array(np.ones(n, dtype=bool)),
        })


def text_signatures(ds, cfg: DedupConfig, *, id_col="doc_id", text_col="text"):
    # STATELESS task stage, not an actor pool: unlike the image signature
    # actors (stages/signatures.py, which amortize decode state), the text
    # kernel holds nothing per-actor — tasks schedule instantly on free
    # CPUs and skip the ~1-2 s pool ramp every pipeline run paid.
    kernel = TextSignatureActor(cfg, id_col, text_col)
    # batch_size=None (one batch per block): a fixed batch_size makes Ray
    # RE-BUNDLE blocks into exact-size batches across block boundaries,
    # which serialized a 64-block input and tripled stage wall time
    # (measured 0.84 s -> 0.27 s at sf0.1); the kernel is pure vectorized
    # hashing with no per-batch state, so block-sized batches are right at
    # any scale (blocks are already bounded by target_max_block_size)
    return ds.map_batches(kernel.__call__,
                          batch_format="pyarrow",
                          batch_size=None)


def text_dedup_pipeline(ds, cfg: DedupConfig | None = None, *,
                        id_col="doc_id", text_col="text") -> dict:
    """documents -> clusters + verified pairs over the text-only channels
    (MinHash + winnowing fingerprints; the pixel channel is disabled)."""
    import dataclasses
    from ..stages.verify import verify_pairs

    cfg = cfg or DedupConfig()
    if "phash" in cfg.channels:
        cfg = dataclasses.replace(cfg, channels=("minhash", "fingerprint"))
    sigs = text_signatures(ds, cfg, id_col=id_col, text_col=text_col).materialize()
    cands = candidate_pairs(sigs, cfg)
    scored = verify_pairs(cands, sigs, cfg).materialize()
    verified = scored.filter(expr="verified == True")
    edges = verified.select_columns(["left_id", "right_id"])
    all_ids = sigs.select_columns(["image_id"])
    clusters = cluster_assignments(edges, all_ids, cfg)
    return {"clusters": clusters, "pairs": scored, "signatures": sigs}
