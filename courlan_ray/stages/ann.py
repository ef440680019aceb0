"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce``: cosine top-k against a broadcast query matrix — one
  ``ray.put`` of the query block, a vectorized matmul per batch, partial
  top-k per batch, tiny global merge.  The exact baseline.
- ``ann_lsh``: random-hyperplane (SimHash) bucketed variant — the scale
  path: query probes only its own hash bucket (plus multi-probe neighbors),
  so per-query work drops from O(N) to O(N / 2^bits * probes).
- ``embedding_neardup_pairs``: embedding-cosine near-duplicate pairs via
  the same hyperplane buckets + star edges + exact cosine verification.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..config import DedupConfig
from ..functions.hashing import splitmix64
from .joins import cached_get

_U64 = np.uint64


def _vecs(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks()
    flat = np.asarray(arr.flatten().to_numpy(zero_copy_only=False), dtype=np.float64)
    return flat.reshape(batch.num_rows, -1)


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((dim, bits))


def _bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes) > 0
    weights = (np.uint64(1) << np.arange(planes.shape[1], dtype=np.uint64))
    return (bits.astype(np.uint64) @ weights).astype(np.int64)


def knn_bruteforce(ds, queries: np.ndarray, k: int, *,
                   id_col: str = "vec_id", vec_col: str = "embedding"):
    """Exact cosine top-k for each query row.  Returns a pa.Table
    (query_idx, vec_id, cos_sim) of k rows per query.

    Per batch: normalize, one (B x D) @ (D x Q) matmul, per-batch partial
    top-k; global merge of tiny partials on the driver."""
    q = np.asarray(queries, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    qref = ray.put(qn.T)                       # (D, Q)

    def partial(batch: pa.Table) -> pa.Table:
        vecs = _vecs(batch, vec_col)
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = (vecs / norms) @ cached_get(qref)          # (B, Q)
        nq = sims.shape[1]
        kk = min(k, sims.shape[0])
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]      # (kk, Q)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_q = np.repeat(np.arange(nq, dtype=np.int64), kk)
        out_i = ids[top.T.ravel()]
        out_s = sims[top.T.ravel(), out_q]
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_i),
                         "cos_sim": pa.array(out_s, pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = (parts.sort_values(["query_idx", "cos_sim", id_col],
                             ascending=[True, False, True])
           .groupby("query_idx").head(k).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def ann_lsh(ds, queries: np.ndarray, k: int, *, bits: int = 8,
            n_probes: int = 3, seed: int = 97,
            id_col: str = "vec_id", vec_col: str = "embedding"):
    """Approximate top-k: hyperplane-bucket the corpus, probe each query's
    bucket plus its ``n_probes`` nearest Hamming-1 buckets.  Returns the
    same schema as knn_bruteforce (approximate contents)."""
    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    planes = _hyperplanes(dim, bits, seed)
    pref = ray.put(planes)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)

    # probe set per query: own bucket + flips of the lowest-margin bits
    margins = qn @ planes
    base = _bucket_of(qn, planes)
    probe_sets = []
    order = np.argsort(np.abs(margins), axis=1)
    for qi in range(q.shape[0]):
        pset = {int(base[qi])}
        for j in range(min(n_probes, bits)):
            pset.add(int(base[qi]) ^ (1 << int(order[qi, j])))
        probe_sets.append(pset)
    wanted = sorted(set().union(*probe_sets))
    wref = ray.put(np.array(wanted, dtype=np.int64))
    qref = ray.put(qn.T)

    def partial(batch: pa.Table) -> pa.Table:
        planes_ = cached_get(pref)
        vecs = _vecs(batch, vec_col)
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        vn = vecs / norms
        buckets = _bucket_of(vn, planes_)
        keep = np.isin(buckets, cached_get(wref))
        if not keep.any():
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             id_col: pa.array([], batch[id_col].type),
                             "cos_sim": pa.array([], pa.float64()),
                             "bucket": pa.array([], pa.int64())})
        vn = vn[keep]
        sims = vn @ cached_get(qref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        nq = sims.shape[1]
        out_q = np.repeat(np.arange(nq, dtype=np.int64), vn.shape[0])
        out_i = np.tile(ids, nq)
        out_s = sims.T.ravel()
        out_b = np.tile(buckets[keep], nq)
        return pa.table({"query_idx": pa.array(out_q, pa.int64()),
                         id_col: pa.array(out_i),
                         "cos_sim": pa.array(out_s, pa.float64()),
                         "bucket": pa.array(out_b, pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # keep only rows whose bucket is in the query's own probe set
    keep_mask = [parts["bucket"].iloc[i] in probe_sets[parts["query_idx"].iloc[i]]
                 for i in range(len(parts))]
    parts = parts[np.array(keep_mask, dtype=bool)] if len(parts) else parts
    out = (parts.sort_values(["query_idx", "cos_sim", id_col],
                             ascending=[True, False, True])
           .groupby("query_idx").head(k)
           .drop(columns=["bucket"]).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def embedding_neardup_pairs(ds, cfg: DedupConfig, *, threshold: float = 0.95,
                            bits: int = 10, id_col: str = "vec_id",
                            vec_col: str = "embedding"):
    """Embedding-cosine near-dup candidate pairs: hyperplane buckets ->
    star edges (min id per bucket) -> exact cosine verification.
    Returns Dataset (left_id, right_id, cos_sim) with cos_sim >= threshold."""
    from .agg import grouped_agg
    from .joins import attach_by_key, _collect

    seed = cfg.seed + 31

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = _vecs(batch, vec_col)
        dim = vecs.shape[1]
        planes = _hyperplanes(dim, bits, seed)
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        b = _bucket_of(vecs / norms, planes)
        ids = pa.compute.cast(batch[id_col], pa.string())
        return pa.table({"bucket": pa.array(b, pa.int64()), "vid": ids})

    banded = ds.map_batches(bucketize, batch_format="pyarrow").materialize()
    reps = grouped_agg(banded, ["bucket"], [("vid", "min", "rep")])
    edges = attach_by_key(banded, reps, ["bucket"]).map_batches(
        lambda b: b[b["vid"] != b["rep"]], batch_format="pandas")

    # verify with exact cosine: broadcast the (small) vector table
    vec_tbl = _collect(ds.map_batches(
        lambda b: pa.table({"vid": pa.compute.cast(b[id_col], pa.string()),
                            vec_col: b[vec_col]}), batch_format="pyarrow"))
    vref = ray.put(vec_tbl)

    def verify(batch: pa.Table) -> pa.Table:
        tbl = cached_get(vref)
        lookup = {v: i for i, v in enumerate(tbl["vid"].to_pylist())}
        mat = np.asarray(tbl[vec_col].combine_chunks().flatten()
                         .to_numpy(zero_copy_only=False),
                         dtype=np.float64).reshape(tbl.num_rows, -1)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        l = [lookup[v] for v in batch["rep"].to_pylist()]
        r = [lookup[v] for v in batch["vid"].to_pylist()]
        sims = np.einsum("ij,ij->i", mat[l], mat[r])
        keep = sims >= threshold
        return pa.table({"left_id": batch["rep"].filter(pa.array(keep)),
                         "right_id": batch["vid"].filter(pa.array(keep)),
                         "cos_sim": pa.array(np.round(sims[keep], 4),
                                             pa.float64())})

    return edges.map_batches(verify, batch_format="pyarrow")
