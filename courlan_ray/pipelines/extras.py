"""Non-SQL-expressible query pipelines (driver records rows-only checks).

MinHash/LSH clustering, SimHash, winnowing fingerprints, language-ID,
quality scoring, ANN, embedding near-dup, and the flagship image pipeline
on the deterministic synthetic table (sized by sf).  All deterministic, so
row counts and values are stable across driver runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import DedupConfig

_SF_ROWS = {"0.001": 2000, "0.01": 6000, "0.1": 20000}


def _sf_of(sf_dir: str) -> str:
    for k in _SF_ROWS:
        if sf_dir.rstrip("/").endswith("sf" + k):
            return k
    return "0.001"


def _read(sf_dir: str, name: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def doc_minhash_clusters(sf_dir: str):
    """Full text near-dup pipeline over documents."""
    from .text_dedup import text_dedup_pipeline
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = text_dedup_pipeline(ds, DedupConfig())
    return out["clusters"]


def doc_simhash(sf_dir: str):
    """Per-doc 64-bit SimHash (hex) + shingle count."""
    from ..functions.hashing import char_shingle_hashes, simhash64
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def kernel(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.replace_substring_regex(b["text"], r"\s+", " ")))
        h, c = char_shingle_hashes(norm.to_pylist(), 5, seed=11)
        s = simhash64(h, c)
        return pa.table({"doc_id": b["doc_id"],
                         "simhash": pa.array([f"{v:016x}" for v in s]),
                         "shingles": pa.array(c.astype(np.int64))})

    return ds.map_batches(kernel, batch_format="pyarrow")


def doc_langid(sf_dir: str):
    """Heuristic language-ID over documents (rows-only; the table's texts
    are synthetic word soup, so this exercises plumbing + determinism)."""
    from ..functions.textstats import detect_language
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def kernel(b: pa.Table) -> pa.Table:
        langs, conf = detect_language(b["text"].to_pylist())
        return pa.table({"doc_id": b["doc_id"], "lang_label": b["lang"],
                         "lang_pred": pa.array(list(langs), pa.string()),
                         "conf": pa.array(np.round(conf, 4), pa.float64())})

    return ds.map_batches(kernel, batch_format="pyarrow")


def doc_quality(sf_dir: str):
    """Quality-score features per doc (length/punct/stopword ratios)."""
    from ..functions.textstats import quality_scores
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def kernel(b: pa.Table) -> pa.Table:
        q = quality_scores(b["text"].to_pylist())
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": pa.array(q["n_tokens"]),
                         "stop_ratio": pa.array(np.round(q["stop_ratio"], 4)),
                         "unique_ratio": pa.array(np.round(q["unique_ratio"], 4)),
                         "quality": pa.array(np.round(q["quality"], 4))})

    return ds.map_batches(kernel, batch_format="pyarrow")


def doc_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (rolling-hash selection)."""
    from ..functions.hashing import winnowing_fingerprints
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def kernel(b: pa.Table) -> pa.Table:
        fps, cnt = winnowing_fingerprints(b["text"].to_pylist(), 8, 4, seed=13)
        off = np.zeros(b.num_rows + 1, dtype=np.int32)
        np.cumsum(cnt, out=off[1:])
        return pa.table({"doc_id": b["doc_id"],
                         "n_fingerprints": pa.array(cnt.astype(np.int64)),
                         "fp_min": pa.array(
                             [f"{fps[off[i]:off[i+1]].min():016x}" if cnt[i] else ""
                              for i in range(b.num_rows)])})

    return ds.map_batches(kernel, batch_format="pyarrow")


def emb_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate top-5 for 4 fixed query vectors, compared
    against the brute-force baseline schema."""
    from ..stages.ann import ann_lsh
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qs = []
    for r in ds.take(4):
        qs.append(np.asarray(r["embedding"], dtype=np.float64))
    return ann_lsh(ds, np.stack(qs), 5, bits=8, n_probes=3, seed=97)


def emb_knn_batch(sf_dir: str):
    """Brute-force cosine top-5 for 4 fixed query vectors (exact baseline)."""
    from ..stages.ann import knn_bruteforce
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    qs = []
    for r in ds.take(4):
        qs.append(np.asarray(r["embedding"], dtype=np.float64))
    out = knn_bruteforce(ds, np.stack(qs), 5)
    df = out.to_pandas()
    df["cos_sim"] = df["cos_sim"].round(4)
    return pa.Table.from_pandas(df, preserve_index=False)


def emb_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs (hyperplane buckets + verify)."""
    from ..stages.ann import embedding_neardup_pairs
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    # the testdata embeddings are random (max pairwise cos ~0.4); a low
    # threshold keeps the pair path exercised end-to-end
    return embedding_neardup_pairs(ds, DedupConfig(), threshold=0.25, bits=6)


_IMG_MEMO: dict[str, dict] = {}


def _image_pipeline(sf_dir: str) -> dict:
    """Run (once per sf per process) the flagship pipeline on the synthetic
    table; clusters/counters queries share the result."""
    key = _sf_of(sf_dir)
    if key not in _IMG_MEMO:
        import ray.data as rd
        from ..sources.synth import synth_parquet
        from .image_dedup import dedup_pipeline
        path = synth_parquet(_SF_ROWS[key], 42)
        out = dedup_pipeline(rd.read_parquet(path), DedupConfig())
        out["clusters"] = out["clusters"].materialize()
        out["counters"] = out["counters"].materialize()
        _IMG_MEMO[key] = out
    return _IMG_MEMO[key]


def image_dedup_clusters(sf_dir: str):
    """Flagship pipeline on the deterministic synthetic image+caption table
    sized by sf (cached parquet under /tmp)."""
    return _image_pipeline(sf_dir)["clusters"]


def image_dedup_counters(sf_dir: str):
    """Reject-reason lineage counters of the flagship pipeline."""
    return _image_pipeline(sf_dir)["counters"].sort("reject_reason")


EXTRAS = {
    "doc_minhash_clusters": doc_minhash_clusters,
    "doc_simhash": doc_simhash,
    "doc_langid": doc_langid,
    "doc_quality": doc_quality,
    "doc_fingerprints": doc_fingerprints,
    "emb_knn_batch": emb_knn_batch,
    "emb_ann_lsh": emb_ann_lsh,
    "emb_neardup": emb_neardup,
    "image_dedup_clusters": image_dedup_clusters,
    "image_dedup_counters": image_dedup_counters,
}
