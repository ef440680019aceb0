"""Text near-dup pipeline on planted document duplicates."""

import numpy as np
import pandas as pd
import pytest

from courlan_ray.config import DedupConfig
from courlan_ray.pipelines.text_dedup import text_dedup_pipeline

BASE = ("the quick brown fox jumps over the lazy dog while the rain "
        "falls quietly on the old stone bridge near the harbor")


def _docs():
    rng = np.random.default_rng(7)
    vocab = ("river stone bridge harbor night morning winter summer cloud "
             "train boat garden tower market castle lantern meadow").split()
    rows = []
    for i in range(60):
        words = [vocab[w] for w in rng.integers(0, len(vocab), 12)]
        rows.append({"doc_id": i, "text": f"unique document {i}: " + " ".join(words)})
    # planted: exact dup, near dup (small edit), substring overlap
    rows.append({"doc_id": 100, "text": rows[0]["text"]})
    rows.append({"doc_id": 101, "text": rows[1]["text"] + " extra"})
    rows.append({"doc_id": 102, "text": "prefix words then " + BASE})
    rows.append({"doc_id": 103, "text": BASE + " and a different ending tail"})
    return pd.DataFrame(rows)


def test_text_dedup_clusters_planted_pairs():
    import ray.data as rd
    ds = rd.from_pandas(_docs())
    out = text_dedup_pipeline(ds, DedupConfig(signature_concurrency=1))
    clusters = out["clusters"].to_pandas().set_index("image_id")["cluster_id"]
    assert clusters["0"] == clusters["100"]          # exact dup
    assert clusters["1"] == clusters["101"]          # near-dup edit
    assert clusters["102"] == clusters["103"]        # long shared substring
    # unrelated docs stay apart
    assert clusters["2"] != clusters["3"]
    sizes = clusters.value_counts()
    assert (sizes > 1).sum() == 3
