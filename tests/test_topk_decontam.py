"""Distributed top-k (stages/topk.py) and benchmark decontamination
(stages/decontam.py).  Oracle parity for the three driver queries is
covered by the parametrized test in test_oracles.py; these pin the stage
semantics directly (multi-block exactness, ties, planted contamination,
empty edges)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from courlan_ray.stages.decontam import (benchmark_gram_hashes,
                                         contamination_counts)
from courlan_ray.stages.topk import topk_rows


def _ds(df: pd.DataFrame, blocks: int):
    return rd.from_pandas(df).repartition(blocks)


def test_topk_matches_pandas_across_blocks():
    rng = np.random.default_rng(7)
    df = pd.DataFrame({"a": rng.integers(0, 50, 500),
                       "b": rng.standard_normal(500),
                       "id": np.arange(500)})
    got = topk_rows(_ds(df, 13), [("a", "descending"), ("id", "ascending")],
                    25).to_pandas()
    want = df.sort_values(["a", "id"], ascending=[False, True]).head(25)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_topk_ascending_with_ties_is_deterministic():
    df = pd.DataFrame({"v": [3, 1, 1, 1, 2, 0, 0], "id": range(7)})
    got = topk_rows(_ds(df, 4), [("v", "ascending"), ("id", "ascending")],
                    4).to_pandas()
    assert got["id"].tolist() == [5, 6, 1, 2]


def test_topk_k_exceeds_rows_and_empty():
    df = pd.DataFrame({"v": [2, 1], "id": [0, 1]})
    got = topk_rows(_ds(df, 2), [("v", "ascending"), ("id", "ascending")],
                    10).to_pandas()
    assert got["v"].tolist() == [1, 2]
    empty = topk_rows(_ds(df.iloc[:0], 1), [("v", "ascending")], 3)
    assert empty.count() == 0


_BENCH = ["the quick brown fox jumps over the lazy dog tonight",
          "pack my box with five dozen liquor jugs right now ok"]
_PROBE = pd.DataFrame({
    "doc_id": [1, 2, 3, 4],
    "text": [
        # embeds bench doc 0's full 10-token span -> all 3 of its 8-grams
        "intro the quick brown fox jumps over the lazy dog tonight outro",
        "completely unrelated text about distributed dataframes and rays",
        # shares exactly the first 8 tokens of bench doc 1 -> one 8-gram
        "pack my box with five dozen liquor jugs extra",
        # shares only a 7-token prefix -> below the n=8 threshold
        "pack my box with five dozen liquor vodka today maybe"]})


def test_decontamination_planted_hits():
    bench = rd.from_pandas(pd.DataFrame({"text": _BENCH}))
    grams = benchmark_gram_hashes(bench, "text", n=8, seed=41)
    # bench doc 0 has 10 tokens -> 3 grams; doc 1 has 11 -> 4 grams
    assert grams.size == 7
    out = contamination_counts(_ds(_PROBE, 2), grams, "doc_id", "text",
                               n=8, seed=41).to_pandas()
    hits = dict(zip(out["doc_id"], out["n_hits"]))
    assert hits[1] == 3      # all 3 grams of bench doc 0 appear verbatim
    assert hits[2] == 0      # clean doc
    assert hits[3] == 1      # one shared 8-gram (bench doc 1's prefix)
    assert hits[4] == 0      # 7-token overlap only — below n=8


def test_decontamination_empty_benchmark():
    bench = rd.from_pandas(pd.DataFrame({"text": []}, dtype=str))
    grams = benchmark_gram_hashes(bench, "text", n=8, seed=41)
    assert grams.size == 0
    out = contamination_counts(_ds(_PROBE, 1), grams, "doc_id", "text",
                               n=8, seed=41).to_pandas()
    assert (out["n_hits"] == 0).all()


def test_decontamination_pre_filter_fused():
    """The pre-filter hook splits benchmark/probe inside one kernel."""
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": [_BENCH[0], _PROBE["text"][0]]})
    is_b = lambda b: b.filter(pa.array(
        b["doc_id"].to_numpy(zero_copy_only=False) == 0))
    not_b = lambda b: b.filter(pa.array(
        b["doc_id"].to_numpy(zero_copy_only=False) != 0))
    ds = _ds(df, 2)
    grams = benchmark_gram_hashes(ds, "text", n=8, seed=41, pre=is_b)
    out = contamination_counts(ds, grams, "doc_id", "text", n=8, seed=41,
                               pre=not_b).to_pandas()
    assert out["doc_id"].tolist() == [1] and out["n_hits"].tolist() == [3]
