"""Stage-level tests over small in-memory datasets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from courlan_ray.config import DedupConfig


def _rd():
    import ray.data as rd
    return rd


def test_exact_dedup_min_id_wins_and_edges():
    import ray.data as rd
    from courlan_ray.stages.exact_dedup import exact_dedup
    from courlan_ray.functions.imagecodec import encode_image
    img = encode_image(np.zeros((8, 8, 3), dtype=np.uint8), "png")
    rows = [
        {"image_id": "b", "caption_key": "same text", "phash": 7, "bytes": img},
        {"image_id": "a", "caption_key": "same text", "phash": 7, "bytes": img},
        {"image_id": "c", "caption_key": "other", "phash": 9, "bytes": img},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    cfg = DedupConfig()
    survivors, edges = exact_dedup(ds, cfg)
    s = sorted(r["image_id"] for r in survivors.select_columns(["image_id"]).take_all())
    e = edges.to_pandas()
    assert s == ["a", "c"]
    assert e.values.tolist() == [["a", "b"]]


def test_group_sample_semantics():
    """sample_urls semantics (/root/reference/courlan/sampling.py:15-68):
    per-group k, all if fewer, exclude_min/max drop whole groups."""
    import ray.data as rd
    from courlan_ray.stages.sampling import group_sample
    rows = ([{"g": "big", "image_id": f"b{i}"} for i in range(20)]
            + [{"g": "small", "image_id": "s0"}]
            + [{"g": "mid", "image_id": f"m{i}"} for i in range(5)])
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = group_sample(ds, "g", 3, exclude_min=2, exclude_max=10,
                       seed=1).to_pandas()
    by = out.groupby("g").size().to_dict()
    assert by == {"mid": 3}          # big excluded (>10), small excluded (<2)
    # deterministic
    out2 = group_sample(ds, "g", 3, exclude_min=2, exclude_max=10,
                        seed=1).to_pandas()
    assert sorted(out["image_id"]) == sorted(out2["image_id"])


def test_driver_union_find():
    from courlan_ray.stages.components import driver_union_find
    edges = pd.DataFrame({"left_id": ["a", "b", "x"],
                          "right_id": ["b", "c", "y"]})
    out = driver_union_find(edges).set_index("image_id")["cluster_id"]
    assert out["a"] == out["b"] == out["c"] == "a"
    assert out["x"] == out["y"] == "x"


def test_distributed_components_matches_union_find():
    import ray.data as rd
    from courlan_ray.stages.components import (driver_union_find,
                                               distributed_components)
    rng = np.random.default_rng(5)
    # random edges over 60 nodes with chain structure
    nodes = [f"n{i:03d}" for i in range(60)]
    edges = pd.DataFrame({
        "left_id": [nodes[i] for i in rng.integers(0, 60, 80)],
        "right_id": [nodes[i] for i in rng.integers(0, 60, 80)],
    })
    edges = edges[edges.left_id != edges.right_id].reset_index(drop=True)
    want = driver_union_find(edges).sort_values("image_id").reset_index(drop=True)
    cfg = DedupConfig(shuffle_partitions=4)
    got = distributed_components(rd.from_pandas(edges), cfg).to_pandas() \
        .sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(want, got, check_dtype=False)


def test_candidate_pairs_find_planted_cliques():
    import ray.data as rd
    from courlan_ray.stages.signatures import compute_signatures
    from courlan_ray.stages.lsh import candidate_pairs
    from courlan_ray.functions.imagecodec import encode_image
    from courlan_ray.sources.synth import make_image
    cfg = DedupConfig(signature_concurrency=1)
    rows = []
    for i in range(30):
        img = make_image(i, 64, 7)
        cap = f"unique caption number {i} about topic {i * 13 % 97} variety"
        rows.append({"image_id": f"v{i:03d}", "caption_key": cap,
                     "bytes": encode_image(img, "png"), "phash": 0})
    # plant a near-dup caption pair and a re-encoded image pair
    rows.append(dict(rows[0], image_id="v900",
                     caption_key=rows[0]["caption_key"] + " tail"))
    rows.append(dict(rows[1], image_id="v901",
                     bytes=encode_image(make_image(1, 64, 7), "jpeg", 75)))
    ds = rd.from_pandas(pd.DataFrame(rows))
    sigs = compute_signatures(ds, cfg).materialize()
    pairs = candidate_pairs(sigs, cfg).to_pandas()
    got = {tuple(sorted(p)) for p in pairs[["left_id", "right_id"]].values}
    assert ("v000", "v900") in got
    assert ("v001", "v901") in got


def test_hot_bucket_salting_preserves_connectivity():
    import ray.data as rd
    from courlan_ray.stages.signatures import compute_signatures
    from courlan_ray.stages.lsh import candidate_pairs
    from courlan_ray.stages.components import connected_components
    from courlan_ray.functions.imagecodec import encode_image
    from courlan_ray.sources.synth import make_image
    cfg = DedupConfig(signature_concurrency=1, num_salts=4)
    # 40 rows with the SAME caption (hot band), distinct images
    rows = [{"image_id": f"h{i:03d}",
             "caption_key": "identical hot caption shared by many rows",
             "bytes": encode_image(make_image(100 + i, 64, 7), "png"),
             "phash": 0} for i in range(40)]
    ds = rd.from_pandas(pd.DataFrame(rows))
    sigs = compute_signatures(ds, cfg).materialize()
    pairs = candidate_pairs(sigs, cfg)
    comp = connected_components(pairs, cfg).to_pandas()
    # all 40 rows must land in ONE component despite salting
    assert comp["cluster_id"].nunique() == 1
    assert len(comp) == 40


def test_agg_mode_resolution_and_shuffle_path():
    """VERDICT round 1 #5: a lazy input with declared cardinality above
    TREE_MAX_GROUPS must route to the keyed-shuffle path, and that path
    must produce the same result as the tree."""
    import ray.data as rd
    from courlan_ray.stages.agg import grouped_agg, resolve_agg_mode

    df = pd.DataFrame({"k": ["a", "b", "a", "c", "b", "a"],
                       "v": [1, 2, 3, 4, 5, 6]})
    lazy = rd.from_pandas(df).map_batches(lambda b: b,
                                          batch_format="pyarrow")
    # routing contract
    assert resolve_agg_mode(lazy, approx_count=10**9) == "shuffle"
    assert resolve_agg_mode(lazy, approx_count=100) == "tree"
    assert resolve_agg_mode(lazy, approx_count=None) == "tree"
    big = rd.from_pandas(df).materialize()
    assert resolve_agg_mode(big, None, tree_max_groups=2) == "shuffle"

    # both paths agree
    expect = {"a": 1, "b": 2, "c": 4}
    for mode in ("tree", "shuffle"):
        out = grouped_agg(lazy, ["k"], [("v", "min", "v_min")], mode=mode)
        got = {r["k"]: r["v_min"] for r in out.take_all()}
        assert got == expect, (mode, got)
