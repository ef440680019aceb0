import numpy as np
import pyarrow as pa

from courlan_ray.sources import synth


def test_schema_matches_input_hint():
    t = synth.synth_table(50, seed=42)
    assert t.schema.names == ["image_id", "bytes", "w", "h", "fmt",
                              "caption", "phash"]
    assert t.schema.field("phash").type == pa.int64()
    assert t.schema.field("bytes").type == pa.binary()
    assert t.schema.field("w").type == pa.int32()


def test_generation_pure_function_of_index():
    # generating rows in different batch splits yields identical content
    whole = synth.generate_rows(np.arange(40), 42)
    parts = pa.concat_tables([synth.generate_rows(np.arange(0, 17), 42),
                              synth.generate_rows(np.arange(17, 40), 42)])
    assert whole.equals(parts)


def test_exact_dups_byte_identical():
    n = 400
    plan = synth.row_plan(np.arange(n), 42)
    t = synth.synth_table(n, seed=42).to_pandas().set_index("image_id")
    exact = np.flatnonzero(plan["kind"] == synth.KIND_EXACT)
    assert len(exact) > 0
    for i in exact[:10]:
        src = plan["content_id"][i]
        assert t.loc[f"img-{i:012d}", "bytes"] == t.loc[f"img-{src:012d}", "bytes"]
        assert t.loc[f"img-{i:012d}", "caption"] == t.loc[f"img-{src:012d}", "caption"]


def test_near_dup_image_psnr_holds():
    from courlan_ray.functions import imagecodec as C
    n = 400
    plan = synth.row_plan(np.arange(n), 42)
    t = synth.synth_table(n, seed=42).to_pandas().set_index("image_id")
    img_dups = np.flatnonzero(plan["kind"] == synth.KIND_IMG)
    assert len(img_dups) > 0
    for i in img_dups[:5]:
        src = plan["content_id"][i]
        a = C.decode_image(t.loc[f"img-{i:012d}", "bytes"])
        b = C.decode_image(t.loc[f"img-{src:012d}", "bytes"])
        assert a.shape == b.shape
        assert C.psnr_db(a, b) >= 40.0


def test_truth_tables_cover_dups():
    pairs, clusters = synth.truth_tables(400, 42)
    assert pairs.num_rows > 0
    cdf = clusters.to_pandas()
    assert cdf["image_id"].is_unique
    # every truth pair's members map to the same truth cluster
    cmap = cdf.set_index("image_id")["cluster_id"]
    pdf = pairs.to_pandas()
    assert (pdf["left_id"].map(cmap) == pdf["right_id"].map(cmap)).all()


def test_captions_unique_across_contents():
    # regression: distinct content ids must not share captions
    t = synth.synth_table(800, seed=42).to_pandas()
    plan = synth.row_plan(np.arange(800), 42)
    orig = t[(plan["kind"] == synth.KIND_ORIG)]
    assert orig["caption"].is_unique


def test_read_table_dispatch(tmp_path):
    """readers.read_table: parquet path reads with projection; .lance path
    raises the documented NotImplementedError without the lance wheel."""
    import pyarrow.parquet as pq
    import pytest
    from courlan_ray.sources.readers import read_table

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), p)
    ds = read_table(p, columns=["a"])
    assert ds.schema().names == ["a"] and ds.count() == 2
    try:
        import lance  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError,
                           match="'lance' package.*convert to parquet"):
            read_table(str(tmp_path / "t.lance"))
    else:   # pragma: no cover - no lance wheel in this sandbox
        pytest.skip("lance installed: dispatch path exercised elsewhere")


def test_hot_permille_widens_only_the_hot_band():
    """The skew-probe knob: a widened hot band converts ORIG singletons to
    hot rows and leaves every other planted kind (and its truth) intact."""
    n = 4000
    base = synth.row_plan(np.arange(n), 42)
    skew = synth.row_plan(np.arange(n), 42, hot_permille=200)
    hot_b = (base["kind"] == synth.KIND_HOT).sum()
    hot_s = (skew["kind"] == synth.KIND_HOT).sum()
    assert hot_s > 10 * hot_b                     # ~1% -> ~18% of all rows
    assert 0.15 < hot_s / n < 0.22
    # rows that changed kind were all ORIG before and HOT after
    moved = base["kind"] != skew["kind"]
    assert (base["kind"][moved] == synth.KIND_ORIG).all()
    assert (skew["kind"][moved] == synth.KIND_HOT).all()
    # generated rows agree with the plan: every hot row carries THE caption
    t = synth.synth_table(512, seed=42, hot_permille=200).to_pandas()
    plan = synth.row_plan(np.arange(512), 42, 200)
    assert (t.loc[plan["kind"] == synth.KIND_HOT, "caption"]
            == synth.HOT_CAPTION).all()
    # truth: all hot rows share one cluster
    _, clusters = synth.truth_tables(512, 42, hot_permille=200)
    cdf = clusters.to_pandas().set_index("image_id")["cluster_id"]
    hot_ids = t.loc[plan["kind"] == synth.KIND_HOT, "image_id"]
    assert cdf.loc[hot_ids].nunique() == 1


def test_cached_parquet_write_once_and_marker_staleness(tmp_path, ray_session):
    """The shared write-once cache: second call with the same marker skips
    the write; a marker change (e.g. kernel fingerprint) rebuilds; a
    partial dir without a marker is wiped and rebuilt."""
    import os

    import ray.data as rd

    from courlan_ray.sources.cache import cached_parquet

    calls = []

    def make():
        calls.append(1)
        return rd.range(10)

    out = str(tmp_path / "t")
    cached_parquet(out, make, rows_per_file=4)
    cached_parquet(out, make, rows_per_file=4)
    assert len(calls) == 1                      # write-once
    cached_parquet(out, make, rows_per_file=4, marker="fp2")
    assert len(calls) == 2                      # stale marker rebuilds
    os.remove(os.path.join(out, "_SUCCESS"))    # simulate crashed write
    cached_parquet(out, make, rows_per_file=4, marker="fp2")
    assert len(calls) == 3
    assert rd.read_parquet(out).count() == 10
