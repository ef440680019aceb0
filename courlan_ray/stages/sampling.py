"""Grouped sampling operators.

``group_sample`` reimplements the reference's ``sample_urls`` semantics
(/root/reference/courlan/sampling.py:15-68): per group take k rows (all if
fewer), drop whole groups outside [exclude_min, exclude_max], sorted output
per group.  One deliberate deviation (SURVEY.md §4 ordering): the draw is
*seeded and key-derived* (rank by hash(image_id, seed)) instead of
``random.sample``, so re-runs, resumes and both parallelism levels produce
byte-identical samples.

``cluster_representatives`` is the UrlStore one-per-domain draw
(``get_url``, urlstore.py:409-430) generalized: one representative per
cluster = the minimum id (deterministic, order-free).
"""

from __future__ import annotations

import numpy as np

from ..config import DedupConfig
from ..functions.hashing import hash_strings


def group_sample(ds, key: str, k: int, *, exclude_min: int = 0,
                 exclude_max: int = 1 << 62, seed: int = 0,
                 id_col: str = "image_id", approx_groups: int | None = None):
    """Per-group deterministic sample of k rows; groups with fewer than
    exclude_min or more than exclude_max rows are dropped entirely.

    Fully vectorized (VERDICT round 3 next #3 — no per-group pandas
    callback): group sizes come from the associative combine tree
    (stages/agg.grouped_agg), the size gate is a size-adaptive join +
    arrow filter, and the k-smallest-rank draw per group is the
    partial/combine top-k tree (stages/topk.topk_per_group) — at most ONE
    keyed shuffle end-to-end, and only above the tree's declared group
    bound."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from .agg import grouped_agg, meta_rows
    from .joins import attach_by_key
    from .topk import topk_per_group

    # declared-cardinality routing (the lazy-auto trap): a lazy input
    # without a bound would default the tree's final combine to one block
    # holding every distinct key — pass approx_groups at scale, or let a
    # metadata-known input row count stand in as the upper bound
    if approx_groups is None:
        approx_groups = meta_rows(ds)

    sizes = grouped_agg(ds, [key], [(id_col, "count", "_gsz")],
                        approx_count=approx_groups)
    gated = attach_by_key(ds, sizes, [key])

    def gate_and_rank(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["_gsz"], pa.scalar(exclude_min)),
                       pc.less_equal(b["_gsz"], pa.scalar(exclude_max)))
        b = b.filter(keep).drop_columns(["_gsz"])
        ids = b[id_col].cast(pa.string()).to_numpy(zero_copy_only=False)
        rank = hash_strings(ids.astype(object), seed=seed)
        return b.append_column("_rank", pa.array(rank.view(np.int64)))

    ranked = gated.map_batches(gate_and_rank, batch_format="pyarrow")
    picked = topk_per_group(ranked, [key],
                            [("_rank", "ascending"), (id_col, "ascending")],
                            k, approx_groups=approx_groups)

    def order_out(b: pa.Table) -> pa.Table:
        b = b.drop_columns(["_rank"])
        return b.take(pc.sort_indices(
            b, sort_keys=[(key, "ascending"), (id_col, "ascending")]))

    return picked.map_batches(order_out, batch_format="pyarrow",
                              batch_size=None)


def cluster_representatives(clusters_ds, cfg: DedupConfig,
                            id_col: str = "image_id",
                            cluster_col: str = "cluster_id"):
    """(image_id, cluster_id, is_representative, cluster_size) —
    representative = min id per cluster (the one-per-cluster draw).

    Vectorized at scale: per-cluster min/count via the associative combine
    tree (stages/agg.py), then a size-adaptive join back — never per-group
    Python."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from .agg import grouped_agg
    from .joins import attach_by_key

    stats = grouped_agg(clusters_ds, [cluster_col],
                        [(id_col, "min", "_rep"),
                         (id_col, "count", "cluster_size")])
    joined = attach_by_key(clusters_ds, stats, [cluster_col],
                           num_partitions=cfg.shuffle_partitions)

    def mark(batch: pa.Table) -> pa.Table:
        is_rep = pc.equal(batch[id_col], batch["_rep"])
        return batch.drop_columns(["_rep"]).append_column(
            "is_representative", is_rep)

    return joined.map_batches(mark, batch_format="pyarrow")
