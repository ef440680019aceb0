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
import pandas as pd

from ..config import DedupConfig
from ..functions.hashing import hash_strings


def group_sample(ds, key: str, k: int, *, exclude_min: int = 0,
                 exclude_max: int = 1 << 62, seed: int = 0,
                 id_col: str = "image_id"):
    """Per-group deterministic sample of k rows; groups with fewer than
    exclude_min or more than exclude_max rows are dropped entirely."""

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n < exclude_min or n > exclude_max:
            return g.iloc[0:0]
        if n <= k:
            return g.sort_values(id_col, kind="mergesort")
        rank = hash_strings(g[id_col].astype(str).to_numpy(dtype=object),
                            seed=seed)
        picked = g.iloc[np.argsort(rank, kind="stable")[:k]]
        return picked.sort_values(id_col, kind="mergesort")

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


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
