"""Exact / variant-invariant deduplication.

Generalizes the reference's ``is_known_link`` variant-invariant membership
probe (/root/reference/courlan/urlutils.py:148-174: a URL and its
±trailing-slash / http↔https variants count as one) to content rows: the
dedup key is ``hash(caption_key) ^ mix(phash)`` — rows whose captions differ
only by scrubbed dirt or case, with identical perceptual content, collapse.

Scale shape: the ``groupby(exact_key)`` shuffle moves ONLY the narrow
``(exact_key, image_id)`` projection — the binary image payload never
crosses a shuffle (SURVEY.md §7.4).  Keeper = min image_id per group
(order-free determinism, unlike the reference's arrival-order deque
first-wins, urlstore.py:248-258).  Survivor rows are recovered with an
anti-join on the (small) dropped-id set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import DedupConfig
from ..functions.hashing import hash_strings, hash_u64_pair
from .joins import filter_by_keys


def add_exact_key(ds, cfg: DedupConfig, key_col: str = "exact_key"):
    """Vectorized key column: mix of case-folded canonical caption and
    perceptual hash."""
    def kernel(batch: pa.Table) -> pa.Table:
        ck = hash_strings(batch["caption_key"].to_pylist(), seed=cfg.seed)
        ph = batch["phash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        key = hash_u64_pair(ck, ph).view(np.int64)
        return batch.append_column(key_col, pa.array(key, pa.int64()))
    return ds.map_batches(kernel, batch_format="pyarrow", batch_size=cfg.batch_size)


def exact_dup_edges(keyed_ds, cfg: DedupConfig, id_col: str = "image_id"):
    """(left_id=keeper, right_id=dropped) edges from the narrow projection.

    Fully vectorized: the keeper per key comes from the associative
    combine tree (stages/agg.py), a size-adaptive join attaches it back,
    and a filter keeps the non-keepers."""
    import pyarrow.compute as pc
    from .agg import grouped_agg
    from .joins import attach_by_key

    narrow = keyed_ds.select_columns(["exact_key", id_col]).materialize()
    keepers = grouped_agg(narrow, ["exact_key"],
                          [(id_col, "min", "keeper")]).materialize()
    joined = attach_by_key(narrow, keepers, ["exact_key"],
                           num_partitions=cfg.shuffle_partitions)

    def edges(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch[id_col], batch["keeper"])
        b = batch.filter(keep)
        return pa.table({"left_id": b["keeper"], "right_id": b[id_col]})

    return joined.map_batches(edges, batch_format="pyarrow")


def exact_dedup(ds, cfg: DedupConfig, id_col: str = "image_id"):
    """Returns (survivors, dup_edges).

    survivors: all columns, one row per exact_key (keeper = min image_id).
    dup_edges: (left_id, right_id) feeding connected components so exact
    dups land in the same final cluster.
    """
    keyed = add_exact_key(ds, cfg)
    edges = exact_dup_edges(keyed, cfg, id_col)
    survivors = filter_by_keys(keyed, edges, id_col, keep=False,
                               keys_col="right_id",
                               num_partitions=cfg.shuffle_partitions)
    return survivors, edges
