"""Distributed ordered prefix sum (global scan).

The classic two-phase parallel scan, Dataset-shaped:

  phase 1: one streaming pass emits per-block (min_order, block_sum) —
           tiny partials, one row per block;
  phase 2: the driver sorts the partials by min_order and computes the
           exclusive block offsets (O(blocks), not O(rows));
  phase 3: a second streaming pass adds each block's broadcast offset to
           its local cumulative sum.

Block identity is the block's MINIMUM order value, so the input's blocks
must cover DISJOINT ranges of ``order_col`` with unique values — true for
a range-partitioned input (``ds.sort(order_col)``) and for naturally
monotonic sources (parquet written in key order).  ``ordered_prefix_sum``
verifies disjointness on the driver (overlapping partials raise) rather
than silently mis-summing.

At 10^6 blocks the driver holds 10^6 (min, sum) pairs — MBs.  No shuffle;
two passes over one narrow projection.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def ordered_prefix_sum(ds, order_col: str, val_col: str, *,
                       out_col: str = "running_sum", inclusive: bool = True):
    """Add ``out_col`` = cumulative sum of ``val_col`` in ``order_col``
    order (SQL ``SUM(val) OVER (ORDER BY order ROWS UNBOUNDED
    PRECEDING)``; ``inclusive=False`` gives the exclusive scan).

    Requires block-disjoint ``order_col`` ranges (see module docstring).
    Rows within a block are ordered locally (cheap per-block sort), so the
    input needs no global sort if its blocks are already range-disjoint."""
    import ray

    from .joins import cached_get

    narrow = ds.materialize()

    def partial(b: pa.Table) -> pa.Table:
        o = b[order_col].to_numpy(zero_copy_only=False)
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if b.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        return pa.table({"mn": pa.array([int(o.min())], pa.int64()),
                         "mx": pa.array([int(o.max())], pa.int64()),
                         "s": pa.array([int(v.sum())], pa.int64())})

    parts = narrow.select_columns([order_col, val_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    parts = parts.sort_values("mn").reset_index(drop=True)
    if len(parts) > 1 and (parts["mx"].to_numpy()[:-1]
                           >= parts["mn"].to_numpy()[1:]).any():
        raise ValueError(
            "ordered_prefix_sum: block order ranges overlap — sort the "
            f"input by {order_col!r} first (ds.sort) or read a "
            "key-ordered source")
    offsets = np.zeros(len(parts), dtype=np.int64)
    np.cumsum(parts["s"].to_numpy()[:-1], out=offsets[1:])
    # offset lookup keyed by block min order value
    ref = ray.put((parts["mn"].to_numpy(), offsets))

    def scan(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array([], pa.int64()))
        mins, offs = cached_get(ref)
        o = b[order_col].to_numpy(zero_copy_only=False)
        v = b[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.argsort(o, kind="stable")
        c = np.cumsum(v[idx])
        if not inclusive:
            c = c - v[idx]
        run = np.empty(b.num_rows, dtype=np.int64)
        run[idx] = c + offs[np.searchsorted(mins, int(o.min()))]
        return b.append_column(out_col, pa.array(run))

    return narrow.map_batches(scan, batch_format="pyarrow",
                              batch_size=None)
