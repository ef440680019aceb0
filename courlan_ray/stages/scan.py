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

    def _dtypes(b: pa.Table) -> tuple[np.dtype, np.dtype]:
        # exact handling for both int and float columns: int64 stays int64
        # (no truncation), float widens to float64; never float->int cast
        o_f = pa.types.is_floating(b.schema.field(order_col).type)
        v_f = pa.types.is_floating(b.schema.field(val_col).type)
        return (np.dtype(np.float64 if o_f else np.int64),
                np.dtype(np.float64 if v_f else np.int64))

    def partial(b: pa.Table) -> pa.Table:
        odt, vdt = _dtypes(b)
        o = b[order_col].to_numpy(zero_copy_only=False).astype(odt)
        v = b[val_col].to_numpy(zero_copy_only=False).astype(vdt)
        if b.num_rows == 0:
            return pa.table({"mn": pa.array([], pa.from_numpy_dtype(odt)),
                             "mx": pa.array([], pa.from_numpy_dtype(odt)),
                             "s": pa.array([], pa.from_numpy_dtype(vdt))})
        return pa.table({"mn": pa.array([o.min()]),
                         "mx": pa.array([o.max()]),
                         "s": pa.array([v.sum()])})

    parts = narrow.select_columns([order_col, val_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None).to_pandas()
    parts = parts.sort_values("mn").reset_index(drop=True)
    if len(parts) > 1 and (parts["mx"].to_numpy()[:-1]
                           >= parts["mn"].to_numpy()[1:]).any():
        raise ValueError(
            "ordered_prefix_sum: block order ranges overlap — sort the "
            f"input by {order_col!r} first (ds.sort) or read a "
            "key-ordered source")
    sums = parts["s"].to_numpy()
    offsets = np.zeros(len(parts), dtype=sums.dtype)
    np.cumsum(sums[:-1], out=offsets[1:])
    # offset lookup keyed by the EXACT block-min order value (no int cast:
    # float order values whose truncations collide must not alias blocks)
    ref = ray.put((parts["mn"].to_numpy(), offsets))

    def scan(b: pa.Table) -> pa.Table:
        odt, vdt = _dtypes(b)
        if b.num_rows == 0:
            return b.append_column(
                out_col, pa.array([], pa.from_numpy_dtype(vdt)))
        mins, offs = cached_get(ref)
        o = b[order_col].to_numpy(zero_copy_only=False).astype(odt)
        v = b[val_col].to_numpy(zero_copy_only=False).astype(vdt)
        idx = np.argsort(o, kind="stable")
        c = np.cumsum(v[idx])
        if not inclusive:
            c = c - v[idx]
        run = np.empty(b.num_rows, dtype=vdt)
        run[idx] = c + offs[np.searchsorted(mins, o.min())]
        return b.append_column(out_col, pa.array(run))

    return narrow.map_batches(scan, batch_format="pyarrow",
                              batch_size=None)
