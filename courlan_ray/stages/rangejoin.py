"""Range (interval) join against a small broadcast interval table.

Inner-join semantics: each input row is matched with EVERY interval
containing its value (multi-match duplicates the row, no-match drops it) —
the generalization of the reference's extension/length band checks
(/root/reference/courlan/filters.py extension + length gates are
degenerate single-interval cases).

Shape: the interval table is shipped once via ``ray.put`` and every task
evaluates a vectorized membership mask per interval — O(B x N) boolean
kernels with B = number of intervals (small by contract).  Overlapping
intervals are supported.  This is the broadcast tier; a large-large
interval join would need interval partitioning with boundary replication
(out of scope — no pipeline here joins two large interval sets)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .joins import cached_get


def range_join_broadcast(ds, intervals: pa.Table, value_col: str, *,
                         lo_col: str = "lo", hi_col: str = "hi",
                         closed: str = "left"):
    """Dataset x intervals -> Dataset with the interval payload columns
    appended (row repeated per matching interval; unmatched rows dropped).

    ``closed``: "left" ([lo, hi)), "right" ((lo, hi]), "both" ([lo, hi]),
    "neither" ((lo, hi))."""
    if closed not in ("left", "right", "both", "neither"):
        raise ValueError(f"bad closed={closed!r}")
    payload_cols = [c for c in intervals.schema.names
                    if c not in (lo_col, hi_col)]
    ref = ray.put(intervals.combine_chunks())

    def kernel(b: pa.Table) -> pa.Table:
        iv: pa.Table = cached_get(ref)
        lo = iv[lo_col].to_numpy(zero_copy_only=False)
        hi = iv[hi_col].to_numpy(zero_copy_only=False)
        v = b[value_col].to_numpy(zero_copy_only=False)
        row_idx, band_idx = [], []
        for bi in range(len(lo)):
            ge = v >= lo[bi] if closed in ("left", "both") else v > lo[bi]
            le = v <= hi[bi] if closed in ("right", "both") else v < hi[bi]
            m = np.flatnonzero(ge & le)
            if m.size:
                row_idx.append(m)
                band_idx.append(np.full(m.size, bi, dtype=np.int64))
        if not row_idx:
            cols = {n: pa.array([], t) for n, t in
                    zip(b.schema.names, b.schema.types)}
            for c in payload_cols:
                cols[c] = pa.array([], iv[c].type)
            return pa.table(cols)
        rows = np.concatenate(row_idx)
        bands = np.concatenate(band_idx)
        # stable original-row order keeps output deterministic per block
        order = np.lexsort((bands, rows))
        rows, bands = rows[order], bands[order]
        out = b.take(pa.array(rows, pa.int64()))
        gathered = iv.take(pa.array(bands, pa.int64()))
        for c in payload_cols:
            out = out.append_column(c, gathered[c])
        return out

    return ds.map_batches(kernel, batch_format="pyarrow")
