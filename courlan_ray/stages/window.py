"""Rolling (sliding) time-window aggregate per key.

``SUM/COUNT OVER (PARTITION BY key ORDER BY t RANGE BETWEEN width
PRECEDING AND CURRENT ROW)`` — the streaming-window operator Ray Data
lacks (its groupby windows are tumbling only via key truncation, cf.
pipelines/queries.events_window).

Shape: ONE keyed hash-shuffle ``repartition(P, keys=[by])`` co-locates
each key, then a per-partition vectorized kernel sorts by (key, t) once
and computes every row's window with prefix sums + one ``searchsorted``
per key group (O(n log n) per partition, no per-row Python).  Same
partitioning assumption as stages/asof.py: one key's rows fit a
partition; a hot key would need time-range sub-splitting with
width-sized boundary replication (not implemented).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _round6(x: np.ndarray) -> np.ndarray:
    """Half-up to 6 decimals — mirror of the SQL twin's
    ``floor(x*1e6 + 0.5)/1e6``; removes prefix-sum-vs-window-sum last-bit
    noise (inputs are 2-decimal values, so both sides land on the same
    grid point)."""
    return np.floor(x * 1_000_000 + 0.5) / 1_000_000


def rolling_window_agg(ds, *, on: str, by: str, value_col: str,
                       width_ns: int, keep_cols: list[str] | None = None,
                       num_partitions: int = 64):
    """Per row: count and sum of the same key's rows with
    ``t in [row.t - width, row.t]`` (inclusive both ends, matching SQL
    RANGE BETWEEN ... PRECEDING AND CURRENT ROW).  Emits ``keep_cols`` +
    ``by`` + ``on`` + ``n_window`` + ``sum_window``."""
    from .joins import keyed_shuffle_partitions, safe_combine

    keep = keep_cols or []

    def kernel(b: pa.Table) -> pa.Table:
        b = safe_combine(b)
        n = b.num_rows
        if n == 0:
            return pa.table({
                **{c: b[c] for c in keep + [by, on]},
                "n_window": pa.array([], pa.int64()),
                "sum_window": pa.array([], pa.float64())})
        keys = b[by].to_numpy(zero_copy_only=False)
        t_np = b[on].combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(b[on], pa.ChunkedArray) \
            else b[on].to_numpy(zero_copy_only=False)
        ts = t_np.view("int64") if t_np.dtype.kind == "M" \
            else t_np.astype(np.int64)
        # timestamp columns may be s/ms/us/ns — normalize width at call
        # site; here ts is whatever unit the column carries
        vals = b[value_col].to_numpy(zero_copy_only=False).astype(np.float64)

        order = np.lexsort((ts, keys))
        ks, tss, vs = keys[order], ts[order], vals[order]
        uk, starts = np.unique(ks, return_index=True)
        ends = np.append(starts[1:], n)
        cnt = np.empty(n, dtype=np.int64)
        sm = np.empty(n, dtype=np.float64)
        for gi in range(uk.size):
            s, e = starts[gi], ends[gi]
            tg, vg = tss[s:e], vs[s:e]
            lo = np.searchsorted(tg, tg - width_ns, side="left")
            cum = np.concatenate(([0.0], np.cumsum(vg)))
            idx = np.arange(e - s)
            cnt[s:e] = idx - lo + 1
            sm[s:e] = cum[idx + 1] - cum[lo]

        out = b.take(pa.array(order, pa.int64()))
        cols = {c: out[c] for c in keep + [by, on]}
        cols["n_window"] = pa.array(cnt, pa.int64())
        cols["sum_window"] = pa.array(_round6(sm), pa.float64())
        return pa.table(cols)

    parts = keyed_shuffle_partitions(num_partitions)
    return (ds.repartition(parts, keys=[by])
              .map_batches(kernel, batch_format="pyarrow", batch_size=None))


def sessionize(ds, *, on: str, by: str, gap_ns: int,
               keep_cols: list[str] | None = None,
               num_partitions: int = 64):
    """Gap-based sessionization: per key (ordered by t), a new session
    starts when the gap to the previous row exceeds ``gap_ns``.  Emits
    ``keep_cols`` + ``by`` + ``on`` + ``session_num`` (1-based per key)
    + ``session_id`` (key-qualified string).  Same single-keyed-shuffle
    shape and partitioning assumption as ``rolling_window_agg``."""
    from .joins import keyed_shuffle_partitions, safe_combine

    keep = keep_cols or []

    def kernel(b: pa.Table) -> pa.Table:
        b = safe_combine(b)
        n = b.num_rows
        if n == 0:
            return pa.table({
                **{c: b[c] for c in keep + [by, on]},
                "session_num": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.string())})
        keys = b[by].to_numpy(zero_copy_only=False)
        t_np = b[on].combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(b[on], pa.ChunkedArray) \
            else b[on].to_numpy(zero_copy_only=False)
        ts = t_np.view("int64") if t_np.dtype.kind == "M" \
            else t_np.astype(np.int64)

        order = np.lexsort((ts, keys))
        ks, tss = keys[order], ts[order]
        new = np.ones(n, dtype=np.int64)
        if n > 1:
            same_key = ks[1:] == ks[:-1]
            small_gap = (tss[1:] - tss[:-1]) <= gap_ns
            new[1:] = (~(same_key & small_gap)).astype(np.int64)
        # per-key 1-based session ordinal: global cumsum minus the key's
        # offset (first row of each key restarts the count)
        cum = np.cumsum(new)
        first_of_key = np.ones(n, dtype=bool)
        if n > 1:
            first_of_key[1:] = ks[1:] != ks[:-1]
        key_base = np.maximum.accumulate(np.where(first_of_key, cum - 1, 0))
        sess = cum - key_base

        out = b.take(pa.array(order, pa.int64()))
        cols = {c: out[c] for c in keep + [by, on]}
        cols["session_num"] = pa.array(sess, pa.int64())
        cols["session_id"] = pa.array(
            [f"{k}#{s}" for k, s in zip(ks.tolist(), sess.tolist())],
            pa.string())
        return pa.table(cols)

    parts = keyed_shuffle_partitions(num_partitions)
    return (ds.repartition(parts, keys=[by])
              .map_batches(kernel, batch_format="pyarrow", batch_size=None))
