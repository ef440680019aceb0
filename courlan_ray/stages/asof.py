"""As-of join: attach to each left row the most recent right row (per key)
at-or-before (or strictly before) its timestamp.

Ray Data has no native as-of join; the shape here is the standard
single-shuffle construction:

  1. both sides are projected into one shared envelope schema
     (key, t, side flag, payload columns — the absent side's columns ride
     as nulls) and ``union``ed,
  2. ONE keyed hash-shuffle ``repartition(P, keys=[by])`` co-locates every
     key's rows from both sides,
  3. a per-partition vectorized kernel sorts the right side by (key, t)
     once and, per key group, binary-searches all left timestamps into the
     right side (``np.searchsorted`` — no per-row Python).

Partitioning assumption (documented per the north_rule): a single ``by``
key's rows must fit one partition.  Keys are users/devices/domains in
practice — bounded; a pathological hot key would need time-range
sub-splitting with boundary replication (not implemented).

At 10^12-row scale both inputs stream through the shuffle once; the
envelope is narrow (key, t, payload), the wide payload columns should be
projected to what the caller needs before calling.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ts_i64(col) -> np.ndarray:
    """timestamp/int column -> int64 numpy (ns-or-native units; both sides
    pass through the same cast so units agree)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    np_arr = arr.to_numpy(zero_copy_only=False)
    return np_arr.view("int64") if np_arr.dtype.kind == "M" \
        else np_arr.astype(np.int64)


def asof_join(left_ds, right_ds, *, on: str, by: str,
              left_cols: list[str], right_cols: list[str],
              strict: bool = True, right_suffix: str = "_r",
              tolerance_ns: int | None = None,
              num_partitions: int = 64):
    """Left as-of join.  Returns a Dataset with ``left_cols`` plus each of
    ``right_cols`` as ``<name><right_suffix>`` (null when the key has no
    right row at-or-before / strictly-before ``on``).

    ``on`` is the timestamp column name (same name both sides); ``by`` the
    equality key (same name both sides).  ``strict=True`` matches
    right.t < left.t (DuckDB ``ASOF JOIN ... ON l.t > r.t``);
    ``strict=False`` matches right.t <= left.t.  ``tolerance_ns`` bounds
    the lookback (pandas merge_asof tolerance): a match older than
    left.t - tolerance becomes null — and a bounded lookback is what
    would let a hot key time-chunk like stages/window.rolling_window_agg."""
    from .joins import keyed_shuffle_partitions

    lp = [c for c in left_cols if c not in (on, by)]
    rp = [c for c in right_cols if c not in (on, by)]

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))

    def env_left(b: pa.Table) -> pa.Table:
        cols = {by: b[by], on: b[on],
                "__side": pa.array(np.zeros(b.num_rows, dtype=np.int8))}
        for c in lp:
            cols["l_" + c] = b[c]
        for c in rp:
            cols["r_" + c] = pa.nulls(b.num_rows, r_types[c])
        return pa.table(cols)

    def env_right(b: pa.Table) -> pa.Table:
        cols = {by: b[by], on: b[on],
                "__side": pa.array(np.ones(b.num_rows, dtype=np.int8))}
        for c in lp:
            cols["l_" + c] = pa.nulls(b.num_rows, l_types[c])
        for c in rp:
            cols["r_" + c] = b[c]
        return pa.table(cols)

    env = left_ds.map_batches(env_left, batch_format="pyarrow").union(
        right_ds.map_batches(env_right, batch_format="pyarrow"))

    side_kw = "left" if strict else "right"

    def kernel(b: pa.Table) -> pa.Table:
        from .joins import safe_combine
        b = safe_combine(b)
        side = b["__side"].to_numpy(zero_copy_only=False)
        keys = b[by].to_numpy(zero_copy_only=False)
        ts = _ts_i64(b[on])
        li = np.flatnonzero(side == 0)
        ri = np.flatnonzero(side == 1)

        out_cols: dict[str, pa.Array] = {}
        lt = b.take(pa.array(li, pa.int64()))
        out_cols[by] = lt[by]
        out_cols[on] = lt[on]
        for c in lp:
            out_cols[c] = lt["l_" + c]

        n_l = li.size
        match = np.full(n_l, -1, dtype=np.int64)       # index into ri order
        if ri.size and n_l:
            rk, rt = keys[ri], ts[ri]
            r_order = np.lexsort((rt, rk))
            rk, rt = rk[r_order], rt[r_order]
            # group bounds per right key
            uk, starts = np.unique(rk, return_index=True)
            ends = np.append(starts[1:], rk.size)
            lk, ltm = keys[li], ts[li]
            g = np.searchsorted(uk, lk)
            g_ok = (g < uk.size)
            g_ok[g_ok] &= uk[g[g_ok]] == lk[g_ok]
            # one argsort groups the left rows; a mask scan per key would
            # be O(K*N) per partition
            valid = np.flatnonzero(g_ok)
            order_l = valid[np.argsort(g[valid], kind="stable")]
            gv = g[order_l]
            bs = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]]) \
                if gv.size else np.zeros(0, dtype=np.int64)
            be = np.append(bs[1:], gv.size)
            for k0, k1 in zip(bs, be):
                rows = order_l[k0:k1]
                gi = gv[k0]
                s, t_end = starts[gi], ends[gi]
                pos = np.searchsorted(rt[s:t_end], ltm[rows], side=side_kw)
                hit = pos > 0
                if tolerance_ns is not None:
                    hit &= np.where(
                        pos > 0,
                        ltm[rows] - rt[s:t_end][np.maximum(pos - 1, 0)]
                        <= tolerance_ns,
                        False)
                match[rows[hit]] = r_order[s + pos[hit] - 1]
        got = match >= 0
        take_idx = np.where(got, match, 0)
        gathered = b.take(pa.array(ri[take_idx], pa.int64())) if ri.size \
            else None
        for c in rp:
            name = c + right_suffix
            if gathered is None:
                out_cols[name] = pa.nulls(n_l, r_types[c])
            else:
                col = gathered["r_" + c].combine_chunks()
                if got.all():
                    out_cols[name] = col
                else:
                    # null out non-matches (vectorized if/else on validity)
                    import pyarrow.compute as pc
                    out_cols[name] = pc.if_else(
                        pa.array(got), col, pa.nulls(n_l, r_types[c]))
        return pa.table(out_cols)

    parts = keyed_shuffle_partitions(num_partitions)
    return (env.repartition(parts, keys=[by])
               .map_batches(kernel, batch_format="pyarrow", batch_size=None))
