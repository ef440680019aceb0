"""Microbench: segmented window/asof kernels vs the round-2 per-key-group
Python loops (VERDICT round 2 next #2 done-criterion: >= 5x on a partition
with 1e5 key groups).

Pure numpy — no Ray; run:  PYTHONPATH=/root/repo python tools/bench_kernels.py
"""

import time

import numpy as np

from courlan_ray.stages.window import _window_bounds
from courlan_ray.stages.asof import _group_searchsorted

N_GROUPS = 100_000
ROWS_PER_GROUP = 10
WIDTH = 500


def _partition(seed=7):
    """(key,t)-sorted partition arrays: 1e5 groups x 10 rows."""
    rng = np.random.default_rng(seed)
    n = N_GROUPS * ROWS_PER_GROUP
    ts = np.sort(rng.integers(0, 100_000, (N_GROUPS, ROWS_PER_GROUP)),
                 axis=1).ravel()
    starts = np.arange(N_GROUPS, dtype=np.int64) * ROWS_PER_GROUP
    ends = starts + ROWS_PER_GROUP
    vals = rng.random(n)
    return ts.astype(np.int64), starts, ends, vals


def window_loop(tss, starts, ends, width):
    """The round-2 loop kernel (stages/window.py:106-115 before this
    round), kept verbatim as the baseline."""
    n = tss.size
    cnt = np.empty(n, dtype=np.int64)
    sm = np.empty(n, dtype=np.float64)
    vs = np.ones(n)
    for gi in range(starts.size):
        s, e = starts[gi], ends[gi]
        tg, vg = tss[s:e], vs[s:e]
        lo = np.searchsorted(tg, tg - width, side="left")
        hi_b = np.searchsorted(tg, tg, side="right")
        cum = np.concatenate(([0.0], np.cumsum(vg)))
        cnt[s:e] = hi_b - lo
        sm[s:e] = cum[hi_b] - cum[lo]
    return cnt, sm


def window_segmented(tss, starts, ends, width):
    n = tss.size
    vs = np.ones(n)
    lo, hi = _window_bounds(tss, starts, ends, width)
    cum = np.zeros(n + 1, dtype=np.longdouble)
    np.cumsum(vs, dtype=np.longdouble, out=cum[1:])
    return hi - lo, (cum[hi] - cum[lo]).astype(np.float64)


def asof_loop(rt, starts, ends, gq, tq, side):
    """The round-2 loop shape (stages/asof.py:127-139 before this round)."""
    pos = np.empty(tq.size, dtype=np.int64)
    order_q = np.argsort(gq, kind="stable")
    gv = gq[order_q]
    bs = np.flatnonzero(np.r_[True, gv[1:] != gv[:-1]])
    be = np.append(bs[1:], gv.size)
    for k0, k1 in zip(bs, be):
        rows = order_q[k0:k1]
        gi = gv[k0]
        s, e = starts[gi], ends[gi]
        pos[rows] = s + np.searchsorted(rt[s:e], tq[rows], side=side)
    return pos


def main():
    tss, starts, ends, _ = _partition()

    reps = 3
    # one warm-up call each: the first touch of the working set pays page
    # faults that belong to neither kernel
    window_loop(tss, starts, ends, WIDTH)
    window_segmented(tss, starts, ends, WIDTH)
    t0 = time.perf_counter()
    for _ in range(reps):
        c1, s1 = window_loop(tss, starts, ends, WIDTH)
    t_loop = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        c2, s2 = window_segmented(tss, starts, ends, WIDTH)
    t_seg = (time.perf_counter() - t0) / reps
    assert np.array_equal(c1, c2) and np.allclose(s1, s2)
    print(f"window  1e5 groups: loop {t_loop:.3f}s  segmented {t_seg:.3f}s  "
          f"speedup {t_loop / t_seg:.1f}x")

    rng = np.random.default_rng(13)
    nq = N_GROUPS * 4
    gq = rng.integers(0, N_GROUPS, nq).astype(np.int64)
    tq = rng.integers(0, 100_000, nq).astype(np.int64)
    asof_loop(tss, starts, ends, gq, tq, "left")
    _group_searchsorted(tss, starts, ends, gq, tq, "left")
    t0 = time.perf_counter()
    for _ in range(reps):
        p1 = asof_loop(tss, starts, ends, gq, tq, "left")
    t_loop = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        p2 = _group_searchsorted(tss, starts, ends, gq, tq, "left")
    t_seg = (time.perf_counter() - t0) / reps
    assert np.array_equal(p1, p2)
    print(f"asof    1e5 groups: loop {t_loop:.3f}s  segmented {t_seg:.3f}s  "
          f"speedup {t_loop / t_seg:.1f}x")


if __name__ == "__main__":
    main()
