"""HyperLogLog distinct sketch: accuracy + merge idempotence."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from courlan_ray.stages.sketch import hll_distinct, _registers, _estimate


def test_hll_accuracy_within_bound():
    rng = np.random.default_rng(2)
    for true_n in (100, 5_000, 60_000):
        vals = rng.choice(10**9, size=true_n, replace=False)
        data = np.repeat(vals, 3)                      # duplicates everywhere
        rng.shuffle(data)
        ds = rd.from_arrow(pa.table({"x": pa.array(data, pa.int64())}))
        est = hll_distinct(ds, "x", p=12)
        rel = abs(est - true_n) / true_n
        assert rel < 0.05, (true_n, est)               # 3x the 1.6% stderr


def test_hll_merge_idempotent_and_order_free():
    rng = np.random.default_rng(3)
    a = rng.choice(10**9, 4000, replace=False)
    b = rng.choice(10**9, 4000, replace=False)
    ra, rb = _registers(a, 12, 17), _registers(b, 12, 17)
    merged1 = np.maximum(ra, rb)
    merged2 = np.maximum(rb, np.maximum(ra, ra))       # re-execution safe
    assert np.array_equal(merged1, merged2)
    est = _estimate(merged1)
    true_n = len(set(a.tolist()) | set(b.tolist()))
    assert abs(est - true_n) / true_n < 0.05
