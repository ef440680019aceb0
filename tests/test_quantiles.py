"""Exact distributed quantiles: numpy order-statistic equivalence."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from courlan_ray.stages.quantiles import exact_quantiles


def _type1(v, q):
    v = np.sort(v)
    return float(v[max(int(np.ceil(q * v.size)) - 1, 0)])


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "duplicates"])
def test_matches_numpy_order_statistic(dist):
    rng = np.random.default_rng(13)
    if dist == "uniform":
        v = rng.random(5000) * 1000
    elif dist == "lognormal":
        v = rng.lognormal(0, 2, 5000)
    else:
        v = np.repeat(rng.random(7) * 10, 800)[:5000]   # heavy duplicates
    ds = rd.from_arrow(pa.table({"x": pa.array(v, pa.float64())}))
    qs = [0.0, 0.01, 0.5, 0.9, 1.0]
    out = exact_quantiles(ds, "x", qs, bins=64).to_pandas()
    for q, got in zip(out["q"], out["value"]):
        assert got == _type1(v, q), (dist, q)


def test_constant_and_empty():
    ds = rd.from_arrow(pa.table({"x": pa.array([7.0] * 100)}))
    out = exact_quantiles(ds, "x", [0.5]).to_pandas()
    assert out["value"].tolist() == [7.0]
    ds0 = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    out0 = exact_quantiles(ds0, "x", [0.5]).to_pandas()
    assert out0["value"].isna().all()
