"""Windowed gather / segment-sum kernels (kernels/windowed.py).

Index ops with locality run as vector window sweeps instead of XLA's
scalar index floor (measured 4.7x / 6.5x on the 1M-row AMG aggregation
map, RESULTS.md r3); the exception path keeps them EXACT for arbitrary
index maps. Oracles here are plain numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpusparse.kernels.windowed import (
    windowed_gather,
    windowed_gather_plan,
    windowed_segment_plan,
    windowed_segment_sum,
)


def _local_idx(rng, n, t, jitter=40, n_far=0):
    idx = np.minimum((np.arange(n) * t) // n + rng.integers(0, jitter, n),
                     t - 1)
    if n_far:
        idx[rng.integers(0, n, n_far)] = rng.integers(0, t, n_far)
    return idx.astype(np.int64)


class TestWindowedGather:
    def test_matches_numpy_exactly(self, rng):
        n, t = 5000, 900
        idx = _local_idx(rng, n, t, n_far=25)
        plan = windowed_gather_plan(idx, t)
        table = jnp.asarray(rng.normal(size=t).astype(np.float32))
        out = np.asarray(windowed_gather(table, plan))
        assert (out == np.asarray(table)[idx]).all()

    def test_outliers_ride_exceptions_not_window(self, rng):
        n, t = 4096, 4096
        idx = _local_idx(rng, n, t, jitter=8)
        idx[7] = t - 1  # single far read
        plan = windowed_gather_plan(idx, t)
        assert plan.window <= 256  # robust W ignores the outlier
        assert plan.exc_pos.size >= 1
        table = jnp.asarray(rng.normal(size=t).astype(np.float32))
        out = np.asarray(windowed_gather(table, plan))
        assert (out == np.asarray(table)[idx]).all()

    def test_fully_scattered_still_exact(self, rng):
        n, t = 2000, 2000
        idx = rng.integers(0, t, n)
        plan = windowed_gather_plan(idx, t)
        table = jnp.asarray(rng.normal(size=t).astype(np.float32))
        out = np.asarray(windowed_gather(table, plan))
        assert (out == np.asarray(table)[idx]).all()

    def test_grad_is_segment_sum(self, rng):
        n, t = 1000, 300
        idx = _local_idx(rng, n, t)
        plan = windowed_gather_plan(idx, t)
        table = jnp.asarray(rng.normal(size=t).astype(np.float32))
        co = jnp.asarray(rng.normal(size=n).astype(np.float32))
        g = jax.grad(lambda tb: jnp.sum(windowed_gather(tb, plan) * co))(table)
        ref = np.zeros(t, np.float64)
        np.add.at(ref, idx, np.asarray(co, np.float64))
        np.testing.assert_allclose(np.asarray(g), ref, rtol=1e-5, atol=1e-5)

    def test_rejects_bad_table(self, rng):
        plan = windowed_gather_plan(np.zeros(10, np.int64), 64)
        with pytest.raises(ValueError, match="length"):
            windowed_gather(jnp.zeros(63), plan)
        with pytest.raises(ValueError, match="1-D"):
            windowed_gather(jnp.zeros((64, 2)), plan)


class TestWindowedSegmentSum:
    def test_matches_numpy(self, rng):
        n_in, s = 7000, 1100
        seg = np.minimum((np.arange(n_in) * s) // n_in, s - 1)
        seg[rng.integers(0, n_in, 30)] = rng.integers(0, s, 30)
        plan = windowed_segment_plan(seg, s)
        y = jnp.asarray(rng.normal(size=n_in).astype(np.float32))
        got = np.asarray(windowed_segment_sum(y, plan))
        ref = np.zeros(s, np.float32)
        np.add.at(ref, seg, np.asarray(y))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    def test_empty_segments(self, rng):
        n_in, s = 1024, 600
        seg = np.sort(rng.integers(0, s // 2, n_in))  # upper half empty
        plan = windowed_segment_plan(seg, s)
        y = jnp.asarray(rng.normal(size=n_in).astype(np.float32))
        got = np.asarray(windowed_segment_sum(y, plan))
        ref = np.zeros(s, np.float32)
        np.add.at(ref, seg, np.asarray(y))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
        assert (got[s // 2:] == 0).all()

    def test_grad_is_gather(self, rng):
        n_in, s = 800, 200
        seg = np.sort(rng.integers(0, s, n_in))
        plan = windowed_segment_plan(seg, s)
        y = jnp.asarray(rng.normal(size=n_in).astype(np.float32))
        co = jnp.asarray(rng.normal(size=s).astype(np.float32))
        g = jax.grad(
            lambda v: jnp.sum(windowed_segment_sum(v, plan) * co)
        )(y)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(co)[seg], rtol=1e-5, atol=1e-6
        )


def test_amg_factored_p_uses_windowed_plans(rng):
    """AMG setup attaches windowed plans on local aggregation maps, and
    the factored apply stays exact vs the stock XLA ops."""
    import scipy.sparse as ssp

    import tpusparse as ts
    from tpusparse.amg import smoothed_aggregation_setup

    n1 = 96
    T = ssp.diags([-1, 2, -1], [-1, 0, 1], shape=(n1, n1), format="csr")
    I = ssp.eye(n1, format="csr")
    a = (ssp.kron(T, I) + ssp.kron(I, T)).tocsr().astype(np.float32)
    a.sort_indices()
    m = smoothed_aggregation_setup(ts.CSR.from_scipy(a))
    pf = m.levels[0].p_fact
    assert pf is not None and pf.gplan is not None and pf.splan is not None
    e = jnp.asarray(rng.normal(size=pf.shape[1]).astype(np.float32))
    r = jnp.asarray(rng.normal(size=pf.shape[0]).astype(np.float32))
    agg = np.asarray(pf.agg)
    w = np.asarray(pf.w, np.float64)
    # oracle mv: t = w * e[agg]; out = t - omega * dinv_a @ t
    t_ref = w * np.asarray(e, np.float64)[agg]
    got_t = np.asarray((pf.w * pf._expand(e)))
    np.testing.assert_allclose(got_t, t_ref, rtol=1e-5, atol=1e-6)
    # rmv tail: segment_sum(w * y, agg) with y = r - omega*(dinv_a_t@r)
    out_r = np.asarray(pf.rmv(r))
    from tpusparse.amg import _op_mv

    y = np.asarray(r, np.float64) - pf.omega * np.asarray(
        _op_mv(pf.dinv_a_t, r), np.float64
    )
    ref_r = np.zeros(pf.shape[1], np.float64)
    np.add.at(ref_r, agg, w * y)
    np.testing.assert_allclose(out_r, ref_r, rtol=1e-4, atol=1e-5)
